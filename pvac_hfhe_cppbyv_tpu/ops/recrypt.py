"""Recryption / EvalKey (reference: include/pvac/ops/recrypt.hpp)."""
from __future__ import annotations

from ..core.random import csprng_u64
from ..crypto import matrix
from ..types import Cipher, EvalKey, PubKey, SecKey
from .encrypt import (
    compact_edges, compact_layers, enc_value, enc_zero_depth, guard_budget,
    sigma_density,
)
from .arithmetic import ct_add


def make_evalkey(pk: PubKey, sk: SecKey, pool_size: int, depth_hint: int) -> EvalKey:
    """Pool of encryptions-of-zero + enc(1) (recrypt.hpp:12-19)."""
    return EvalKey(
        zero_pool=[enc_zero_depth(pk, sk, depth_hint) for _ in range(pool_size)],
        enc_one=enc_value(pk, sk, 1),
    )


# Virtual-σ ciphertexts above this edge count use the sampled density
# estimate; below it, exact streaming is cheap enough.
VSIGMA_SAMPLE_MIN = 1 << 16


def sigma_needs_balance(pk: PubKey, C: Cipher) -> bool:
    """Density outside [0.495, 0.505] (recrypt.hpp:21-24).

    For large recipe-backed σ (types.VirtualSigma) the density is
    estimated from a deterministic 16384-row sample instead of
    generating every row: the estimator's error (<0.0006 at 3σ) is an
    order of magnitude finer than the 0.495/0.505 band edges, and only
    estimates INSIDE the band skip the balance loop — a sampled verdict
    within 0.002 of either edge is re-checked exactly before trusting
    it, so a pathological σ cannot dodge rebalancing by sampling luck."""
    from ..types import VirtualSigma

    if isinstance(C.sigma, VirtualSigma) and C.n_edges > VSIGMA_SAMPLE_MIN:
        d = C.sigma.density_sample()
        if 0.497 <= d <= 0.503:
            return False
        if d < 0.493 or d > 0.507:
            return True
    d = sigma_density(pk, C)
    return d < 0.495 or d > 0.505


def ct_recrypt(pk: PubKey, ek: EvalKey, C: Cipher) -> Cipher:
    """<= 8 rounds of add-zero + ubk permutation + compaction
    (recrypt.hpp:26-41)."""
    if not ek.zero_pool or C.n_edges == 0:
        return C
    result = C.copy()
    it = 0
    while it < 8 and sigma_needs_balance(pk, result):
        idx = csprng_u64() % len(ek.zero_pool)
        result = ct_add(pk, result, ek.zero_pool[idx])
        matrix.ubk_apply(pk, result)
        guard_budget(pk, result, "recrypt")
        it += 1
    compact_edges(pk, result)
    compact_layers(result)
    return result
