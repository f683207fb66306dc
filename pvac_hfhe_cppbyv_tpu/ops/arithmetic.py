"""Homomorphic arithmetic (reference: include/pvac/ops/arithmetic.hpp).

ct_add/sub/neg/scale are metadata + limb-vector operations; ct_mul's edge
cross product and (layer-pair, idx mod B) bucket aggregation — the hot O(n^2)
loop (arithmetic.hpp:79-87) — runs as batched limb multiplies with limb-wise
uint64 segment sums, then one batched σ regeneration for the emitted edges.
"""
from __future__ import annotations

import numpy as np

from ..core import field as F
from ..core import fieldv as FV
from ..core.random import csprng_u64, csprng_u64_array
from ..crypto import matrix
from ..types import (
    Cipher, Layer, LazySigma, Nonce128, PubKey, RSeed,
    RRULE_PROD, SGN_P, SGN_M, make_nonce128,
)
from .encrypt import combine_ciphers, compact_layers, guard_budget

U32 = np.uint32


def ct_add(pk: PubKey, A: Cipher, B: Cipher) -> Cipher:
    """Concatenation add (arithmetic.hpp:12-31) — same as combine_ciphers."""
    return combine_ciphers(pk, A, B)


def ct_scale(pk: PubKey, A: Cipher, s: int) -> Cipher:
    """Multiply every edge weight by a scalar (arithmetic.hpp:33-37)."""
    C = A.copy()
    sv = np.broadcast_to(FV.from_ints([s])[0], C.w.shape)
    C.w = FV.mul(C.w, sv)
    return C


def ct_neg(pk: PubKey, A: Cipher) -> Cipher:
    return ct_scale(pk, A, F.P - 1)


def ct_sub(pk: PubKey, A: Cipher, B: Cipher) -> Cipher:
    return ct_add(pk, A, ct_neg(pk, B))


def ct_div_const(pk: PubKey, A: Cipher, k: int) -> Cipher:
    return ct_scale(pk, A, F.fp_inv(k))


def ct_mul_batch(pk: PubKey, pairs: list[tuple[Cipher, Cipher]]) -> list[Cipher]:
    """Batched ct_mul, software-pipelined: host staging (cross product +
    bucket sums) of product i+1 overlaps the device σ generation of the
    edges staged so far.  σ work is dispatched in exact SIGMA_CHUNK-lane
    slices (no per-product padding); the remainder pads once at the end."""
    CH = 8192
    staged = []
    pend = []          # per-product (zt, nlo, nhi, idx, ch, salt) blocks
    pend_n = 0
    finals = []        # (finalize, n_lanes) in dispatch order

    def _dispatch(nlanes: int) -> None:
        """Concatenate pending blocks and dispatch the first nlanes of them;
        keep any remainder pending."""
        nonlocal pend, pend_n
        cat = [np.concatenate([b[j] for b in pend]) for j in range(6)]
        rem = [c[nlanes:] for c in cat]
        cat = [c[:nlanes] for c in cat]
        fin = matrix.sigma_words_start(
            pk, cat[0], cat[1], cat[2], cat[3], cat[4], cat[5]
        )
        finals.append((fin, nlanes))
        pend = [tuple(rem)] if rem[0].size else []
        pend_n = int(rem[0].shape[0])

    for A, B in pairs:
        s = _ct_mul_stage(pk, A, B)
        staged.append(s)
        n = len(s["out_lid"])
        if n:
            pend.append((
                s["zt"], s["nlo"], s["nhi"],
                s["out_idx"].astype(np.uint64),
                s["out_ch"].astype(np.uint64),
                csprng_u64_array(n),
            ))
            pend_n += n
            if pend_n >= CH:
                _dispatch((pend_n // CH) * CH)
    if pend_n:
        _dispatch(pend_n)

    counts = [len(s["out_lid"]) for s in staged]
    if sum(counts):
        parts = matrix.sigma_finalize_many([fin for fin, _ in finals])
        if any(not isinstance(p, np.ndarray) for p in parts):
            import jax.numpy as jnp

            sig_all = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        else:
            sig_all = parts[0] if len(parts) == 1 else np.concatenate(parts)
    out = []
    off = 0
    for s, n in zip(staged, counts):
        mw = pk.prm.sigma_words32
        if n == 0:
            sig = np.zeros((0, mw), dtype=U32)
        elif isinstance(sig_all, np.ndarray):
            sig = sig_all[off : off + n]
        else:
            # lazy view: no eager device slice (compile churn + round trips
            # on a high-latency link); σ materializes only if read on host
            sig = LazySigma(sig_all, np.arange(off, off + n))
        off += n
        C = Cipher(
            s["layers"],
            s["out_lid"],
            s["out_idx"],
            s["out_ch"],
            s["out_w"],
            sig,
        )
        guard_budget(pk, C, "mul")
        compact_layers(C)
        out.append(C)
    return out


def _ct_mul_stage(pk: PubKey, A: Cipher, B: Cipher) -> dict:
    """Everything in ct_mul except σ generation; returns the staged edge
    set + σ request fields."""
    LA, LB = A.n_layers, B.n_layers
    layers = [Layer(L.rule, L.seed, L.pa, L.pb) for L in A.layers]
    off = LA
    for L in B.layers:
        if L.rule == RRULE_PROD:
            layers.append(Layer(L.rule, L.seed, L.pa + off, L.pb + off))
        else:
            layers.append(Layer(L.rule, L.seed, L.pa, L.pb))
    base = len(layers)
    prod_seeds = []
    for la in range(LA):
        for lb in range(LB):
            nonce = make_nonce128()
            seed = RSeed(matrix.prg_layer_ztag(pk.canon_tag, nonce), nonce)
            layers.append(Layer(RRULE_PROD, seed, la, off + lb))
            prod_seeds.append(seed)

    nA, nB = A.n_edges, B.n_edges
    Bmod = pk.prm.B

    # Cross product in chunks of A-edges: bounds peak memory at
    # ~chunk*nB pair rows regardless of ciphertext size.
    chunk = max(1, (4 << 20) // max(1, nB))
    part_keys, part_accs = [], []
    for a0 in range(0, nA, chunk):
        a1 = min(nA, a0 + chunk)
        na = a1 - a0
        ia = np.repeat(np.arange(a0, a1), nB)
        ib = np.tile(np.arange(nB), na)
        pair_lid = (A.layer_id[ia].astype(np.int64) * LB
                    + B.layer_id[ib].astype(np.int64))
        idx_sum = (A.idx[ia].astype(np.int64) + B.idx[ib].astype(np.int64)) % Bmod
        diff_sign = (A.ch[ia] != B.ch[ib])
        key = (pair_lid * Bmod + idx_sum) * 2 + diff_sign.astype(np.int64)
        ww = FV.mul(A.w[ia], B.w[ib]).astype(np.uint64)  # [pairs, 4]
        del ia, ib, pair_lid, idx_sum, diff_sign
        uniq, inv = np.unique(key, return_inverse=True)
        acc = np.zeros((len(uniq), 4), dtype=np.uint64)
        np.add.at(acc, inv, ww)
        # per-bucket addends < 2^32 and limbs < 2^32 -> u64 never overflows
        part_keys.append(uniq)
        part_accs.append(acc)
    all_keys = np.concatenate(part_keys) if part_keys else np.zeros(0, np.int64)
    all_accs = (np.concatenate(part_accs)
                if part_accs else np.zeros((0, 4), np.uint64))
    uniq, inv = np.unique(all_keys, return_inverse=True)
    acc = np.zeros((len(uniq), 4), dtype=np.uint64)
    np.add.at(acc, inv, all_accs)

    from .. import native

    red = native.reduce_u64_limbs(acc)
    if red is None:
        red = FV.from_ints([
            (int(acc[b, 0]) + (int(acc[b, 1]) << 32)
             + (int(acc[b, 2]) << 64) + (int(acc[b, 3]) << 96)) % F.P
            for b in range(len(uniq))
        ]) if len(uniq) else np.zeros((0, 4), dtype=U32)
    nz = red.any(axis=1)
    ks = uniq[nz]
    out_lid = (base + (ks // 2) // Bmod).astype(np.int32)
    out_idx = ((ks // 2) % Bmod).astype(np.int32)
    out_ch = np.where((ks & 1) == 0, SGN_P, SGN_M).astype(np.int8)
    out_w = red[nz]

    lz = np.array([L.seed.ztag for L in layers], dtype=np.uint64)
    ll = np.array([L.seed.nonce.lo for L in layers], dtype=np.uint64)
    lh = np.array([L.seed.nonce.hi for L in layers], dtype=np.uint64)
    return {
        "layers": layers,
        "out_lid": out_lid,
        "out_idx": out_idx,
        "out_ch": out_ch,
        "out_w": out_w,
        "zt": lz[out_lid],
        "nlo": ll[out_lid],
        "nhi": lh[out_lid],
    }


def ct_mul(pk: PubKey, A: Cipher, B: Cipher) -> Cipher:
    """Edge cross product with PROD layer grid (arithmetic.hpp:47-106)."""
    return ct_mul_batch(pk, [(A, B)])[0]
