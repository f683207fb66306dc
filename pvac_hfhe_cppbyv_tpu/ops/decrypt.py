"""Decryption (reference: include/pvac/ops/decrypt.hpp).

Layer blinding factors resolve over the PROD DAG (BASE layers via one batched
prf_R call); inverses and per-edge terms are batched limb kernels; the signed
edge sum accumulates limb-wise in uint64 then reduces mod p once.
"""
from __future__ import annotations

import numpy as np

from ..core import field as F
from ..core import fieldv as FV
from ..crypto import lpn
from ..types import Cipher, PubKey, SecKey, RRULE_BASE, SGN_P

U32 = np.uint32


def layer_R(pk: PubKey, sk: SecKey, C: Cipher) -> list[int]:
    """All layer R values: batched BASE PRFs + DAG products
    (decrypt.hpp:12-60).  Raises on parent cycles/out-of-range like the
    reference's abort."""
    L = C.n_layers
    base_ids = [lid for lid in range(L) if C.layers[lid].rule == RRULE_BASE]
    Rs: list = [None] * L
    if base_ids:
        seeds = np.array(
            [
                [C.layers[i].seed.ztag, C.layers[i].seed.nonce.lo,
                 C.layers[i].seed.nonce.hi]
                for i in base_ids
            ],
            dtype=np.uint64,
        )
        vals = FV.to_ints(lpn.prf_R_batch(pk, sk, seeds))
        for i, v in zip(base_ids, vals):
            Rs[i] = v

    visiting = [False] * L

    def resolve(lid: int) -> int:
        if lid >= L:
            raise ValueError("[R] layer id out of range")
        if Rs[lid] is not None:
            return Rs[lid]
        if visiting[lid]:
            raise ValueError("[R] cycle")
        visiting[lid] = True
        Lr = C.layers[lid]
        R = F.fp_mul(resolve(Lr.pa), resolve(Lr.pb))
        visiting[lid] = False
        Rs[lid] = R
        return R

    for lid in range(L):
        resolve(lid)
    return Rs


def dec_value(pk: PubKey, sk: SecKey, C: Cipher) -> int:
    """dec_value (decrypt.hpp:62-89) -> field element as Python int."""
    if C.n_edges == 0:
        return 0
    Rs = layer_R(pk, sk, C)
    Rinv = FV.inv(FV.from_ints(Rs))  # [L, 4]

    powg = pk.powg_limbs()  # [B, 4]
    terms = FV.mul(C.w, powg[C.idx])
    terms = FV.mul(terms, Rinv[C.layer_id])

    # signed sum: limb-wise uint64 accumulation (E < 2^19 addends per limb
    # fits easily), final reduction in Python
    pos = C.ch == SGN_P
    accP = terms[pos].astype(np.uint64).sum(axis=0)
    accM = terms[~pos].astype(np.uint64).sum(axis=0)

    def limbs_to_int(a) -> int:
        return (int(a[0]) + (int(a[1]) << 32) + (int(a[2]) << 64)
                + (int(a[3]) << 96)) % F.P

    return F.fp_sub(limbs_to_int(accP), limbs_to_int(accM))
