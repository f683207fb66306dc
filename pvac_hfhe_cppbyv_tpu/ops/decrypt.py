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


def _limbs_to_int(a) -> int:
    return (int(a[0]) + (int(a[1]) << 32) + (int(a[2]) << 64)
            + (int(a[3]) << 96)) % F.P


def dec_value(pk: PubKey, sk: SecKey, C: Cipher) -> int:
    """dec_value (decrypt.hpp:62-89) -> field element as Python int."""
    return dec_value_batch(pk, sk, [C])[0]


def dec_value_batch(pk: PubKey, sk: SecKey, cts: list[Cipher]) -> list[int]:
    """Batched decryption: all ciphertexts' BASE-layer PRFs run in one
    batch, inverses in one limb kernel, edge sums as numpy segment math.

    BASE seeds are deduplicated before the PRF batch: products of a
    ciphertext with itself (depth chains) carry many copies of the same
    BASE layer, and prf_R is a pure function of the seed."""
    # gather all BASE seeds
    reqs = []
    spans = []
    for C in cts:
        ids = [lid for lid in range(C.n_layers)
               if C.layers[lid].rule == RRULE_BASE]
        spans.append(ids)
        for lid in ids:
            s = C.layers[lid].seed
            reqs.append([s.ztag, s.nonce.lo, s.nonce.hi])
    base_vals: list[int] = []
    if reqs:
        uniq, inv = np.unique(
            np.asarray(reqs, dtype=np.uint64), axis=0, return_inverse=True
        )
        inv = inv.reshape(-1)
        uniq_vals = FV.to_ints(lpn.prf_R_batch(pk, sk, uniq))
        base_vals = [uniq_vals[i] for i in inv]

    out = []
    off = 0
    all_Rs = []
    for C, ids in zip(cts, spans):
        L = C.n_layers
        Rs: list = [None] * L
        for lid in ids:
            Rs[lid] = base_vals[off]
            off += 1
        visiting = [False] * L

        def resolve(lid: int, C=C, Rs=Rs, visiting=visiting) -> int:
            if lid >= C.n_layers:
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
        all_Rs.append(Rs)

    # one batched inversion across all layers of all cts
    flat = [r for Rs in all_Rs for r in Rs]
    Rinv_flat = (FV.inv(FV.from_ints(flat)) if flat
                 else np.zeros((0, 4), dtype=U32))
    powg = pk.powg_limbs()  # [B, 4]
    n_ct = len(cts)
    # Signed edge sums batched ACROSS ciphertexts: one flattened edge
    # stream with per-ct segment ids, so a batch of fresh cts (~36 edges
    # each) costs a handful of numpy passes instead of a python loop with
    # per-ct kernel dispatches (the loop dominated batched decryption).
    # Chunked so deep-product cts (tens of millions of edges) keep a
    # bounded working set; per-ct limb sums accumulate in uint64
    # (< 2^31 addends of u32 limbs per ct by the edge budget).
    lstarts = np.zeros(n_ct + 1, dtype=np.int64)
    np.cumsum([len(Rs) for Rs in all_Rs], out=lstarts[1:])
    accP = np.zeros((n_ct, 4), dtype=np.uint64)
    accM = np.zeros((n_ct, 4), dtype=np.uint64)
    CH = 1 << 22

    def _accumulate_group(ids: list[int]) -> None:
        w = np.concatenate([cts[i].w for i in ids])
        idx = np.concatenate([cts[i].idx for i in ids])
        glid = np.concatenate(
            [lstarts[i] + cts[i].layer_id.astype(np.int64) for i in ids])
        ch = np.concatenate([cts[i].ch for i in ids])
        seg = np.repeat(np.asarray(ids, dtype=np.int64),
                        [cts[i].n_edges for i in ids])
        terms = FV.mul(FV.mul(w, powg[idx]), Rinv_flat[glid]).astype(
            np.uint64)
        pos = ch == SGN_P
        np.add.at(accP, seg[pos], terms[pos])
        np.add.at(accM, seg[~pos], terms[~pos])

    group: list[int] = []
    g_edges = 0
    for i, C in enumerate(cts):
        if C.n_edges == 0:
            continue
        if C.n_edges > CH:
            # huge deep-product ct: process alone in bounded slices
            for off in range(0, C.n_edges, CH):
                sl = slice(off, off + CH)
                terms = FV.mul(FV.mul(C.w[sl], powg[C.idx[sl]]),
                               Rinv_flat[lstarts[i] + C.layer_id[sl]])
                pos = C.ch[sl] == SGN_P
                accP[i] += terms[pos].astype(np.uint64).sum(
                    axis=0, dtype=np.uint64)
                accM[i] += terms[~pos].astype(np.uint64).sum(
                    axis=0, dtype=np.uint64)
            continue
        if g_edges + C.n_edges > CH:
            _accumulate_group(group)
            group, g_edges = [], 0
        group.append(i)
        g_edges += C.n_edges
    if group:
        _accumulate_group(group)
    for i in range(n_ct):
        out.append(F.fp_sub(_limbs_to_int(accP[i]), _limbs_to_int(accM[i])))
    return out
