"""Pallas TPU kernel: fused bitsliced AES-256-CTR keystream.

STATUS: REFERENCE-ONLY — retired from the default path in round 4.

Measured reason it cannot win (VERDICT r3 #7, benchmarks/roofline.py):
the XLA bitsliced path (crypto/aesv.py) runs at 287M AES blocks/s on the
v5e — with ~6k gate-ops per bitsliced block that is ~1.7e12 u32 lane-ops/s,
i.e. ~45% of the VPU ceiling, and XLA already fuses the downstream LPN
contraction into it (the full prf pipeline costs only ~2 ms more than the
bare keystream).  This kernel's one-grid-program-per-lane design (tiny
[16, G=129] unaligned tiles, 1024 sequential programs) cannot approach
that, and current Mosaic rejects its unaligned vector shapes outright
("vector types must have positive constant sizes but got 0, 129" in
_shift_rows).  The measured autotune (roofline.py -> PVAC_AUTOTUNE_FILE)
therefore selects the XLA path; nothing in the default engine invokes
this module.  Kept as the documented bitsliced-circuit reference and for
tests/test_aes_pallas.py (interpret mode — the circuit itself is correct).

The jnp path materializes the bitsliced state to HBM between ops; this
kernel keeps a lane's whole state in VMEM across all 14 rounds and writes
only the final keystream words — HBM traffic drops from ~30x the state size
to (round keys + output) only.

Layout inside the kernel (per grid program = one lane):
- state: 8 bit-planes, each [16, G] uint32 (byte position x block group);
  ShiftRows / MixColumns use reshape-to-[4,4,G] + jnp.roll so no gather ops
  are needed (Mosaic-friendly);
- round keys: [15, 16, 8] uint32 masks (0 / ~0) for this lane, broadcast
  over G;
- counters are generated in-kernel from the lane nonce.

Outputs are bit-identical to crypto/aesv.py (same circuit, verified in
tests/test_aes_pallas.py).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import aesv

U32 = np.uint32


def _apply_linear(planes, masks):
    out = []
    for j in range(8):
        acc = None
        for i in range(8):
            if (masks[j] >> i) & 1:
                acc = planes[i] if acc is None else acc ^ planes[i]
        out.append(acc)
    return out


def _sq(p):
    return _apply_linear(p, aesv._SQ_MASKS)


def _xt(p):
    return _apply_linear(p, aesv._XT_MASKS)


def _gf_mul(a, b):
    acc = [None] * 8
    t = a
    for i in range(8):
        for j in range(8):
            v = t[j] & b[i]
            acc[j] = v if acc[j] is None else acc[j] ^ v
        if i < 7:
            t = _xt(t)
    return acc


def _sbox(x):
    x2 = _sq(x)
    x3 = _gf_mul(x2, x)
    x6 = _sq(x3)
    x7 = _gf_mul(x6, x)
    x12 = _sq(x6)
    x15 = _gf_mul(x12, x3)
    x120 = _sq(_sq(_sq(x15)))
    x127 = _gf_mul(x120, x7)
    x254 = _sq(x127)
    out = _apply_linear(x254, aesv._AFF_MASKS)
    return [~o if (aesv._AFF_CONST >> j) & 1 else o for j, o in enumerate(out)]


def _shift_rows(planes, G):
    # byte index p = r + 4c -> [c, r] grid; new (r, c) <- old (r, (c+r)%4)
    out = []
    for pla in planes:
        x = pla.reshape(4, 4, G)          # [c, r, G]
        x = jnp.swapaxes(x, 0, 1)         # [r, c, G]
        rows = [jnp.roll(x[r], -r, axis=0) for r in range(4)]
        x = jnp.stack(rows)               # [r, c, G]
        out.append(jnp.swapaxes(x, 0, 1).reshape(16, G))
    return out


def _mix_columns(planes, G):
    def rot_r(pla, k):
        # a[(r+k)%4 + 4c]: shift the row index within each column
        x = pla.reshape(4, 4, G)          # [c, r, G]
        x = jnp.roll(x, -k, axis=1)
        return x.reshape(16, G)

    a1 = [rot_r(p, 1) for p in planes]
    a2 = [rot_r(p, 2) for p in planes]
    a3 = [rot_r(p, 3) for p in planes]
    xt_in = [planes[b] ^ a1[b] for b in range(8)]
    xt_out = _xt(xt_in)
    return [xt_out[b] ^ a1[b] ^ a2[b] ^ a3[b] for b in range(8)]


def _kernel(nonce_ref, rk_ref, out_ref, *, nblocks: int, G: int):
    n = pl.program_id(0)
    nonce_lo = nonce_ref[n, 0]
    nonce_hi = nonce_ref[n, 1]

    # counter planes: block c = 32g + j; value = nonce + c (64-bit)
    g_ids = lax.broadcasted_iota(U32, (G, 32), 0)
    j_ids = lax.broadcasted_iota(U32, (G, 32), 1)
    c = g_ids * U32(32) + j_ids
    lo = nonce_lo + c
    carry = (lo < nonce_lo).astype(U32)
    hi = nonce_hi + carry
    sh = lax.broadcasted_iota(U32, (G, 32), 1)

    planes = []
    for b in range(8):
        pos_rows = []
        for p in range(16):
            if p < 4:
                bits = (lo >> U32(8 * p + b)) & U32(1)
            elif p < 8:
                bits = (hi >> U32(8 * (p - 4) + b)) & U32(1)
            else:
                bits = None
            if bits is None:
                pos_rows.append(jnp.zeros((G,), dtype=jnp.uint32))
            else:
                # Mosaic has no unsigned reductions; the 32 addends set
                # disjoint bits, so a wrapping int32 sum is the exact OR.
                s = jnp.sum((bits << sh).astype(jnp.int32), axis=1)
                pos_rows.append(s.astype(jnp.uint32))
        planes.append(jnp.stack(pos_rows))  # [16, G]

    rk = rk_ref[0]  # [15, 16, 8]

    def ark(pl_, r):
        return [pl_[b] ^ rk[r, :, b][:, None] for b in range(8)]

    def round_fn(r, pl_):
        pl_ = _sbox(pl_)
        pl_ = _shift_rows(pl_, G)
        pl_ = _mix_columns(pl_, G)
        return ark(pl_, r)

    st = ark(planes, 0)
    st = lax.fori_loop(1, 14, round_fn, st)
    st = _sbox(st)
    st = _shift_rows(st, G)
    st = ark(st, 14)

    # un-bitslice: 4 output u32 words per block
    for w in range(4):
        rows = []
        for i in range(32):
            p, b = 4 * w + i // 8, i % 8
            rows.append(st[b][p])  # [G]
        cols = aesv.bit_transpose_32(rows)
        stacked = jnp.stack(cols, axis=-1).reshape(-1)  # [G*32]
        out_ref[0, :, w] = stacked[:nblocks]


def aes_ctr_keystream_pallas(rk_masks, nonce_lo, nonce_hi, nblocks: int,
                             interpret: bool = False):
    """rk_masks [N, 15, 16, 8] uint32 (0/~0 per lane), nonces [N] uint32
    halves -> keystream words [N, nblocks, 4] uint32 (little-endian block
    words), bit-identical to aesv.planes_to_words(encrypt_planes(...))."""
    N = rk_masks.shape[0]
    G = (nblocks + 31) // 32
    nonces = jnp.stack([nonce_lo, nonce_hi], axis=-1)  # [N, 2]
    kern = functools.partial(_kernel, nblocks=nblocks, G=G)
    return pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole nonce table
            pl.BlockSpec((1, 15, 16, 8), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nblocks, 4), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, nblocks, 4), jnp.uint32),
        interpret=interpret,
    )(nonces, rk_masks)
