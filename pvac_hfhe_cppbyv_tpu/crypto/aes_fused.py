"""Pallas TPU kernel: fused bitsliced AES-256-CTR keystream, tile design.

The XLA bitsliced keystream (crypto/aesv.py) is HBM-fusion-bound: the
round loop carries 128 bit-plane arrays (8 bits x 16 byte positions, each
[G, N] u32 = ~67 MB at the PRF shape), and every `lax.fori_loop` round
boundary materializes the full state to HBM — ~1.8 GB of round-trip
traffic for 14 rounds, measured at ~5% of the VPU op ceiling
(docs/ROOFLINE.md).  The round-4 Pallas attempt (crypto/aes_pallas.py,
retired) ran one grid program per LANE over unaligned [16, G] tiles and
lost by design.

This kernel tiles the OTHER way: grid = (N/128 lanes, G/8 counter
groups); each program holds the state for its tile as 128 separate
values of shape [8, 128] — exactly one u32 vreg tile each — so
ShiftRows / MixColumns are free Python list re-indexing, the tower-field
S-box (reused verbatim from aesv: same derived constants, same circuit)
is pure vector boolean ops, and the state never leaves VMEM between
rounds.  HBM traffic per call drops to: counter planes in (~34 MB),
round-key mask slices in, keystream out (~67 MB).

Semantics are bit-identical to aesv.counters_to_planes_gn +
encrypt_planes_gn + planes_to_words_gn (verified in
tests/test_aes_fused.py and on-device against the XLA path).

Reference for the AES-CTR stream contract: include/pvac/crypto/lpn.hpp:
41-149 (counter block k = le64(nonce+k) || 0^8, keystream read as
little-endian u64s).
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

# tile sizes: one vreg of u32 is (8, 128); N_B lanes on the minor (lane)
# axis, G_B counter groups on the sublane axis.
N_B = 128
G_B = 8


def _rk_mask(rk_r, p, b):
    """Round-key mask value [N_B] -> broadcast [G_B, N_B]."""
    return jnp.broadcast_to(rk_r[p, b][None, :], (G_B, N_B))


def _ark(state, rk_r):
    return [[state[b][p] ^ _rk_mask(rk_r, p, b) for p in range(16)]
            for b in range(8)]


def _sbox_all(state):
    """Apply the bitsliced tower-field S-box per byte position."""
    out = [[None] * 16 for _ in range(8)]
    for p in range(16):
        col = aesv.sbox_planes([state[b][p] for b in range(8)])
        for b in range(8):
            out[b][p] = col[b]
    return out


def _xt_pos(col):
    """xtime on one byte position's 8 bit planes."""
    return aesv._apply_linear(col, aesv._XT_MASKS)


def _round(state, rk_r):
    """One AES middle round on the tiled state (SubBytes, ShiftRows,
    MixColumns, AddRoundKey) — permutations are free list re-indexing."""
    state = _sbox_all(state)
    sr = aesv._SHIFTROWS_PERM
    state = [[state[b][sr[p]] for p in range(16)] for b in range(8)]
    p1, p2, p3 = aesv._MIX_P1, aesv._MIX_P2, aesv._MIX_P3
    out = [[None] * 16 for _ in range(8)]
    for p in range(16):
        cur = [state[b][p] for b in range(8)]
        a1 = [state[b][p1[p]] for b in range(8)]
        a2 = [state[b][p2[p]] for b in range(8)]
        a3 = [state[b][p3[p]] for b in range(8)]
        xt = _xt_pos([cur[b] ^ a1[b] for b in range(8)])
        for b in range(8):
            out[b][p] = xt[b] ^ a1[b] ^ a2[b] ^ a3[b] ^ _rk_mask(rk_r, p, b)
    return out


def _kernel(cnt_ref, rk_ref, out_ref):
    """cnt_ref: [64, G_B, N_B] u32 counter bit planes (pos 0..7 x bit 0..7,
    row = 8*p + b); rk_ref: [15, 16, 8, N_B] u32 masks; out_ref:
    [4, G_B * 32, N_B] u32 keystream words (word w of block 32*g + i at
    [w, 32*g_loc + i, lane])."""
    zero = jnp.zeros((G_B, N_B), dtype=jnp.uint32)
    state = [
        [cnt_ref[8 * p + b] if p < 8 else zero for p in range(16)]
        for b in range(8)
    ]
    state = _ark(state, rk_ref[0])

    def body(r, st):
        # dynamic round index: read this round's mask slab once
        rk_r = rk_ref[pl.ds(r, 1)][0]
        st = [[st[b * 16 + p] for p in range(16)] for b in range(8)]
        st = _round(st, rk_r)
        return tuple(st[b][p] for b in range(8) for p in range(16))

    flat = tuple(state[b][p] for b in range(8) for p in range(16))
    flat = lax.fori_loop(1, 14, body, flat)
    state = [[flat[b * 16 + p] for p in range(16)] for b in range(8)]

    state = _sbox_all(state)
    sr = aesv._SHIFTROWS_PERM
    state = [[state[b][sr[p]] for p in range(16)] for b in range(8)]
    state = _ark(state, rk_ref[14])

    # bit-transpose to keystream words: word w (of 4 per block) collects
    # bits of byte positions 4w..4w+3; bit i of the u32 = plane bit, block
    # index within the group = output row.  bit_transpose_32 is functional
    # (works on any xp arrays) — rows/cols are [G_B, N_B] values.
    for w in range(4):
        rows = [state[i % 8][4 * w + i // 8] for i in range(32)]
        cols = aesv.bit_transpose_32(rows)
        # cols[i] holds word w of block (32*g + i) for g in 0..G_B-1
        out_ref[w] = jnp.stack(cols, axis=1).reshape(G_B * 32, N_B)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _run(cnt, rk_masks, G_pad: int, interpret: bool = False):
    """cnt: [64, G_pad, N] u32; rk_masks: [15, 16, 8, N] u32 ->
    words_t [4, G_pad * 32, N] u32."""
    N = cnt.shape[2]
    grid = (N // N_B, G_pad // G_B)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((4, G_pad * 32, N), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (64, G_B, N_B), lambda n, g: (0, g, n),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (15, 16, 8, N_B), lambda n, g: (0, 0, 0, n),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (4, G_B * 32, N_B), lambda n, g: (0, g, n),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(cnt, rk_masks)


def counter_bit_planes_gn(nlo, nhi, G_pad: int):
    """Counter bit planes [64, G_pad, N] u32 for the kernel: row 8*p + b =
    bit b of byte p of the 128-bit counter block (nonzero only for the 8
    nonce bytes), lane-packed 32 blocks/u32 exactly as
    aesv.counters_to_planes_gn rows 0..7."""
    xp = jnp
    N = nlo.shape[0]
    c = xp.arange(G_pad * 32, dtype=U32)
    lo = nlo[None, :] + c[:, None]            # [B', N] wrapping
    carry = (lo < nlo[None, :]).astype(U32)
    hi = nhi[None, :] + carry
    lo = lo.reshape(G_pad, 32, N)
    hi = hi.reshape(G_pad, 32, N)
    sh = xp.arange(32, dtype=U32)[None, :, None]
    rows = []
    for p in range(8):
        src, shift = (lo, 8 * p) if p < 4 else (hi, 8 * (p - 4))
        for b in range(8):
            bits = (src >> U32(shift + b)) & U32(1)
            rows.append((bits << sh).sum(axis=1).astype(U32))
    return xp.stack(rows)  # [64, G_pad, N]


def aes_ctr_keystream_fused_t(rk_masks, nlo, nhi, n_blocks: int):
    """Kernel-native output: words_t [4, B_pad, N] u32 with
    B_pad = 32 * ceil(ceil(n_blocks/32) / G_B) * G_B >= n_blocks; word w
    of block b at [w, b, lane].  Blocks beyond n_blocks are real keystream
    of higher counters — callers index only what they need
    (lpn.cores_from_streams_t), skipping the [N, B, 4] transpose."""
    N = nlo.shape[0]
    assert N % N_B == 0, N
    G = (n_blocks + 31) // 32
    G_pad = ((G + G_B - 1) // G_B) * G_B
    cnt = counter_bit_planes_gn(nlo, nhi, G_pad)
    return _run(cnt, rk_masks, G_pad, False)


def aes_ctr_keystream_fused(rk_masks, nlo, nhi, n_blocks: int,
                            interpret: bool = False):
    """Fused-kernel replacement for the XLA keystream pipeline.

    rk_masks: [15, 16, 8, N] u32 (aesv.rk_masks_from_packed output);
    nlo/nhi: [N] u32 nonce halves.  Returns words [N, n_blocks, 4] u32 —
    bit-identical to counters_to_planes_gn + encrypt_planes_gn +
    planes_to_words_gn.  N must be a multiple of 128.
    """
    N = nlo.shape[0]
    assert N % N_B == 0, N
    G = (n_blocks + 31) // 32
    G_pad = ((G + G_B - 1) // G_B) * G_B
    cnt = counter_bit_planes_gn(nlo, nhi, G_pad)
    words_t = _run(cnt, rk_masks, G_pad, interpret)  # [4, G_pad*32, N]
    words = jnp.transpose(words_t, (2, 1, 0))        # [N, G_pad*32, 4]
    return words[:, :n_blocks, :]
