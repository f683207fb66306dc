"""Fused Pallas SHA-256 multi-message kernel.

Computes many independent SHA-256 digests (fixed number of 64-byte blocks
each) in one TPU kernel: message words stream HBM -> VMEM once, the whole
64-round compression (message schedule + state updates) runs on VPU
registers/VMEM with zero intermediate HBM traffic, and only the 8-word
digests are written back.

This replaces the op-per-round XLA path (core/hash.py sha256_compress) on
the σ-generation hot path: there, every round's temporaries round-trip
through HBM, making SHA-256 memory-bound at ~100x below VPU speed of light.

Reference semantics: include/pvac/core/hash.hpp:24-191 (SHA-256), used by
the SHA-256-CTR generators in include/pvac/crypto/matrix.hpp:15-92.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.hash import _H0, _K

U32 = np.uint32

# Lane tile: SUB x 128 u32 elements per message-word register.
SUB = 8
LANE = 128
TILE = SUB * LANE  # messages per grid step


def _rotr(x, n: int):
    return (x >> U32(n)) | (x << U32(32 - n))


def _compress(state, w):
    """One unrolled SHA-256 compression; state and w entries are (SUB, LANE)
    uint32 tiles; w is consumed as a 16-register rolling window."""
    a, b, c, d, e, f, g, h = state
    w = list(w)
    for i in range(64):
        if i < 16:
            wi = w[i]
        else:
            w15 = w[(i - 15) % 16]
            w2 = w[(i - 2) % 16]
            s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> U32(3))
            s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> U32(10))
            wi = w[i % 16] + s0 + w[(i - 7) % 16] + s1
            w[i % 16] = wi
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + U32(int(_K[i])) + wi
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    return [
        state[0] + a, state[1] + b, state[2] + c, state[3] + d,
        state[4] + e, state[5] + f, state[6] + g, state[7] + h,
    ]


def _kernel(nb: int, blk_ref, out_ref):
    state = [
        jnp.full((SUB, LANE), U32(int(_H0[k])), dtype=jnp.uint32)
        for k in range(8)
    ]
    for b in range(nb):
        w = [blk_ref[0, b * 16 + j] for j in range(16)]
        state = _compress(state, w)
    for k in range(8):
        out_ref[0, k] = state[k]


# Interpret mode for CPU tests: runs the Pallas kernels through the
# interpreter, eagerly (bypassing jit — a fully unrolled SHA round chain
# triggers pathological compile times in the CPU fusion emitter).
INTERPRET = False

# Static round-chain unroll (read once at import: _maybe_jit caches compiled
# kernels per shape, so a later env toggle could not take effect anyway).
import os as _os

UNROLL = _os.environ.get("PVAC_SHA_UNROLL", "0") == "1"


def _maybe_jit(fn, static_argnums):
    jitted = jax.jit(fn, static_argnums=static_argnums)

    @functools.wraps(fn)
    def wrapper(*args):
        if INTERPRET:
            return fn(*args)
        return jitted(*args)

    return wrapper


def _sha256_fixed_blocks(blocks, nb: int):
    """blocks: [I, nb, 16] uint32 big-endian message words (I a multiple of
    TILE); returns [I, 8] uint32 digest words (big-endian h0..h7)."""
    I = blocks.shape[0]
    assert I % TILE == 0, I
    n_tiles = I // TILE
    # [I, nb, 16] -> [n_tiles, nb*16, SUB, LANE]: word-major so each message
    # word j is one contiguous (SUB, LANE) vector register per tile.
    x = blocks.reshape(n_tiles, TILE, nb * 16)
    x = jnp.swapaxes(x, 1, 2).reshape(n_tiles, nb * 16, SUB, LANE)
    out = pl.pallas_call(
        functools.partial(_kernel, nb),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, SUB, LANE), jnp.uint32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, nb * 16, SUB, LANE),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 8, SUB, LANE), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=INTERPRET,
    )(x)
    # [n_tiles, 8, SUB, LANE] -> [I, 8]
    out = out.reshape(n_tiles, 8, TILE)
    return jnp.swapaxes(out, 1, 2).reshape(I, 8)


sha256_fixed_blocks = _maybe_jit(_sha256_fixed_blocks, static_argnums=(1,))


def _word_contribs(layout, n_fields: int):
    """Static per-word byte-sources for a MsgLayout message.

    Returns [per block][per word] -> (const_u32, [(field, half, src_shift,
    dst_shift), ...]): message word = const | OR of ((field_half >> src_shift
    & 0xFF) << dst_shift).  half 0 = lo32, 1 = hi32 of the LE u64 field.
    """
    tmpl = layout.template
    nb = layout.n_blocks
    const = [
        [
            (int(tmpl[4 * (16 * b + w)]) << 24)
            | (int(tmpl[4 * (16 * b + w) + 1]) << 16)
            | (int(tmpl[4 * (16 * b + w) + 2]) << 8)
            | int(tmpl[4 * (16 * b + w) + 3])
            for w in range(16)
        ]
        for b in range(nb)
    ]
    contribs = [[[] for _ in range(16)] for _ in range(nb)]
    P = len(layout.prefix)
    for f in range(n_fields):
        for j in range(8):
            pos = P + 8 * f + j
            b, w, byte_in_word = pos // 64, (pos % 64) // 4, pos % 4
            half = 0 if j < 4 else 1
            src_shift = 8 * (j % 4)
            dst_shift = (3 - byte_in_word) * 8
            const[b][w % 16] &= ~(0xFF << dst_shift) & 0xFFFFFFFF
            contribs[b][w % 16].append((f, half, src_shift, dst_shift))
    return const, contribs


def _ctr_kernel(const, contribs, n_fields: int, R: int, nb: int,
                fields_ref, out_ref):
    """Fused SHA-256-CTR stream: builds message words from the lane fields
    in-register, computes the (counter-independent) block-1 midstate once,
    then runs R counter compressions of the remaining blocks."""
    f_half = {
        (f, h): fields_ref[0, 2 * f + h] for f in range(n_fields)
        for h in range(2)
    }

    def word(b, w, ctr):
        acc = None
        for (f, half, ss, ds) in contribs[b][w]:
            if f == n_fields:  # the counter field
                src = ctr if half == 0 else U32(0)
            else:
                src = f_half[(f, half)]
            v = ((src >> U32(ss)) & U32(0xFF)) << U32(ds)
            acc = v if acc is None else acc | v
        c = U32(const[b][w])
        if acc is None:
            return jnp.full((SUB, LANE), c, dtype=jnp.uint32)
        return acc | c

    # Blocks whose words never reference the counter can be hoisted out of
    # the counter loop (their compression state is counter-independent).
    def block_has_ctr(b):
        return any(f == n_fields for w in range(16)
                   for (f, _, _, _) in contribs[b][w])

    state = [
        jnp.full((SUB, LANE), U32(int(_H0[k])), dtype=jnp.uint32)
        for k in range(8)
    ]
    first_ctr_block = next(
        (b for b in range(nb) if block_has_ctr(b)), nb
    )
    for b in range(nb):
        if b >= first_ctr_block:
            break
        state = _compress(state, [word(b, w, U32(0)) for w in range(16)])
    mid = state

    if UNROLL and R <= 64:
        # static unroll: constant message words fold at compile time and all
        # stores use static indices
        for r in range(R):
            st = mid
            for b in range(first_ctr_block, nb):
                st = _compress(st, [word(b, w, U32(r)) for w in range(16)])
            for k in range(8):
                out_ref[0, r * 8 + k] = st[k]
        return

    def body(r, _):
        ctr = r.astype(jnp.uint32)
        st = mid
        for b in range(first_ctr_block, nb):
            st = _compress(st, [word(b, w, ctr) for w in range(16)])
        for k in range(8):
            out_ref[0, r * 8 + k] = st[k]
        return 0

    jax.lax.fori_loop(0, R, body, 0)


def _shactr_stream_states(label_bytes: bytes, lanes, n_fields_with_ctr: int,
                          R: int):
    """Fused SHA-256-CTR stream generator.

    lanes: [L, n_fields_with_ctr, 2] uint32 field halves, where the LAST
    field is the stream counter (its lane values are ignored; the kernel
    substitutes counters 0..R-1).  L must be a multiple of TILE.
    Returns [L, R, 8] uint32 digest states, one per (lane, counter).
    """
    from ..core.hash import MsgLayout

    nf = n_fields_with_ctr
    layout = MsgLayout(label_bytes, nf)
    const, contribs = _word_contribs(layout, nf)
    L = lanes.shape[0]
    assert L % TILE == 0, L
    n_tiles = L // TILE
    nb = layout.n_blocks

    # [L, nf, 2] -> [n_tiles, nf*2, SUB, LANE] word-major
    x = lanes.reshape(n_tiles, TILE, nf * 2)
    x = jnp.swapaxes(x, 1, 2).reshape(n_tiles, nf * 2, SUB, LANE)
    out = pl.pallas_call(
        functools.partial(_ctr_kernel, const, contribs, nf - 1, R, nb),
        out_shape=jax.ShapeDtypeStruct((n_tiles, R * 8, SUB, LANE), jnp.uint32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, nf * 2, SUB, LANE), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, R * 8, SUB, LANE), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=INTERPRET,
    )(x)
    out = out.reshape(n_tiles, R, 8, TILE)
    return jnp.moveaxis(out, 3, 1).reshape(L, R, 8)


shactr_stream_states = _maybe_jit(_shactr_stream_states,
                                  static_argnums=(0, 2, 3))


def sha256_many(blocks):
    """blocks: [..., nb, 16] uint32 -> [..., 8] uint32 final states.

    Pads the flattened batch up to a TILE multiple and dispatches the fused
    kernel.  Drop-in for a chain of sha256_compress calls over fixed-shape
    messages.
    """
    batch = blocks.shape[:-2]
    nb = blocks.shape[-2]
    flat = blocks.reshape(-1, nb, 16)
    I = flat.shape[0]
    I_pad = -(-I // TILE) * TILE
    if I_pad != I:
        flat = jnp.concatenate(
            [flat, jnp.zeros((I_pad - I, nb, 16), dtype=jnp.uint32)], axis=0
        )
    out = sha256_fixed_blocks(flat, nb)[:I]
    return out.reshape(*batch, 8)
