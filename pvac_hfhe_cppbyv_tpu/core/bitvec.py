"""Packed GF(2) bit vectors (reference: include/pvac/core/bitvec.hpp).

A batch of m-bit vectors is an array [..., W] of uint32 words, little-endian
bit order (bit i lives in word i // 32 at position i % 32).  This is
bit-compatible with the reference's little-endian uint64 word layout: u64
word j == u32 words 2j (low) and 2j+1 (high).

Backend-agnostic: works on numpy and jax.numpy arrays.
"""
from __future__ import annotations

import numpy as np

U32 = np.uint32


def words32(nbits: int) -> int:
    return (nbits + 31) // 32


def make(nbits: int, batch_shape=()) -> np.ndarray:
    return np.zeros((*batch_shape, words32(nbits)), dtype=U32)


def from_u64_words(w64) -> np.ndarray:
    """uint64 word array [..., W64] -> uint32 word array [..., 2*W64]."""
    w64 = np.asarray(w64, dtype=np.uint64)
    lo = (w64 & np.uint64(0xFFFFFFFF)).astype(U32)
    hi = (w64 >> np.uint64(32)).astype(U32)
    out = np.stack([lo, hi], axis=-1)
    return out.reshape(*w64.shape[:-1], w64.shape[-1] * 2)


def to_u64_words(w32) -> np.ndarray:
    """uint32 word array [..., 2*W64] -> uint64 word array [..., W64]."""
    w32 = np.asarray(w32, dtype=np.uint32)
    assert w32.shape[-1] % 2 == 0
    pairs = w32.reshape(*w32.shape[:-1], w32.shape[-1] // 2, 2).astype(np.uint64)
    return pairs[..., 0] | (pairs[..., 1] << np.uint64(32))


def get_bit(v, i: int):
    return (v[..., i // 32] >> U32(i % 32)) & U32(1)


def set_bits_from_indices(nbits: int, idx) -> np.ndarray:
    """One m-bit vector with the given (host-side) bit indices set."""
    v = make(nbits)
    for i in idx:
        v[int(i) // 32] |= U32(1 << (int(i) % 32))
    return v


def popcount32(x):
    """Per-element popcount for uint32 arrays (numpy or jnp)."""
    if type(x).__module__.startswith("numpy"):
        x = x - ((x >> U32(1)) & U32(0x55555555))
        x = (x & U32(0x33333333)) + ((x >> U32(2)) & U32(0x33333333))
        x = (x + (x >> U32(4))) & U32(0x0F0F0F0F)
        return (x * U32(0x01010101)) >> U32(24)
    import jax.lax as lax

    return lax.population_count(x)


def popcnt(v):
    """Total popcount over the word axis (reference BitVec::popcnt)."""
    return popcount32(v).sum(axis=-1)


def parity(v):
    """Parity of all bits (reference parity64 folded over words)."""
    acc = v[..., 0]
    for k in range(1, v.shape[-1]):
        acc = acc ^ v[..., k]
    x = acc
    x = x ^ (x >> U32(16))
    x = x ^ (x >> U32(8))
    x = x ^ (x >> U32(4))
    x = x ^ (x >> U32(2))
    x = x ^ (x >> U32(1))
    return x & U32(1)
