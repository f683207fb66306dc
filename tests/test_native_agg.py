"""Native dense-bucket ct_mul cross aggregation (pvacn_mul_cross_agg) vs
the numpy host fallback.

Both implement the reference's pair-key hashmap semantics
(include/pvac/ops/arithmetic.hpp:72-101); the native path must be
bit-identical, including its multi-threaded regime (>2^22 pairs, A-side
partitioned by layer id).
"""
import random

import numpy as np
import pytest

from pvac_hfhe_cppbyv_tpu import native

P = (1 << 127) - 1


def _rand_cipher_arrays(rng, pyrng, E, L, B):
    lid = rng.integers(0, L, E).astype(np.int32)
    idx = rng.integers(0, B, E).astype(np.int32)
    ch = rng.integers(0, 2, E).astype(np.int8)
    vals = [pyrng.getrandbits(127) % P for _ in range(E)]
    w = np.array([[(v >> (32 * i)) & 0xFFFFFFFF for i in range(4)]
                  for v in vals], dtype=np.uint32)
    return lid, idx, ch, w


def _bigint_reference(A, B, LA, LB, Bmod):
    accs = {}
    la_, ia_, ca_, wa_ = A
    lb_, ib_, cb_, wb_ = B

    def toint(w):
        return sum(int(w[i]) << (32 * i) for i in range(4))

    for i in range(len(la_)):
        ai = toint(wa_[i])
        row = int(la_[i]) * LB
        ia = int(ia_[i])
        ca = int(ca_[i])
        for j in range(len(lb_)):
            key = ((row + int(lb_[j])) * Bmod
                   + (ia + int(ib_[j])) % Bmod) * 2 + int(ca != cb_[j])
            accs[key] = (accs.get(key, 0) + ai * toint(wb_[j])) % P
    accs = {k: v for k, v in accs.items() if v}
    keys = np.array(sorted(accs), dtype=np.int64)
    w = np.array([[(accs[int(k)] >> (32 * i)) & 0xFFFFFFFF for i in range(4)]
                  for k in keys], dtype=np.uint32).reshape(len(keys), 4)
    return keys, w


@pytest.mark.skipif(native.lib() is None, reason="native runtime unavailable")
def test_cross_agg_bit_exact_single_thread():
    rng = np.random.default_rng(11)
    pyrng = random.Random(11)
    LA, LB, Bmod = 4, 6, 37
    A = _rand_cipher_arrays(rng, pyrng, 150, LA, Bmod)
    B = _rand_cipher_arrays(rng, pyrng, 170, LB, Bmod)
    got = native.mul_cross_agg(*A, *B, LA, LB, Bmod)
    assert got is not None
    keys, w = got
    rkeys, rw = _bigint_reference(A, B, LA, LB, Bmod)
    np.testing.assert_array_equal(keys, rkeys)
    np.testing.assert_array_equal(w, rw)


@pytest.mark.skipif(native.lib() is None, reason="native runtime unavailable")
def test_cross_agg_threaded_matches_numpy_fallback():
    """>2^22 pairs engages the threaded regime; check against the numpy
    chunked-unique fallback semantics (the production alternative path)."""
    rng = np.random.default_rng(12)
    pyrng = random.Random(12)
    LA = LB = 16
    Bmod = 101
    nA = nB = 2100  # 4.41M pairs > 2^22
    A = _rand_cipher_arrays(rng, pyrng, nA, LA, Bmod)
    B = _rand_cipher_arrays(rng, pyrng, nB, LB, Bmod)
    got = native.mul_cross_agg(*A, *B, LA, LB, Bmod)
    assert got is not None
    keys, w = got

    # numpy mirror of the fallback in ops/arithmetic.py:_ct_mul_stage_host
    from pvac_hfhe_cppbyv_tpu.core import fieldv as FV

    la_, ia_, ca_, wa_ = A
    lb_, ib_, cb_, wb_ = B
    ii = np.repeat(np.arange(nA), nB)
    jj = np.tile(np.arange(nB), nA)
    key = ((la_[ii].astype(np.int64) * LB + lb_[jj].astype(np.int64)) * Bmod
           + (ia_[ii].astype(np.int64) + ib_[jj].astype(np.int64)) % Bmod
           ) * 2 + (ca_[ii] != cb_[jj]).astype(np.int64)
    ww = FV.mul(wa_[ii], wb_[jj]).astype(np.uint64)
    uniq, inv = np.unique(key, return_inverse=True)
    acc = np.zeros((len(uniq), 4), dtype=np.uint64)
    np.add.at(acc, inv, ww)
    red = native.reduce_u64_limbs(acc)
    if red is None:
        red = FV.canon_u64_limbs(acc)
    nz = red.any(axis=1)
    np.testing.assert_array_equal(keys, uniq[nz])
    np.testing.assert_array_equal(w, red[nz])


@pytest.mark.skipif(native.lib() is None, reason="native runtime unavailable")
def test_cross_agg_cancellation_and_empty():
    """Buckets summing to 0 mod p must be dropped; empty inputs yield
    empty output."""
    LA = LB = 1
    Bmod = 5
    lid = np.zeros(2, dtype=np.int32)
    idx = np.zeros(2, dtype=np.int32)
    # two A edges with weights w and p-w against one B edge of weight 1:
    # same bucket, sum == 0 mod p -> dropped
    wv = 123456789
    w = np.array([[wv, 0, 0, 0],
                  [(P - wv) & 0xFFFFFFFF, (P - wv) >> 32 & 0xFFFFFFFF,
                   (P - wv) >> 64 & 0xFFFFFFFF, (P - wv) >> 96 & 0xFFFFFFFF]],
                 dtype=np.uint32)
    ch = np.zeros(2, dtype=np.int8)
    one = np.array([[1, 0, 0, 0]], dtype=np.uint32)
    z = np.zeros(1, dtype=np.int32)
    got = native.mul_cross_agg(lid, idx, ch, w, z, z, np.zeros(1, np.int8),
                               one, LA, LB, Bmod)
    assert got is not None
    keys, ww = got
    assert len(keys) == 0

    e32 = np.zeros(0, dtype=np.int32)
    got = native.mul_cross_agg(e32, e32, np.zeros(0, np.int8),
                               np.zeros((0, 4), np.uint32),
                               z, z, np.zeros(1, np.int8), one, 1, 1, Bmod)
    assert got is not None and len(got[0]) == 0


def test_dispatch_prefers_native_for_small_keyspace():
    from pvac_hfhe_cppbyv_tpu.ops import arithmetic as ar

    if native.lib() is None:
        assert not ar._native_agg_viable(32, 32, 674, 1 << 24)
        return
    # step-3 shape: huge pair count, small keyspace -> native host
    assert ar._native_agg_viable(32, 32, 674, 116 * 10**6)
    # keyspace over the dense cap -> device grid
    assert not ar._native_agg_viable(320, 320, 674, 1 << 24)
    # pair count over the native ceiling -> device grid
    assert not ar._native_agg_viable(32, 32, 674, (1 << 28) + 1)
