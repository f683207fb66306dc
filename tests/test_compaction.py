"""Edge compaction at scale (reference: include/pvac/ops/encrypt.hpp:39-111).

compact_edges aggregates by (layer, idx, sign) — weights field-sum, σ XOR —
and must stay fully vectorized: a guard_budget-triggered compaction of ~10^6
edges (edge_budget is 1.2M, core/types.hpp:51) has to finish in a couple of
seconds, not minutes of per-bucket Python.
"""
import time

import numpy as np
import pytest

import pvac_hfhe_cppbyv_tpu as pvac
from pvac_hfhe_cppbyv_tpu.core import field as F
from pvac_hfhe_cppbyv_tpu.core import fieldv as FV
from pvac_hfhe_cppbyv_tpu.ops.encrypt import compact_edges
from pvac_hfhe_cppbyv_tpu.types import Cipher, Layer, Nonce128, RSeed, RRULE_BASE


def _mk_cipher(prm, E, n_layers, rng):
    layers = [
        Layer(RRULE_BASE, RSeed(int(rng.integers(1 << 60)),
                                Nonce128(1, 2)))
        for _ in range(n_layers)
    ]
    lid = rng.integers(0, n_layers, E).astype(np.int32)
    idx = rng.integers(0, prm.B, E).astype(np.int32)
    ch = rng.integers(0, 2, E).astype(np.int8)
    w = rng.integers(0, 1 << 32, (E, 4), dtype=np.uint64).astype(np.uint32)
    w[:, 3] &= 0x7FFFFFFF  # canonical-range limbs
    sig = rng.integers(0, 1 << 32, (E, prm.sigma_words32),
                       dtype=np.uint64).astype(np.uint32)
    return Cipher(layers, lid, idx, ch, w, sig)


def test_canon_u64_limbs_matches_int_math():
    rng = np.random.default_rng(0)
    acc = rng.integers(0, 1 << 62, (257, 4), dtype=np.uint64)
    got = FV.to_ints(FV.canon_u64_limbs(acc))
    want = [
        (int(a[0]) + (int(a[1]) << 32) + (int(a[2]) << 64)
         + (int(a[3]) << 96)) % F.P
        for a in acc
    ]
    assert got == want


def test_compact_edges_semantics_vs_bruteforce():
    prm = pvac.small_test_params()
    rng = np.random.default_rng(1)
    # few buckets -> lots of collisions, including weight-cancelling pairs
    C = _mk_cipher(prm, 400, 2, rng)
    C.idx = (C.idx % 3).astype(np.int32)
    # force some exact cancellations: duplicate edges with negated weights
    C2 = C.copy()
    negw = FV.neg(C.w[:50])
    C.layer_id = np.concatenate([C.layer_id, C.layer_id[:50]])
    C.idx = np.concatenate([C.idx, C.idx[:50]])
    C.ch = np.concatenate([C.ch, C.ch[:50]])
    C.w = np.concatenate([C.w, negw])
    C.sigma = np.concatenate([C.sigma, C.sigma[:50]])  # σ also cancels

    pk = type("PK", (), {"prm": prm})()
    compact_edges(pk, C)

    # brute force mirror (σ of the 50 duplicated rows XOR-cancels)
    buckets = {}
    rows = list(range(C2.n_edges)) + list(range(50))
    for pos, src in enumerate(rows):
        k = (int(C2.layer_id[src]), int(C2.idx[src]), int(C2.ch[src]))
        wv = FV.to_ints(C2.w[src : src + 1])[0]
        if pos >= C2.n_edges:
            wv = F.fp_neg(wv)
        w0, s0 = buckets.get(k, (0, np.zeros(prm.sigma_words32, np.uint32)))
        buckets[k] = (F.fp_add(w0, wv), s0 ^ C2.sigma[src])
    want = sorted(
        (k, v) for k, v in buckets.items()
        if v[0] != 0 or v[1].any()
    )
    got = []
    for e in range(C.n_edges):
        got.append(((int(C.layer_id[e]), int(C.idx[e]), int(C.ch[e])),
                    (FV.to_ints(C.w[e : e + 1])[0], C.sigma[e])))
    assert len(got) == len(want)
    for (gk, (gw, gs)), (wk, (ww, ws)) in zip(got, want):
        assert gk == wk and gw == ww
        np.testing.assert_array_equal(gs, ws)
    # emission order: layer asc, idx asc, P before M (encrypt.hpp:39-71)
    keys = [g[0] for g in got]
    assert keys == sorted(keys)


def test_compact_edges_million_edges_fast():
    prm = pvac.small_test_params()
    rng = np.random.default_rng(2)
    E = 1_000_000
    C = _mk_cipher(prm, E, 64, rng)
    pk = type("PK", (), {"prm": prm})()
    t0 = time.time()
    compact_edges(pk, C)
    dt = time.time() - t0
    # bounded output: <= layers * B * 2 buckets
    assert C.n_edges <= 64 * prm.B * 2
    # Vectorized path runs in ~0.5 s; the Python-loop regression this guards
    # against took >100 s.  Bound is loose because CI hosts share 2 cores.
    assert dt < 10.0, f"compact_edges(1M) took {dt:.2f}s"
