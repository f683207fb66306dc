"""Recipe-backed σ (types.VirtualSigma) for deep products.

σ is LPN camouflage that op chains never read; eager generation is what
kills the reference's own depth test at step 4 (std::bad_alloc at 44M
edges x 1KB of σ — reproduced from tests/test_depth.cpp with a 60 GB
cap).  VirtualSigma defers generation and must be bit-identical to the
eager path on materialization.
"""
import numpy as np
import pytest

import pvac_hfhe_cppbyv_tpu as pvac
from pvac_hfhe_cppbyv_tpu.ops import arithmetic as ar
from pvac_hfhe_cppbyv_tpu.ops.encrypt import compact_edges, sigma_density
from pvac_hfhe_cppbyv_tpu.types import VirtualSigma


@pytest.fixture
def virtual_everything(monkeypatch):
    monkeypatch.setenv("PVAC_SIGMA_EAGER_MAX", "1")


def test_mul_chain_stays_virtual_and_decrypts(small_keys, virtual_everything):
    pk, sk = small_keys
    a, b = 123, 456
    ca, cb = pvac.enc_value_batch(pk, sk, [a, b])
    prod = pvac.ct_mul(pk, ca, cb)
    assert isinstance(prod.sigma, VirtualSigma)
    assert pvac.dec_value(pk, sk, prod) == a * b % pvac.P
    sq = pvac.ct_mul(pk, prod, prod)
    assert isinstance(sq.sigma, VirtualSigma)
    assert pvac.dec_value(pk, sk, sq) == pow(a * b, 2, pvac.P)


def test_add_concat_and_density(small_keys, virtual_everything):
    pk, sk = small_keys
    a, b = 7, 9
    ca, cb = pvac.enc_value_batch(pk, sk, [a, b])
    p1 = pvac.ct_mul(pk, ca, cb)
    p2 = pvac.ct_mul(pk, ca, cb)
    s = pvac.ct_add(pk, p1, p2)
    assert isinstance(s.sigma, VirtualSigma)
    assert pvac.dec_value(pk, sk, s) == 2 * a * b % pvac.P
    d = sigma_density(pk, p1)  # streamed popcnt path
    assert 0.4 < d < 0.6


def test_compact_pure_reorder_keeps_virtual(small_keys, virtual_everything):
    pk, sk = small_keys
    prod = pvac.ct_mul(pk, *pvac.enc_value_batch(pk, sk, [3, 5]))
    before = np.asarray(prod.sigma)
    key = np.lexsort((prod.ch, prod.idx, prod.layer_id))
    compact_edges(pk, prod)
    assert isinstance(prod.sigma, VirtualSigma)
    # compaction reordered edges; σ rows followed their edges
    np.testing.assert_array_equal(np.asarray(prod.sigma), before[key])


def test_compact_merge_materializes(small_keys, virtual_everything):
    """ct_add of a product with itself duplicates buckets: compaction must
    fall back to the eager merge (weights sum, σ XOR)."""
    pk, sk = small_keys
    prod = pvac.ct_mul(pk, *pvac.enc_value_batch(pk, sk, [3, 5]))
    dup = prod.copy()
    dup.sigma = prod.sigma.copy()
    from pvac_hfhe_cppbyv_tpu.types import Cipher, concat_virtual_sigma

    doubled = Cipher(
        [type(L)(L.rule, L.seed, L.pa, L.pb) for L in prod.layers],
        np.concatenate([prod.layer_id, dup.layer_id]),
        np.concatenate([prod.idx, dup.idx]),
        np.concatenate([prod.ch, dup.ch]),
        np.concatenate([prod.w, dup.w]),
        concat_virtual_sigma([prod.sigma, dup.sigma]),
    )
    n_before = doubled.n_edges
    compact_edges(pk, doubled)
    assert doubled.n_edges == n_before // 2  # identical buckets merged
    assert isinstance(doubled.sigma, np.ndarray)  # σ XOR forced materialize
    assert not doubled.sigma.any()  # XOR of identical rows cancels
    assert pvac.dec_value(pk, sk, doubled) == 2 * 15 % pvac.P


def test_serialization_materializes_deterministically(
    small_keys, virtual_everything, tmp_path
):
    pk, sk = small_keys
    prod = pvac.ct_mul(pk, *pvac.enc_value_batch(pk, sk, [11, 13]))
    sig = np.asarray(prod.sigma)
    pvac.save_cts([prod], str(tmp_path / "p.ct"))
    back = pvac.load_cts(str(tmp_path / "p.ct"))[0]
    np.testing.assert_array_equal(np.asarray(back.sigma), sig)
    assert pvac.dec_value(pk, sk, back) == 11 * 13 % pvac.P


def test_virtual_matches_eager_distribution(small_keys, monkeypatch):
    """Virtual σ materialization is produced by the same generator as the
    eager path: same (seed, idx, ch, salt) -> same bits."""
    pk, sk = small_keys
    ca, cb = pvac.enc_value_batch(pk, sk, [2, 3])
    monkeypatch.setenv("PVAC_SIGMA_EAGER_MAX", "1")
    pv = pvac.ct_mul(pk, ca, cb)
    assert isinstance(pv.sigma, VirtualSigma)
    sig_v = np.asarray(pv.sigma)
    # regenerate through the eager builder with the identical inputs
    from pvac_hfhe_cppbyv_tpu.crypto import matrix

    vs = pv.sigma
    lid = (vs.packed >> np.uint32(11)).astype(np.int64)
    trip = vs.ltab[lid]
    fin = matrix.sigma_words_start(
        pk, trip[:, 0], trip[:, 1], trip[:, 2],
        ((vs.packed >> np.uint32(1)) & np.uint32(0x3FF)).astype(np.uint64),
        (vs.packed & np.uint32(1)).astype(np.uint64),
        vs.salt,
    )
    np.testing.assert_array_equal(np.asarray(fin()), sig_v)


def test_density_sample_tracks_exact(small_keys, virtual_everything):
    pk, sk = small_keys
    prod = pvac.ct_mul(pk, *pvac.enc_value_batch(pk, sk, [17, 19]))
    assert isinstance(prod.sigma, VirtualSigma)
    exact = sigma_density(pk, prod)
    est = prod.sigma.density_sample(max_rows=64)  # strided subsample
    assert abs(est - exact) < 0.02


def test_recrypt_stays_virtual_without_materializing(small_keys,
                                                     virtual_everything,
                                                     monkeypatch):
    """recrypt.hpp:26-41 on a recipe-backed product: the balance check
    samples density instead of generating every row, the loop is skipped
    (fresh pseudorandom sigma sits at ~0.5), and the result keeps its
    virtual sigma through compaction."""
    from pvac_hfhe_cppbyv_tpu.ops import recrypt as rc

    pk, sk = small_keys
    prod = pvac.ct_mul(pk, *pvac.enc_value_batch(pk, sk, [21, 2]))
    assert isinstance(prod.sigma, VirtualSigma)
    monkeypatch.setattr(rc, "VSIGMA_SAMPLE_MIN", 100)
    ek = rc.make_evalkey(pk, sk, 2, 1)
    out = rc.ct_recrypt(pk, ek, prod)
    assert isinstance(out.sigma, VirtualSigma)
    assert pvac.dec_value(pk, sk, out) == 42 % pvac.P
