"""Hypergraph/σ machinery tests vs reference vectors (gen_H, ubk,
sigma_from_H, layer ztag)."""
import numpy as np
import pytest

from pvac_hfhe_cppbyv_tpu.core import bitvec as BV
from pvac_hfhe_cppbyv_tpu.params import Params, small_test_params
from pvac_hfhe_cppbyv_tpu.types import Nonce128, PubKey
from pvac_hfhe_cppbyv_tpu.crypto import matrix


def _mk_pk(prm, canon_tag):
    return PubKey(prm=prm, canon_tag=canon_tag, H=None, ubk=None,
                  H_digest=b"\x00" * 32, omega_B=0, powg_B=[])


def test_ubk_512(vectors):
    v = vectors["ubk_512"]
    u = matrix.gen_ubk_public(int(v["canon_tag"]), 512)
    assert list(map(int, u.perm)) == v["perm"]
    assert np.array_equal(u.perm[u.inv], np.arange(512))


def test_ubk_8192(vectors):
    v = vectors["ubk_8192"]
    u = matrix.gen_ubk_public(0x123456789ABCDEF0, 8192)
    assert list(map(int, u.perm[:32])) == v["head"]
    h = 0xCBF29CE484222325
    for x in map(int, u.perm):
        h = ((h ^ x) * 0x100000001B3) & ((1 << 64) - 1)
    assert h == int(v["fnv"])


def test_layer_ztag(vectors):
    z1, z2 = (int(x) for x in vectors["layer_ztag"])
    assert matrix.prg_layer_ztag(0x123456789ABCDEF0, Nonce128(1, 2)) == z1
    assert matrix.prg_layer_ztag(0, Nonce128(0, 0)) == z2


@pytest.fixture(scope="module")
def small_pk(vectors):
    pk = _mk_pk(small_test_params(), 0x777)
    matrix.gen_H(pk)
    return pk


def test_gen_H_small(vectors, small_pk):
    v = vectors["gen_H_small"]
    assert small_pk.H_digest.hex() == v["digest"]
    col0 = BV.to_u64_words(small_pk.H[0])
    col777 = BV.to_u64_words(small_pk.H[777])
    assert list(map(int, col0)) == [int(x) for x in v["col0"]]
    assert list(map(int, col777)) == [int(x) for x in v["col777"]]


def test_sigma_small(vectors, small_pk):
    v = vectors["sigma_small"]
    s1 = matrix.sigma_from_H(small_pk, 0xFEEDFACE12345678, Nonce128(0x1020304050607080, 0x0807060504030201), 5, 0, 99)
    s2 = matrix.sigma_from_H(small_pk, 0xFEEDFACE12345678, Nonce128(0x1020304050607080, 0x0807060504030201), 5, 1, 99)
    s3 = matrix.sigma_from_H(small_pk, 0x42, Nonce128(7, 8), 300, 0, 0)
    for got, want in zip((s1, s2, s3), v):
        assert list(map(int, BV.to_u64_words(got))) == [int(x) for x in want]

    vp = vectors["sigma_small_permuted"]
    u = matrix.gen_ubk_public(small_pk.canon_tag, small_pk.prm.m_bits)
    sp = matrix.apply_perm_sigma(s1, u.inv)
    assert list(map(int, BV.to_u64_words(sp))) == [int(x) for x in vp]


@pytest.mark.slow
def test_gen_H_default(vectors):
    v = vectors["gen_H_default"]
    pk = _mk_pk(Params(), 0x123456789ABCDEF0)
    matrix.gen_H(pk)
    assert pk.H_digest.hex() == v["digest"]
    col0 = BV.to_u64_words(pk.H[0])
    assert list(map(int, col0[:8])) == [int(x) for x in v["col0_first8w"]]
