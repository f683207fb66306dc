"""Field arithmetic tests.

Mirrors tests/test_fp_core.cpp (20k-iteration algebraic properties + Fermat)
and cross-checks both the scalar and the vectorized limb path against
reference-generated vectors (tests/golden/vectors.json -> "fp_ops",
"fp_from_words_cases").
"""
import random

import numpy as np
import pytest

from pvac_hfhe_cppbyv_tpu.core import field as F
from pvac_hfhe_cppbyv_tpu.core import fieldv as FV

P = F.P


def _fp(words):
    return F.fp_from_words(int(words[0]), int(words[1]))


class TestScalarVsVectors:
    def test_fp_ops_vectors(self, vectors):
        for case in vectors["fp_ops"]:
            a = _fp(case["a"])
            b = _fp(case["b"])
            assert F.fp_add(a, b) == _fp(case["add"])
            assert F.fp_sub(a, b) == _fp(case["sub"])
            assert F.fp_mul(a, b) == _fp(case["mul"])
            if a:
                assert F.fp_inv(a) == _fp(case["inv_a"])
            assert F.fp_pow(a, 0xABCDEF0123) == _fp(case["pow_a"])

    def test_from_words_cases(self, vectors):
        for case in vectors["fp_from_words_cases"]:
            got = F.fp_from_words(int(case["in"][0]), int(case["in"][1]))
            assert got == _fp(case["out"])


class TestScalarProperties:
    def test_algebra_20k(self):
        rng = random.Random(12345)
        for _ in range(20000):
            a = rng.randrange(P)
            b = rng.randrange(P)
            c = rng.randrange(P)
            assert F.fp_add(a, F.fp_neg(a)) == 0
            assert F.fp_sub(a, b) == F.fp_add(a, F.fp_neg(b))
            assert F.fp_mul(a, F.fp_add(b, c)) == F.fp_add(
                F.fp_mul(a, b), F.fp_mul(a, c)
            )

    def test_fermat(self):
        rng = random.Random(999)
        for _ in range(50):
            a = rng.randrange(1, P)
            assert F.fp_pow(a, P) == a
            assert F.fp_mul(a, F.fp_inv(a)) == 1


class TestVectorized:
    @pytest.fixture(scope="class")
    def rand_pairs(self):
        rng = random.Random(777)
        a = [rng.randrange(P) for _ in range(512)]
        b = [rng.randrange(P) for _ in range(512)]
        return a, b

    def test_pack_roundtrip(self, rand_pairs):
        a, _ = rand_pairs
        assert FV.to_ints(FV.from_ints(a)) == a
        lo = np.array([x & 0xFFFFFFFFFFFFFFFF for x in a], dtype=np.uint64)
        hi = np.array([x >> 64 for x in a], dtype=np.uint64)
        limbs = FV.from_u64_pairs(lo, hi)
        lo2, hi2 = FV.to_u64_pairs(limbs)
        assert np.array_equal(lo, lo2) and np.array_equal(hi, hi2)

    def test_add_sub_neg_mul_numpy(self, rand_pairs):
        a, b = rand_pairs
        av, bv = FV.from_ints(a), FV.from_ints(b)
        assert FV.to_ints(FV.add(av, bv)) == [(x + y) % P for x, y in zip(a, b)]
        assert FV.to_ints(FV.sub(av, bv)) == [(x - y) % P for x, y in zip(a, b)]
        assert FV.to_ints(FV.neg(av)) == [(-x) % P for x in a]
        assert FV.to_ints(FV.mul(av, bv)) == [(x * y) % P for x, y in zip(a, b)]

    def test_inv_numpy(self, rand_pairs):
        a, _ = rand_pairs
        a = [x or 1 for x in a[:64]]
        av = FV.from_ints(a)
        assert FV.to_ints(FV.inv(av)) == [pow(x, P - 2, P) for x in a]

    def test_canon_extremes(self):
        cases = [0, 1, P - 1, P, P + 1, 2**127, 2**128 - 1, 2**127 + 5]
        av = FV.from_ints(cases)
        assert FV.to_ints(FV.canon(av)) == [x % P for x in cases]

    def test_pow_u64(self, rand_pairs):
        a, _ = rand_pairs
        av = FV.from_ints(a[:32])
        e = 0xABCDEF0123
        assert FV.to_ints(FV.pow_u64(av, e)) == [pow(x, e, P) for x in a[:32]]

    def test_jax_matches_numpy(self, rand_pairs):
        import jax
        import jax.numpy as jnp

        a, b = rand_pairs
        av, bv = FV.from_ints(a), FV.from_ints(b)
        aj, bj = jnp.asarray(av), jnp.asarray(bv)

        @jax.jit
        def kernel(x, y):
            return FV.add(x, y), FV.mul(x, y), FV.inv(x)

        s, m, i = kernel(aj, bj)
        assert np.array_equal(np.asarray(s), FV.add(av, bv))
        assert np.array_equal(np.asarray(m), FV.mul(av, bv))
        assert np.array_equal(np.asarray(i), FV.inv(av))
