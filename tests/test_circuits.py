"""Encrypted-computation circuits (models/circuits.py) against plaintext
mirrors — the reusable application layer over the batched ops (reference
shapes: examples/basic_usage.cpp sections on polynomials, linear combos,
fib/factorial, powers)."""
import pytest

import pvac_hfhe_cppbyv_tpu as pvac
from pvac_hfhe_cppbyv_tpu.core import field as F
from pvac_hfhe_cppbyv_tpu.models import circuits as C

P = F.P


@pytest.fixture(scope="module")
def keys(small_keys):
    return small_keys


def test_eval_polynomial(keys):
    pk, sk = keys
    coeffs = [7, 0, 3, 2]  # 7 + 3x^2 + 2x^3
    xv = 5
    x = pvac.enc_value(pk, sk, xv)
    out = C.eval_polynomial(pk, coeffs, x,
                            lambda v: pvac.enc_value(pk, sk, v))
    want = sum(c * xv ** i for i, c in enumerate(coeffs)) % P
    assert pvac.dec_value(pk, sk, out) == want


def test_linear_combination_and_matvec(keys):
    pk, sk = keys
    vals = [3, 1, 4, 1]
    cts = pvac.enc_value_batch(pk, sk, vals)
    ks = [10, 20, 30, 40]
    out = C.linear_combination(pk, cts, ks)
    assert pvac.dec_value(pk, sk, out) == \
        sum(v * k for v, k in zip(vals, ks)) % P
    rows = [[1, 2, 3, 4], [5, 0, 0, 1]]
    outs = C.matvec(pk, cts, rows)
    for row, o in zip(rows, outs):
        assert pvac.dec_value(pk, sk, o) == \
            sum(v * k for v, k in zip(vals, row)) % P


def test_chains(keys):
    pk, sk = keys
    assert pvac.dec_value(pk, sk, C.fibonacci_chain(pk, sk, 10)) == 55
    import math
    assert pvac.dec_value(pk, sk, C.factorial_chain(pk, sk, 7)) == \
        math.factorial(7)
    x = pvac.enc_value(pk, sk, 3)
    assert pvac.dec_value(pk, sk, C.power_chain(pk, x, 5)) == 3 ** 5 % P


def test_sum_chain_batched(keys):
    pk, sk = keys
    vals = list(range(1, 14))
    cts = pvac.enc_value_batch(pk, sk, vals)
    assert pvac.dec_value(pk, sk, C.sum_chain(pk, cts)) == sum(vals)


def test_dot_product(keys):
    pk, sk = keys
    xs_v = [2, 3, 5]
    ys_v = [7, 11, 13]
    xs = pvac.enc_value_batch(pk, sk, xs_v)
    ys = pvac.enc_value_batch(pk, sk, ys_v)
    out = C.dot_product(pk, xs, ys)
    assert pvac.dec_value(pk, sk, out) == \
        sum(a * b for a, b in zip(xs_v, ys_v)) % P


def test_mean_and_scaled_variance(keys):
    pk, sk = keys
    vals = [4, 8, 6, 2]
    n = len(vals)
    cts = pvac.enc_value_batch(pk, sk, vals)
    S, V = C.mean_and_scaled_variance(pk, cts)
    s = sum(vals)
    assert pvac.dec_value(pk, sk, S) == s % P
    want_v = (n * sum(v * v for v in vals) - s * s) % P
    assert pvac.dec_value(pk, sk, V) == want_v
    # sanity: n^2 * var relation on the plaintext side
    mean = s / n
    assert want_v == round(n * n * (sum((v - mean) ** 2 for v in vals) / n))
