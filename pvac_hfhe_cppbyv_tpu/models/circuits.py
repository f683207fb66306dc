"""Encrypted-computation recipes (application layer).

Mirrors the homomorphic demo circuits of examples/basic_usage.cpp (25
sections: polynomials, linear combos, fib/factorial chains, powers with
growth control) as reusable helpers over the TPU-batched ops.
"""
from __future__ import annotations

from ..core import field as F
from ..ops.arithmetic import ct_add, ct_mul, ct_scale
from ..ops.encrypt import enc_value
from ..ops.recrypt import ct_recrypt
from ..types import Cipher, EvalKey, PubKey, SecKey


def eval_polynomial(pk: PubKey, coeffs: list[int], x: Cipher,
                    enc_const) -> Cipher:
    """Evaluate sum_i coeffs[i] * x^i homomorphically (Horner).

    ``enc_const(v)`` must return a fresh encryption of v (e.g.
    ``lambda v: enc_value(pk, sk, v)`` client-side, or evalkey-scaled
    enc_one server-side).
    """
    acc = enc_const(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        acc = ct_mul(pk, acc, x)
        if c:
            acc = ct_add(pk, acc, enc_const(c))
    return acc


def linear_combination(pk: PubKey, cts: list[Cipher], ks: list[int]) -> Cipher:
    """sum_i ks[i] * cts[i] (scalar weights)."""
    assert cts and len(cts) == len(ks)
    acc = ct_scale(pk, cts[0], ks[0])
    for c, k in zip(cts[1:], ks[1:]):
        acc = ct_add(pk, acc, ct_scale(pk, c, k))
    return acc


def fibonacci_chain(pk: PubKey, sk: SecKey, n: int) -> Cipher:
    """Encrypted F(n) by additive chaining (basic_usage fib section)."""
    a = enc_value(pk, sk, 0)
    b = enc_value(pk, sk, 1)
    for _ in range(n):
        a, b = b, ct_add(pk, a, b)
    return a


def factorial_chain(pk: PubKey, sk: SecKey, n: int) -> Cipher:
    """Encrypted n! by scalar-multiplying an encrypted 1."""
    acc = enc_value(pk, sk, 1)
    for k in range(2, n + 1):
        acc = ct_scale(pk, acc, k)
    return acc


def power_chain(pk: PubKey, x: Cipher, e: int,
                ek: EvalKey | None = None) -> Cipher:
    """x^e by square-and-multiply over ct_mul, with optional recrypt-based
    growth control after each squaring."""
    assert e >= 1
    bits = bin(e)[3:]  # after the leading 1
    acc = x
    for b in bits:
        acc = ct_mul(pk, acc, acc)
        if ek is not None:
            acc = ct_recrypt(pk, ek, acc)
        if b == "1":
            acc = ct_mul(pk, acc, x)
            if ek is not None:
                acc = ct_recrypt(pk, ek, acc)
    return acc


def sum_chain(pk: PubKey, cts: list[Cipher]) -> Cipher:
    """Balanced-tree sum of many ciphertexts (log-depth layer growth)."""
    assert cts
    layer = list(cts)
    while len(layer) > 1:
        nxt = []
        for i in range(0, len(layer) - 1, 2):
            nxt.append(ct_add(pk, layer[i], layer[i + 1]))
        if len(layer) % 2:
            nxt.append(layer[-1])
        layer = nxt
    return layer[0]
