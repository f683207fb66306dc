"""Client / evaluator role separation.

The reference's deployment story (README example) is: the *client* holds sk
and encrypts/decrypts; the *server* (evaluator) holds only pk (+ optional
EvalKey) and computes on ciphertexts.  These thin wrappers make the split
explicit and keep batching + device routing in one place.
"""
from __future__ import annotations

from . import (
    Params, ct_add, ct_div_const, ct_mul, ct_mul_batch, ct_neg, ct_recrypt,
    ct_scale, ct_sub, dec_text, dec_value, dec_value_batch, enc_text,
    enc_value, enc_value_batch, keygen, make_evalkey,
)
from .types import Cipher, EvalKey, PubKey, SecKey


class Client:
    """Holds the secret key; encrypts and decrypts."""

    def __init__(self, pk: PubKey, sk: SecKey):
        self.pk = pk
        self.sk = sk

    @classmethod
    def generate(cls, prm: Params | None = None, device=None) -> "Client":
        pk, sk = keygen(prm or Params())
        if device is not None:
            from .parallel.engine import enable_device

            enable_device(pk, sk, device=device)
        return cls(pk, sk)

    def encrypt(self, values) -> list[Cipher]:
        if isinstance(values, int):
            return enc_value_batch(self.pk, self.sk, [values])
        return enc_value_batch(self.pk, self.sk, list(values))

    def decrypt(self, cts) -> list[int]:
        if isinstance(cts, Cipher):
            cts = [cts]
        return dec_value_batch(self.pk, self.sk, cts)

    def encrypt_text(self, msg: str) -> list[Cipher]:
        return enc_text(self.pk, self.sk, msg)

    def decrypt_text(self, cts) -> str:
        return dec_text(self.pk, self.sk, cts)

    def evaluation_key(self, pool_size: int = 8, depth_hint: int = 0) -> EvalKey:
        return make_evalkey(self.pk, self.sk, pool_size, depth_hint)

    def evaluator(self, ek: EvalKey | None = None) -> "Evaluator":
        return Evaluator(self.pk, ek)


class Evaluator:
    """Holds only public material; computes on ciphertexts."""

    def __init__(self, pk: PubKey, ek: EvalKey | None = None):
        self.pk = pk
        self.ek = ek

    def add(self, a: Cipher, b: Cipher) -> Cipher:
        return ct_add(self.pk, a, b)

    def sub(self, a: Cipher, b: Cipher) -> Cipher:
        return ct_sub(self.pk, a, b)

    def neg(self, a: Cipher) -> Cipher:
        return ct_neg(self.pk, a)

    def mul(self, a: Cipher, b: Cipher) -> Cipher:
        return ct_mul(self.pk, a, b)

    def mul_batch(self, pairs) -> list[Cipher]:
        return ct_mul_batch(self.pk, list(pairs))

    def scale(self, a: Cipher, k: int) -> Cipher:
        return ct_scale(self.pk, a, k)

    def div_const(self, a: Cipher, k: int) -> Cipher:
        return ct_div_const(self.pk, a, k)

    def recrypt(self, a: Cipher) -> Cipher:
        if self.ek is None:
            raise ValueError("evaluator has no EvalKey")
        return ct_recrypt(self.pk, self.ek, a)
