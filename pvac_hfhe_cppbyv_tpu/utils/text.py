"""Text codec (reference: include/pvac/utils/text.hpp).

15-byte blocks pack into one field element each; enc_text = [enc(len)] +
per-block enc_fp_depth with increasing depth hints (text.hpp:39-61) — all
blocks share one PRF/σ batch here.
"""
from __future__ import annotations

import sys

from ..core import field as F
from ..ops.decrypt import dec_value
from ..ops.encrypt import enc_fp_depth_batch, enc_value
from ..types import Cipher, PubKey, SecKey


def pack_15_bytes_to_fp(data: bytes) -> int:
    """<= 15 bytes, little-endian (text.hpp:15-26)."""
    x = 0
    for i, b in enumerate(data[:15]):
        x |= b << (8 * i)
    return F.fp_from_words(x & ((1 << 64) - 1), x >> 64)


def unpack_fp_to_15_bytes(x: int) -> bytes:
    return bytes((x >> (8 * i)) & 0xFF for i in range(15))


def enc_text(pk: PubKey, sk: SecKey, msg: str | bytes) -> list[Cipher]:
    """enc(len) + one block cipher per 15 bytes (text.hpp:39-61)."""
    if isinstance(msg, str):
        msg = msg.encode()
    out = [enc_value(pk, sk, len(msg))]
    blocks = [msg[i : i + 15] for i in range(0, len(msg), 15)]
    if blocks:
        vals = [pack_15_bytes_to_fp(b) for b in blocks]
        hints = list(range(2, 2 + len(blocks)))
        out.extend(enc_fp_depth_batch(pk, sk, vals, hints))
    return out


def dec_text(pk: PubKey, sk: SecKey, cts: list[Cipher]) -> str:
    """Per-block decrypt + unpack + length clip (text.hpp:63-87)."""
    if not cts:
        return ""
    flen = dec_value(pk, sk, cts[0])
    if flen >> 64:
        print("text length hi != 0, clipping", file=sys.stderr)
    length = flen & ((1 << 64) - 1)
    buf = bytearray()
    for c in cts[1:]:
        buf += unpack_fp_to_15_bytes(dec_value(pk, sk, c))
    length = min(length, len(buf))
    return bytes(buf[:length]).decode(errors="replace")
