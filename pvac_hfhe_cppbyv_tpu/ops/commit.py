"""Ciphertext commitment (reference: include/pvac/ops/commit.hpp:12-87)."""
from __future__ import annotations

import hashlib
import struct

import numpy as np

from ..core.field import MASK63
from ..types import Cipher, Dom, PubKey, RRULE_BASE

U64MAX = (1 << 64) - 1


def commit_ct(pk: PubKey, C: Cipher) -> bytes:
    """SHA-256 over domain || H_digest || canon_tag || layers || edges."""
    h = hashlib.sha256()
    h.update(Dom.COMMIT.encode())
    h.update(pk.H_digest)
    h.update(struct.pack("<Q", pk.canon_tag & U64MAX))
    for L in C.layers:
        h.update(bytes([L.rule]))
        if L.rule == RRULE_BASE:
            h.update(struct.pack("<QQQ", L.seed.ztag & U64MAX,
                                 L.seed.nonce.lo & U64MAX,
                                 L.seed.nonce.hi & U64MAX))
        else:
            h.update(struct.pack("<QQ", L.pa, L.pb))
    nbytes = (pk.prm.m_bits + 7) // 8
    sig = np.asarray(C.sigma)
    for e in range(C.n_edges):
        h.update(struct.pack("<Q", int(C.layer_id[e])))
        h.update(struct.pack("<Q", int(C.idx[e])))
        h.update(bytes([int(C.ch[e])]))
        lo = int(C.w[e, 0]) | int(C.w[e, 1]) << 32
        hi = (int(C.w[e, 2]) | int(C.w[e, 3]) << 32) & MASK63
        h.update(struct.pack("<QQ", lo, hi))
        h.update(sig[e].astype("<u4").tobytes()[:nbytes])
    return h.digest()
