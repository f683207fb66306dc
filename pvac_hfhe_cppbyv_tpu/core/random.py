"""OS CSPRNG (reference: include/pvac/core/random.hpp:40-110).

Uses os.urandom (getrandom under the hood on Linux).  Little-endian u64
helpers mirror load_le64/store_le64 (random.hpp:26-38).

Small draws are served from a refilling block buffer: the reference
calls getrandom() per draw, which is fine from C++ but costs ~1.5 us of
syscall + FFI overhead per u64 from Python — at ~25 scalar draws per
encryption plan that overhead alone was ~40 ms of a warm 512-value
batch.  Buffering changes nothing cryptographically (same OS entropy,
fetched in blocks); bulk helpers keep their single-getrandom path.
"""
from __future__ import annotations

import os
import struct

_BUF = b""
_OFF = 0
_PID = -1
_BLOCK = 1 << 16


def _take(n: int) -> bytes:
    global _BUF, _OFF, _PID
    pid = os.getpid()
    if _OFF + n > len(_BUF) or pid != _PID:
        # refill; the pid check discards the buffer in forked children so
        # two processes never serve the same entropy block
        _BUF = os.urandom(_BLOCK)
        _OFF = 0
        _PID = pid
    out = _BUF[_OFF : _OFF + n]
    _OFF += n
    return out


def csprng_bytes(n: int) -> bytes:
    if n >= 4096:
        return os.urandom(n)
    return _take(n)


def csprng_u64() -> int:
    return struct.unpack("<Q", _take(8))[0]


def csprng_u64_array(n: int):
    """n CSPRNG u64s in one getrandom call (numpy uint64 array)."""
    import numpy as np

    return np.frombuffer(os.urandom(8 * n), dtype="<u8").copy()
