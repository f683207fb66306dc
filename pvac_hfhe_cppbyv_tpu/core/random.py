"""OS CSPRNG (reference: include/pvac/core/random.hpp:40-110).

Uses os.urandom (getrandom under the hood on Linux).  Little-endian u64
helpers mirror load_le64/store_le64 (random.hpp:26-38).
"""
from __future__ import annotations

import os
import struct


def csprng_bytes(n: int) -> bytes:
    return os.urandom(n)


def csprng_u64() -> int:
    return struct.unpack("<Q", os.urandom(8))[0]


def csprng_u64_array(n: int):
    """n CSPRNG u64s in one getrandom call (numpy uint64 array)."""
    import numpy as np

    return np.frombuffer(os.urandom(8 * n), dtype="<u8").copy()
