#!/usr/bin/env python
"""Standalone native-runtime selftest (no jax import — runnable under
ASan/UBSan via `make sanitize`).

Exercises every pvacnative entry point against pure-Python oracles and the
golden fixtures.
"""
import pathlib
import struct
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pvac_hfhe_cppbyv_tpu import native
from pvac_hfhe_cppbyv_tpu.crypto import aes, shactr
from pvac_hfhe_cppbyv_tpu.core import field as F
from pvac_hfhe_cppbyv_tpu.core import fieldv as FV
from pvac_hfhe_cppbyv_tpu.core import hash as H

GOLD = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"


def main():
    L = native.lib()
    assert L is not None, "native lib failed to build"
    rng = np.random.default_rng(0xA5)

    # AES-CTR vs scalar oracle
    keys = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    nn = rng.integers(0, 1 << 63, size=(4,), dtype=np.uint64)
    ks = native.aes256_ctr(keys, nn, 12)
    for i in range(4):
        sc = aes.AesCtr256(bytes(keys[i]), int(nn[i]))
        assert list(map(int, ks[i])) == sc.fill_u64(24)
    print("aes256_ctr ok")

    # choose_k vs scalar
    w = rng.integers(0, 1 << 63, size=(3, 7), dtype=np.uint64)
    for k, N in ((128, 16384), (32, 512), (192, 8192)):
        out = native.choose_k(b"pvac.dom.x_seed", w, k, N)
        for i in range(3):
            assert list(map(int, out[i])) == shactr.choose_k_scalar(
                k, N, "pvac.dom.x_seed", list(map(int, w[i])))
    print("choose_k ok")

    # keyexp packed
    from pvac_hfhe_cppbyv_tpu.crypto.aesv import (
        _expand_schedule, rk_masks_from_packed,
    )
    kk = rng.integers(0, 256, size=(5, 32), dtype=np.uint8)
    a = rk_masks_from_packed(native.expand_keys_packed(kk), 5)
    b = rk_masks_from_packed(_expand_schedule(kk), 5)
    assert np.array_equal(a, b)
    print("expand_keys_packed ok")

    # reductions
    vals = [int(rng.integers(0, 2**62)) * (2**64) + int(rng.integers(0, 2**62))
            for _ in range(64)]
    vals = [v % F.P for v in vals]
    limbs = FV.from_ints(vals)
    bucket = rng.integers(0, 5, size=64).astype(np.int64)
    out = native.bucket_reduce_modp(limbs, bucket, 5)
    for bkt in range(5):
        want = sum(v for v, bb in zip(vals, bucket) if bb == bkt) % F.P
        assert FV.to_ints(out[bkt:bkt + 1])[0] == want
    acc = limbs.astype(np.uint64) * 7
    red = native.reduce_u64_limbs(acc)
    for i, v in enumerate(vals):
        assert FV.to_ints(red[i:i + 1])[0] == (7 * v) % F.P
    print("mod-p reductions ok")

    # sha256
    buf = bytes(range(200))
    import ctypes
    out32 = np.zeros(32, dtype=np.uint8)
    arr = np.frombuffer(buf, dtype=np.uint8)
    L.pvacn_sha256(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                   len(buf), out32.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert bytes(out32) == H.sha256(buf)
    print("sha256 ok")

    # ct codec byte-exact against golden artifacts
    for p in (GOLD / "bounty2" / "a.ct", GOLD / "small" / "prod.ct"):
        data = p.read_bytes()
        count = struct.unpack_from("<Q", data, 8)[0]
        dec = native.ct_decode_all(data, count)
        assert dec is not None
        parts = [data[:16]]
        for d in dec:
            parts.append(native.ct_encode_one(
                d["layers"], d["lid"], d["idx"], d["ch"], d["w"],
                d["sigma"], d["nbits"]))
        assert b"".join(parts) == data, p
    print("ct codec ok")
    print("NATIVE SELFTEST PASS")


if __name__ == "__main__":
    main()
