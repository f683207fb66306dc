"""SHA-256 / SHAKE256 / SHA-CTR stream tests vs reference vectors.

Mirrors tests/test_prf.cpp:11-51 (SHA-256 KAT, XOF determinism) and
cross-checks the vectorized lane implementations against
tests/golden/vectors.json.
"""
import hashlib
import struct

import numpy as np
import pytest

from pvac_hfhe_cppbyv_tpu.core import hash as H
from pvac_hfhe_cppbyv_tpu.crypto import shactr


def test_sha256_vectors(vectors):
    for case in vectors["sha256"]:
        if "msg" in case:
            assert H.sha256(case["msg"].encode()).hex() == case["digest"]
    big = bytes((i * 7 + 3) & 0xFF for i in range(1000))
    assert H.sha256(big).hex() == vectors["sha256"][-1]["digest"]


def test_sha256_lanes_vs_hashlib():
    # Vectorized compress on multi-block messages of the CTR shape.
    layout = H.MsgLayout(b"pvac.dom.x_seed", 8)
    rng = np.random.default_rng(42)
    L = 16
    fields64 = rng.integers(0, 1 << 64, size=(L, 8), dtype=np.uint64)
    fields = np.stack(
        [(fields64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
         (fields64 >> np.uint64(32)).astype(np.uint32)],
        axis=-1,
    )
    blocks = layout.build_blocks(fields)
    state = H.sha256_init_state((L,), np)
    for b in range(layout.n_blocks):
        state = H.sha256_compress(state, blocks[:, b, :])
    for i in range(L):
        msg = b"pvac.dom.x_seed" + b"".join(
            struct.pack("<Q", int(fields64[i, j])) for j in range(8)
        )
        want = hashlib.sha256(msg).digest()
        got = b"".join(struct.pack(">I", int(w)) for w in state[i])
        assert got == want

    # u64 extraction matches load_le64 of the digest buffer
    pairs = H.digest_words_to_le_u64_pairs(state)
    for i in range(2):
        msg = b"pvac.dom.x_seed" + b"".join(
            struct.pack("<Q", int(fields64[i, j])) for j in range(8)
        )
        d = hashlib.sha256(msg).digest()
        for j in range(4):
            want = struct.unpack_from("<Q", d, 8 * j)[0]
            got = int(pairs[i, j, 0]) | int(pairs[i, j, 1]) << 32
            assert got == want


def test_sha256_lanes_jax_matches_numpy():
    import jax.numpy as jnp

    layout = H.MsgLayout(b"UBK", 2)
    rng = np.random.default_rng(7)
    f64 = rng.integers(0, 1 << 64, size=(8, 2), dtype=np.uint64)
    fields = np.stack(
        [(f64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
         (f64 >> np.uint64(32)).astype(np.uint32)],
        axis=-1,
    )
    bn = layout.build_blocks(fields)
    bj = layout.build_blocks(jnp.asarray(fields))
    assert np.array_equal(bn, np.asarray(bj))
    sn = H.sha256_compress(H.sha256_init_state((8,), np), bn[:, 0, :])
    sj = H.sha256_compress(
        H.sha256_init_state((8,), jnp), jnp.asarray(bn[:, 0, :])
    )
    assert np.array_equal(sn, np.asarray(sj))


def test_xof_shake_vectors(vectors):
    v = vectors["xof_shake"]
    x = H.XofShake(v["label"], [int(s) for s in v["seed"]])
    for want in v["u64s"]:
        assert x.take_u64() == int(want)
    for want in v["bounded337"]:
        assert x.bounded(337) == int(want)


class TestCtrStream:
    def test_choose_k_scalar_vectors(self, vectors):
        for case in vectors["prg_choose_k"]:
            got = shactr.choose_k_scalar(
                case["k"], case["N"], case["label"], [int(w) for w in case["words"]]
            )
            assert got == case["out"]

    def test_stream_matches_scalar(self):
        words = [123, 456, 0xFFFFFFFFFFFFFFFF]
        sc = shactr.CtrStream("pvac.dom.h_gen", words)
        want = [sc.rnd() for _ in range(20)]
        lanes = np.zeros((1, 3, 2), dtype=np.uint32)
        for j, w in enumerate(words):
            lanes[0, j, 0] = w & 0xFFFFFFFF
            lanes[0, j, 1] = w >> 32
        got = shactr.stream_u64s("pvac.dom.h_gen", lanes, 20)
        got_ints = [int(got[0, t, 0]) | int(got[0, t, 1]) << 32 for t in range(20)]
        assert got_ints == want

    @pytest.mark.parametrize("k,N", [(128, 16384), (128, 8192), (192, 8192), (48, 512)])
    def test_choose_k_batch_matches_scalar(self, k, N):
        rng = np.random.default_rng(k * 31 + N)
        L = 8
        w64 = rng.integers(0, 1 << 64, size=(L, 5), dtype=np.uint64)
        lanes = np.stack(
            [(w64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
             (w64 >> np.uint64(32)).astype(np.uint32)],
            axis=-1,
        )
        out, fb = shactr.choose_k_batch(k, N, "pvac.dom.h_gen", lanes)
        assert not fb.any()
        for i in range(L):
            want = shactr.choose_k_scalar(k, N, "pvac.dom.h_gen", list(map(int, w64[i])))
            assert list(map(int, out[i])) == want

    def test_choose_k_batch_jax(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        w64 = rng.integers(0, 1 << 64, size=(4, 7), dtype=np.uint64)
        lanes = np.stack(
            [(w64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
             (w64 >> np.uint64(32)).astype(np.uint32)],
            axis=-1,
        )
        o1, f1 = shactr.choose_k_batch(128, 16384, "pvac.dom.x_seed", lanes)
        o2, f2 = shactr.choose_k_batch(128, 16384, "pvac.dom.x_seed", jnp.asarray(lanes))
        assert np.array_equal(o1, np.asarray(o2))
        assert np.array_equal(f1, np.asarray(f2))
