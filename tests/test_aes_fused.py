"""Fused Pallas AES tile kernel (crypto/aes_fused.py) vs the scalar
oracle, and the plane-major LPN contraction vs the transposed one.

The kernel itself runs in interpret mode here (the CPU suite cannot run
Mosaic); on the attached TPU the compiled kernel is verified bit-exact
against the XLA path by bench.py's decrypt asserts and the roofline row.
"""
import numpy as np
import pytest

from pvac_hfhe_cppbyv_tpu.crypto import aes, aesv


def test_fused_keystream_matches_oracle_interpret():
    import jax.numpy as jnp

    from pvac_hfhe_cppbyv_tpu.crypto import aes_fused

    rng = np.random.default_rng(31)
    N, nblocks = 128, 40  # one lane tile, G=2 -> G_pad=8
    keys = rng.integers(0, 256, size=(N, 32), dtype=np.uint8)
    nonces = rng.integers(0, 1 << 64, size=(N,), dtype=np.uint64)

    rk = aesv.expand_keys_bitsliced(keys)  # [15,16,8,N]
    nlo = (nonces & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    nhi = (nonces >> np.uint64(32)).astype(np.uint32)

    words = np.asarray(aes_fused.aes_ctr_keystream_fused(
        jnp.asarray(rk), jnp.asarray(nlo), jnp.asarray(nhi),
        nblocks, interpret=True,
    ))
    for n in range(0, N, 17):  # spot-check lanes (scalar oracle is slow)
        sc = aes.AesCtr256(bytes(keys[n]), int(nonces[n]))
        want = sc.fill_u64(2 * nblocks)
        got = []
        for b in range(nblocks):
            got.append(int(words[n, b, 0]) | int(words[n, b, 1]) << 32)
            got.append(int(words[n, b, 2]) | int(words[n, b, 3]) << 32)
        assert got == want, f"lane {n}"


def test_cores_from_streams_t_matches_transposed():
    """cores_from_streams_t (plane-major fused-kernel layout) is bit-exact
    with cores_from_streams on the same keystream, numpy backend."""
    from pvac_hfhe_cppbyv_tpu.crypto import lpn
    from pvac_hfhe_cppbyv_tpu.params import small_test_params

    prm = small_test_params()
    rng = np.random.default_rng(32)
    N = 8
    nblocks = lpn.n_ybits_blocks(prm)
    G_pad = ((nblocks + 31) // 32 + 7) // 8 * 8
    Bp = G_pad * 32
    words_t = rng.integers(0, 1 << 32, (4, Bp, N), dtype=np.uint64).astype(
        np.uint32)
    top_u = rng.integers(0, 1 << 32, (N, 2, 2), dtype=np.uint64).astype(
        np.uint32)
    s32 = rng.integers(0, 1 << 32, (2 * prm.s_words64,),
                       dtype=np.uint64).astype(np.uint32)

    # transposed view: u64 j of lane n -> lo words_t[2*(j&1), j>>1, n]
    u64s = np.zeros((N, 2 * nblocks, 2), dtype=np.uint32)
    for j in range(2 * nblocks):
        u64s[:, j, 0] = words_t[2 * (j & 1), j >> 1, :]
        u64s[:, j, 1] = words_t[2 * (j & 1) + 1, j >> 1, :]

    r_a, rej_a = lpn.cores_from_streams(u64s, top_u, s32, prm)
    r_b, rej_b = lpn.cores_from_streams_t(words_t, top_u, s32, prm)
    assert (r_a == r_b).all()
    assert (rej_a == rej_b).all()
