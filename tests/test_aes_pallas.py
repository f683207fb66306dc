"""Pallas AES keystream kernel vs the scalar oracle (interpret mode on CPU;
the same kernel compiles for TPU via Mosaic)."""
import numpy as np
import pytest

from pvac_hfhe_cppbyv_tpu.crypto import aes, aesv


def test_pallas_keystream_matches_oracle():
    import jax.numpy as jnp

    from pvac_hfhe_cppbyv_tpu.crypto import aes_pallas

    rng = np.random.default_rng(21)
    N, nblocks = 3, 40
    keys = rng.integers(0, 256, size=(N, 32), dtype=np.uint8)
    nonces = rng.integers(0, 1 << 64, size=(N,), dtype=np.uint64)

    rk = aesv.expand_keys_bitsliced(keys)  # [15,16,8,N]
    rk_lanes = np.ascontiguousarray(np.moveaxis(rk, -1, 0))  # [N,15,16,8]
    nlo = (nonces & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    nhi = (nonces >> np.uint64(32)).astype(np.uint32)

    words = aes_pallas.aes_ctr_keystream_pallas(
        jnp.asarray(rk_lanes), jnp.asarray(nlo), jnp.asarray(nhi),
        nblocks, interpret=True,
    )
    words = np.asarray(words)
    for n in range(N):
        sc = aes.AesCtr256(bytes(keys[n]), int(nonces[n]))
        want = sc.fill_u64(2 * nblocks)
        got = []
        for b in range(nblocks):
            got.append(int(words[n, b, 0]) | int(words[n, b, 1]) << 32)
            got.append(int(words[n, b, 2]) | int(words[n, b, 3]) << 32)
        assert got == want, f"lane {n}"
