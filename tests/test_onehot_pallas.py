"""Fused one-hot noise kernel (crypto/onehot_pallas.py) vs the XLA
compare-select-sum stage it replaces (interpret mode; the compiled kernel
is verified bit-exact in-engine on the attached TPU)."""
import numpy as np


def test_onehot_kernel_matches_xla_stage():
    import jax.numpy as jnp

    from pvac_hfhe_cppbyv_tpu.crypto import onehot_pallas as OH

    E, D, mw = 256, 16, 128
    mbits = mw * 32
    rng = np.random.default_rng(41)
    # production invariant: taken values unique per edge (first-occurrence
    # take mask) — XOR == the XLA sum only under this
    nvals = np.stack(
        [rng.choice(mbits, D, replace=False) for _ in range(E)]
    ).astype(np.int32)
    ntake = rng.random((E, D)) < 0.85

    word = nvals // 32
    bit = (nvals % 32).astype(np.uint32)
    masks = np.where(ntake, np.uint32(1) << bit, np.uint32(0))

    got = np.asarray(OH.onehot_noise_words_interpret(
        jnp.asarray(word), jnp.asarray(masks), mw))

    want = np.zeros((E, mw), dtype=np.uint32)
    for n in range(E):
        for j in range(D):
            if ntake[n, j]:
                want[n, nvals[n, j] // 32] |= np.uint32(1) << (
                    np.uint32(nvals[n, j] % 32))
    assert (got == want).all()
