"""PRF-R pipeline tests vs reference vectors.

Mirrors tests/test_prf.cpp / test_prf_ext.cpp (domain separation, values)
using exact reference-generated vectors for a synthetic key set.
"""
import numpy as np
import pytest

from pvac_hfhe_cppbyv_tpu.core import fieldv as FV
from pvac_hfhe_cppbyv_tpu.params import Params
from pvac_hfhe_cppbyv_tpu.types import Dom, Nonce128, PubKey, RSeed, SecKey
from pvac_hfhe_cppbyv_tpu.crypto import lpn


@pytest.fixture(scope="module")
def synth(vectors):
    pi = vectors["prf_inputs"]
    sk = SecKey(
        prf_k=[int(x) for x in pi["prf_k"]],
        lpn_s_bits=[int(x) for x in pi["lpn_s_bits"]],
    )
    pk = PubKey(
        prm=Params(),
        canon_tag=int(pi["canon_tag"]),
        H=None,
        ubk=None,
        H_digest=bytes.fromhex(pi["H_digest"]),
        omega_B=0,
        powg_B=[],
    )
    seed = RSeed(
        ztag=int(pi["ztag"]),
        nonce=Nonce128(int(pi["nonce_lo"]), int(pi["nonce_hi"])),
    )
    return pk, sk, seed


def test_fnv1a(vectors):
    for dom, want in vectors["fnv1a"].items():
        assert lpn.fnv1a_domain(dom) == int(want)


def test_derive_aes_key(vectors, synth):
    pk, sk, seed = synth
    for case in vectors["derive_aes_key"]:
        key, nonce = lpn.derive_aes_key(pk, sk, seed, case["dom"])
        assert key.hex() == case["key"]
        assert nonce == int(case["nonce"])


def test_derive_keys_batch(vectors, synth):
    pk, sk, seed = synth
    doms = [c["dom"] for c in vectors["derive_aes_key"]]
    seeds = np.tile(
        np.array([[seed.ztag, seed.nonce.lo, seed.nonce.hi]], dtype=np.uint64),
        (len(doms), 1),
    )
    dh = np.array([lpn.fnv1a_domain(d) for d in doms], dtype=np.uint64)
    keys, nonces = lpn.derive_keys_batch(pk, sk, seeds, dh)
    for i, case in enumerate(vectors["derive_aes_key"]):
        assert bytes(keys[i]).hex() == case["key"]
        assert int(nonces[i]) == int(case["nonce"])


def test_derive_keys_xp_matches_host(vectors, synth):
    """The device-side derivation (derive_keys_xp, the default on
    accelerator engines) is bit-identical to derive_keys_batch, including
    the Toeplitz-domain key/nonce construction mirrored from
    engine.prf_program's derive mode."""
    pk, sk, seed = synth
    rng = np.random.default_rng(23)
    N = 16
    seeds = rng.integers(0, 1 << 63, size=(N, 3), dtype=np.uint64)
    dh = rng.integers(0, 1 << 63, size=(N,), dtype=np.uint64)
    want_keys, want_nonces = lpn.derive_keys_batch(pk, sk, seeds, dh)
    tkeys, tbase = lpn.derive_keys_batch(
        pk, sk, seeds, np.full(N, lpn.DOM_HASH[Dom.TOEP], dtype=np.uint64))
    want_tnonces = tbase ^ dh

    layout = lpn.derive_layout(pk, sk)
    tmpl = layout.template_words()
    f3 = np.zeros((N, 3, 2), dtype=np.uint32)
    f3[:, :, 0] = (seeds & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    f3[:, :, 1] = (seeds >> np.uint64(32)).astype(np.uint32)
    dh2 = np.stack(
        [(dh & np.uint64(0xFFFFFFFF)).astype(np.uint32),
         (dh >> np.uint64(32)).astype(np.uint32)], axis=-1)
    f_main = np.concatenate([f3, dh2[:, None, :]], axis=1)
    got = lpn.derive_keys_xp(layout, tmpl, f_main)
    assert np.array_equal(got, want_keys)
    TOEP = lpn.DOM_HASH[Dom.TOEP]
    tc = np.array([TOEP & 0xFFFFFFFF, TOEP >> 32], dtype=np.uint32)
    f_toep = np.concatenate(
        [f3, np.broadcast_to(tc[None, None, :], (N, 1, 2))], axis=1)
    got_t = lpn.derive_keys_xp(layout, tmpl, f_toep)
    assert np.array_equal(got_t, tkeys)
    # nonce reconstruction as the device program computes it
    nlo = dh2[:, 0] ^ f3[:, 1, 0]
    nhi = dh2[:, 1] ^ f3[:, 1, 1]
    got_n = nlo.astype(np.uint64) | (nhi.astype(np.uint64) << np.uint64(32))
    assert np.array_equal(got_n, want_nonces)
    tnlo = tc[0] ^ f3[:, 1, 0] ^ dh2[:, 0]
    tnhi = tc[1] ^ f3[:, 1, 1] ^ dh2[:, 1]
    got_tn = tnlo.astype(np.uint64) | (tnhi.astype(np.uint64) << np.uint64(32))
    assert np.array_equal(got_tn, want_tnonces)


def test_lpn_ybits_first_words(vectors, synth):
    pk, sk, seed = synth
    yb = lpn.lpn_make_ybits(pk, sk, seed, Dom.PRF_R1, n_rows=128)
    want = [int(x) for x in vectors["lpn_ybits_r1_first2w"]]
    assert yb[0] == want[0]
    assert yb[1] == want[1]


def test_prf_R_core_and_products(vectors, synth):
    pk, sk, seed = synth

    def fp(words):
        return int(words[0]) | int(words[1]) << 64

    assert lpn.prf_R_core(pk, sk, seed, Dom.PRF_R1) == fp(vectors["prf_R_core_r1"])
    assert lpn.prf_R_core(pk, sk, seed, Dom.PRF_R2) == fp(vectors["prf_R_core_r2"])
    assert lpn.prf_R(pk, sk, seed) == fp(vectors["prf_R"])
    assert lpn.prf_R_noise(pk, sk, seed) == fp(vectors["prf_R_noise"])


def test_prf_R_batch(vectors, synth):
    pk, sk, seed = synth
    seeds = np.array(
        [[seed.ztag, seed.nonce.lo, seed.nonce.hi]] * 2, dtype=np.uint64
    )
    out = lpn.prf_R_batch(pk, sk, seeds)
    vals = FV.to_ints(out)
    want = int(vectors["prf_R"][0]) | int(vectors["prf_R"][1]) << 64
    assert vals == [want, want]
