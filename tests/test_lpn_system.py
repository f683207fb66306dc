"""LPN system tests (port of tests/test_lpn.cpp / test_sigma_lpn.cpp cores).

- a noiseless linear system built from the PRF's AES-CTR sample rows is
  solvable by GF(2) Gaussian elimination and recovers the secret;
- the real (Ber(1/8)-noised) system is inconsistent (elimination finds
  contradictions / wrong secret);
- noise-rate z-test on the generated error bits.
"""
import numpy as np
import pytest

from pvac_hfhe_cppbyv_tpu.crypto import aes, lpn
from pvac_hfhe_cppbyv_tpu.params import small_test_params
from pvac_hfhe_cppbyv_tpu.types import Dom, Nonce128, PubKey, RSeed, SecKey
from pvac_hfhe_cppbyv_tpu.params import Params


def _unpack_bits(words64, nbits):
    out = np.zeros(nbits, dtype=np.uint8)
    for i in range(nbits):
        out[i] = (words64[i // 64] >> (i % 64)) & 1
    return out


def _gauss_solve_gf2(A, b):
    """Solve A x = b over GF(2); returns x or None if inconsistent."""
    A = A.copy().astype(np.uint8)
    b = b.copy().astype(np.uint8)
    rows, cols = A.shape
    pivots = []
    r = 0
    for c in range(cols):
        piv = None
        for rr in range(r, rows):
            if A[rr, c]:
                piv = rr
                break
        if piv is None:
            return None  # underdetermined for our full-rank use
        A[[r, piv]] = A[[piv, r]]
        b[[r, piv]] = b[[piv, r]]
        mask = A[:, c].copy()
        mask[r] = 0
        A[mask == 1] ^= A[r]
        b[mask == 1] ^= b[r]
        pivots.append(c)
        r += 1
        if r == rows:
            break
    x = np.zeros(cols, dtype=np.uint8)
    for i, c in enumerate(pivots):
        x[c] = b[i]
    # consistency of remaining rows
    if ((A[r:] @ x) % 2 != b[r:]).any():
        return None
    return x


@pytest.fixture(scope="module")
def lpn_setup():
    prm = Params(m_bits=512, n_bits=1024, h_col_wt=48, x_col_wt=32,
                 err_wt=32, lpn_n=64, lpn_t=256)
    rng = np.random.default_rng(42)
    sk = SecKey(
        prf_k=[int(x) for x in rng.integers(0, 1 << 63, 4)],
        lpn_s_bits=[int(rng.integers(0, 1 << 63))],
    )
    pk = PubKey(prm=prm, canon_tag=123, H=None, ubk=None,
                H_digest=bytes(range(32)), omega_B=0, powg_B=[])
    seed = RSeed(7, Nonce128(8, 9))
    return pk, sk, seed


def _sample_rows(pk, sk, seed, n_rows):
    """Regenerate the AES-CTR sample rows a_r and error bits e_r exactly as
    lpn_make_ybits consumes them."""
    key, nonce = lpn.derive_aes_key(pk, sk, seed, Dom.PRF_R1)
    prg = aes.AesCtr256(key, nonce)
    sw = pk.prm.s_words64
    rows = []
    errs = []
    for _ in range(n_rows):
        row = prg.fill_u64(sw)
        rows.append(_unpack_bits(row, pk.prm.lpn_n))
        errs.append(1 if prg.bounded(pk.prm.lpn_tau_den) < pk.prm.lpn_tau_num else 0)
    return np.array(rows), np.array(errs)


def test_noiseless_system_recovers_secret(lpn_setup):
    pk, sk, seed = lpn_setup
    n = pk.prm.lpn_n
    A, _ = _sample_rows(pk, sk, seed, 2 * n)
    s_bits = _unpack_bits(sk.lpn_s_bits, n)
    b = (A @ s_bits) % 2  # noiseless
    x = _gauss_solve_gf2(A, b)
    assert x is not None and np.array_equal(x, s_bits)


def test_noisy_system_unsolvable(lpn_setup):
    pk, sk, seed = lpn_setup
    n = pk.prm.lpn_n
    A, e = _sample_rows(pk, sk, seed, 2 * n)
    assert e.sum() > 0  # tau=1/8 over 128 rows: noise present
    s_bits = _unpack_bits(sk.lpn_s_bits, n)
    b = ((A @ s_bits) % 2) ^ e
    x = _gauss_solve_gf2(A, b)
    # elimination either detects inconsistency or recovers a wrong secret
    assert x is None or not np.array_equal(x, s_bits)


def test_noise_rate_ztest(lpn_setup):
    pk, sk, seed = lpn_setup
    _, e = _sample_rows(pk, sk, seed, 2048)
    tau = pk.prm.lpn_tau_num / pk.prm.lpn_tau_den
    z = (e.mean() - tau) / np.sqrt(tau * (1 - tau) / len(e))
    assert abs(z) < 6  # |z| < 6 as in test_lpn.cpp:144-217
