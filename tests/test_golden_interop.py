"""Golden interop: decode reference-generated ciphertexts bit-exactly.

The fixtures in tests/golden/{small,default} were produced by the unmodified
C++ reference (tools/refharness/gen_golden.cpp): keys, ciphertexts of known
values, homomorphic results, recrypt output, and an encrypted text.  This is
the strongest cross-implementation check available: our PRF/decrypt pipeline
must reproduce the reference's secret blinding factors exactly.
"""
import json
import subprocess
import pathlib

import numpy as np
import pytest

import pvac_hfhe_cppbyv_tpu as pvac

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load(golden):
    pk = pvac.load_pklite(str(golden / "pklite.bin"))
    sk = pvac.load_sk(str(golden / "sk.bin"))
    with open(golden / "expected.json") as f:
        exp = json.load(f)
    return pk, sk, exp


def _dec_file(pk, sk, path):
    cts = pvac.load_cts(str(path))
    return [pvac.dec_value(pk, sk, c) for c in cts]


@pytest.mark.parametrize("which", ["small", "default"])
def test_decrypt_golden(which, golden_small, golden_default):
    golden = golden_small if which == "small" else golden_default
    pk, sk, exp = _load(golden)
    for name in ["a", "b", "sum", "diff", "prod", "scale1000", "zero", "recrypt_sum"]:
        got = _dec_file(pk, sk, golden / f"{name}.ct")
        assert got == [exp[name]], name


@pytest.mark.parametrize("which", ["small", "default"])
def test_decrypt_golden_text(which, golden_small, golden_default):
    golden = golden_small if which == "small" else golden_default
    pk, sk, exp = _load(golden)
    cts = pvac.load_cts(str(golden / "text.ct"))
    assert pvac.dec_text(pk, sk, cts) == exp["text"]


@pytest.mark.parametrize("which", ["small", "default"])
def test_ct_roundtrip_byte_exact(which, golden_small, golden_default, tmp_path):
    golden = golden_small if which == "small" else golden_default
    for name in ["a.ct", "sum.ct", "text.ct"]:
        src = golden / name
        cts = pvac.load_cts(str(src))
        out = tmp_path / name
        pvac.save_cts(cts, str(out))
        assert out.read_bytes() == src.read_bytes(), name


def test_sk_pklite_roundtrip(golden_small, tmp_path):
    sk = pvac.load_sk(str(golden_small / "sk.bin"))
    pvac.save_sk(sk, str(tmp_path / "sk.bin"))
    assert (tmp_path / "sk.bin").read_bytes() == (golden_small / "sk.bin").read_bytes()
    pk = pvac.load_pklite(str(golden_small / "pklite.bin"))
    pvac.save_pklite(pk, str(tmp_path / "pklite.bin"))
    assert (tmp_path / "pklite.bin").read_bytes() == (
        golden_small / "pklite.bin"
    ).read_bytes()


def test_homomorphic_ops_on_golden_small(golden_small):
    """Apply OUR homomorphic ops to reference ciphertexts and decrypt."""
    pk, sk, exp = _load(golden_small)
    a = pvac.load_cts(str(golden_small / "a.ct"))[0]
    b = pvac.load_cts(str(golden_small / "b.ct"))[0]
    assert pvac.dec_value(pk, sk, pvac.ct_add(pk, a, b)) == exp["sum"]
    assert pvac.dec_value(pk, sk, pvac.ct_sub(pk, a, b)) == exp["diff"]
    assert pvac.dec_value(pk, sk, pvac.ct_scale(pk, a, 1000)) == exp["scale1000"]
    # ct_mul needs H for fresh σ
    pk_full = pvac.load_pklite(str(golden_small / "pklite.bin"), with_H=True)
    prod = pvac.ct_mul(pk_full, a, b)
    assert pvac.dec_value(pk_full, sk, prod) == exp["prod"]


@pytest.fixture(scope="module")
def refdec():
    path = REPO / "build" / "refdec"
    if not path.exists():
        path.parent.mkdir(parents=True, exist_ok=True)
        src = REPO / "tools" / "refharness" / "refdec.cpp"
        try:
            subprocess.run(
                ["g++", "-std=c++17", "-O2", "-march=native",
                 "-I/root/reference/include", "-I", str(REPO / "tools" / "refharness"),
                 "-o", str(path), str(src)],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("reference toolchain unavailable")
    return path


def test_reverse_interop_our_enc_reference_dec(golden_small, tmp_path, refdec):
    """Ciphertexts encrypted by THIS framework decrypt correctly under the
    original C++ reference implementation."""
    pk = pvac.load_pklite(str(golden_small / "pklite.bin"), with_H=True)
    sk = pvac.load_sk(str(golden_small / "sk.bin"))
    c1 = pvac.enc_value(pk, sk, 123456)
    c2 = pvac.enc_value(pk, sk, 1)
    csum = pvac.ct_add(pk, c1, c2)
    cprod = pvac.ct_mul(pk, c1, c2)
    pvac.save_cts([c1, c2, csum, cprod], str(tmp_path / "ours.ct"))
    raw = subprocess.run(
        [str(refdec), str(golden_small / "pklite.bin"),
         str(golden_small / "sk.bin"), str(tmp_path / "ours.ct")],
        check=True, capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "PVAC_DBG": "0"},
    ).stdout
    # skip any autotuner debug lines; keep "<lo> <hi>" pairs
    out = [
        l.split() for l in raw.splitlines()
        if l and l.split()[0].isdigit()
    ]
    vals = [int(l[0]) for l in out]
    his = [int(l[1]) for l in out]
    assert vals == [123456, 1, 123457, 123456]
    assert his == [0, 0, 0, 0]
