"""CLI smoke test (keygen/enc/dec/add/inspect round trip)."""
import os
import subprocess
import sys

import pytest


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(os.path.dirname(os.path.dirname(__file__)))
    return subprocess.run(
        [sys.executable, "-m", "pvac_hfhe_cppbyv_tpu", *args],
        cwd=cwd, env=env, capture_output=True, text=True, check=True,
    ).stdout


def test_cli_flow(tmp_path):
    _run(["keygen", "keys", "--small"], tmp_path)
    _run(["enc", "keys", "11", "31", "-o", "v.ct"], tmp_path)
    out = _run(["dec", "keys", "v.ct"], tmp_path)
    assert out.split() == ["11", "0", "31", "0"]
    _run(["add", "keys", "v.ct", "v.ct", "-o", "s.ct"], tmp_path)
    assert _run(["dec", "keys", "s.ct"], tmp_path).split()[:2] == ["22", "0"]
    info = _run(["inspect", "v.ct"], tmp_path)
    assert "2 cipher(s)" in info
