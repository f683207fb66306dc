#!/usr/bin/env python
"""Micro-profile of the engine sigma path: dispatch vs device compute."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pvac_jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pvac_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pvac_hfhe_cppbyv_tpu as pvac
from pvac_hfhe_cppbyv_tpu.parallel.engine import enable_device


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    log("device:", dev)
    prm = pvac.Params()
    pk, sk = pvac.keygen(prm)
    eng = enable_device(pk, sk, device=dev)

    rng = np.random.default_rng(3)

    def mkwords(E, n_layers=64):
        words = np.zeros((E, 7), dtype=np.uint64)
        words[:, 0] = pk.canon_tag
        lid = rng.integers(0, n_layers, size=E)
        trips = rng.integers(0, 1 << 63, size=(n_layers, 3), dtype=np.uint64)
        words[:, 1:4] = trips[lid]
        words[:, 4] = rng.integers(0, prm.B, size=E)
        words[:, 5] = rng.integers(0, 2, size=E)
        words[:, 6] = rng.integers(0, 1 << 63, size=E, dtype=np.uint64)
        return words

    for E in (1280, 2048, 4096, 8192, 16384):
        words = mkwords(E)
        # warm compile
        sig, fb = eng.sigma(words)
        jax.block_until_ready(sig)
        for rep in range(2):
            t0 = time.time()
            sig, fb = eng.sigma(words)
            t_disp = time.time() - t0
            jax.block_until_ready(sig)
            t_tot = time.time() - t0
            log(f"E={E:6d} rep{rep}: dispatch {t_disp*1e3:7.1f} ms, "
                f"total {t_tot*1e3:7.1f} ms, "
                f"{E/t_tot:8.0f} edges/s")


if __name__ == "__main__":
    main()
