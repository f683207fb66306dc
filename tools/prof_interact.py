#!/usr/bin/env python
"""Reproduce the enc-path interaction: prf_cores_async then sigma."""
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

    def mkprf(N):
        keys = rng.integers(0, 256, size=(N, 32), dtype=np.uint8)
        tkeys = rng.integers(0, 256, size=(N, 32), dtype=np.uint8)
        nonces = rng.integers(0, 1 << 63, size=N, dtype=np.uint64)
        tnonces = rng.integers(0, 1 << 63, size=N, dtype=np.uint64)
        return keys, nonces, tkeys, tnonces

    E, N = 1264, 960
    # warm both programs
    w = mkwords(E)
    sig, fb = eng.sigma(w)
    jax.block_until_ready(sig)
    r, rej = eng.prf_cores_async(*mkprf(N))
    jax.block_until_ready(r)

    for rep in range(3):
        k, n, tk, tn = mkprf(N)
        w = mkwords(E)
        t0 = time.time()
        r, rej = eng.prf_cores_async(k, n, tk, tn)
        t1 = time.time()
        sig, fb = eng.sigma(w)
        t2 = time.time()
        rr = np.asarray(r)
        t3 = time.time()
        ss = np.asarray(sig)
        ff = np.asarray(fb)
        t4 = time.time()
        log(f"rep{rep}: prf disp {1e3*(t1-t0):7.1f} | sigma disp "
            f"{1e3*(t2-t1):7.1f} | prf fetch {1e3*(t3-t2):7.1f} | "
            f"sigma fetch {1e3*(t4-t3):7.1f} ms")

    # now sigma alone with fresh words each rep
    for rep in range(2):
        w = mkwords(E)
        t0 = time.time()
        sig, fb = eng.sigma(w)
        t1 = time.time()
        ss = np.asarray(sig)
        t2 = time.time()
        log(f"sigma-only rep{rep}: disp {1e3*(t1-t0):7.1f} | fetch "
            f"{1e3*(t2-t1):7.1f} ms")

    # prf alone
    for rep in range(2):
        k, n, tk, tn = mkprf(N)
        t0 = time.time()
        r, rej = eng.prf_cores_async(k, n, tk, tn)
        t1 = time.time()
        rr = np.asarray(r)
        t2 = time.time()
        log(f"prf-only rep{rep}: disp {1e3*(t1-t0):7.1f} | fetch "
            f"{1e3*(t2-t1):7.1f} ms")


if __name__ == "__main__":
    main()
