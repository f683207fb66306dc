#!/usr/bin/env python
"""Micro-profile of the prf_R-core device program: XLA vs Pallas AES paths.

Reports per-stage device time (AES keystream, LPN contraction, full core)
and derived AES blocks/s — the roofline input for the PRF pipeline.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pvac_jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pvac_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pvac_hfhe_cppbyv_tpu as pvac
from pvac_hfhe_cppbyv_tpu.crypto import aesv, lpn
from pvac_hfhe_cppbyv_tpu.parallel.engine import prf_program


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, args, reps=3, warm=1):
    for _ in range(warm):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    dev = jax.devices()[0]
    log("device:", dev)
    prm = pvac.Params()
    nblocks = lpn.n_ybits_blocks(prm)
    log(f"nblocks/core = {nblocks}")

    rng = np.random.default_rng(7)
    for N in (256, 1024):
        keys = rng.integers(0, 256, size=(N, 32), dtype=np.uint8)
        tkeys = rng.integers(0, 256, size=(N, 32), dtype=np.uint8)
        rk = aesv.expand_keys_packed(keys)
        trk = aesv.expand_keys_packed(tkeys)
        nonces = rng.integers(0, 1 << 63, size=N, dtype=np.uint64)
        tnonces = rng.integers(0, 1 << 63, size=N, dtype=np.uint64)
        nlo = (nonces & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        nhi = (nonces >> np.uint64(32)).astype(np.uint32)
        tnlo = (tnonces & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        tnhi = (tnonces >> np.uint64(32)).astype(np.uint32)
        s32 = rng.integers(0, 1 << 32, size=2 * prm.s_words64,
                           dtype=np.uint64).astype(np.uint32)
        args = (rk, nlo, nhi, trk, tnlo, tnhi, s32)

        # full program, XLA vs Pallas AES
        for tag, up in (("xla", False), ("pallas", True)):
            try:
                fn = jax.jit(prf_program(prm, N, use_pallas=up), device=dev)
                dt = bench(fn, args)
                blk = N * (nblocks + 1)
                log(f"N={N:5d} prf [{tag:6}]: {dt*1e3:8.1f} ms  "
                    f"{N/dt:7.0f} cores/s  {blk/dt/1e6:6.2f} M AES blk/s")
            except Exception as ex:
                log(f"N={N:5d} prf [{tag:6}]: FAILED {type(ex).__name__}: {ex}")

        # AES keystream alone, XLA path
        def ks_xla(rk_packed, nlo, nhi):
            rkm = aesv.rk_masks_from_packed(rk_packed, N)
            planes = aesv.counters_to_planes(nlo, nhi, nblocks)
            out = aesv.encrypt_planes(rkm, planes)
            return aesv.planes_to_words(out, nblocks)

        fn = jax.jit(ks_xla, device=dev)
        dt = bench(fn, (rk, nlo, nhi))
        blk = N * nblocks
        log(f"N={N:5d} keystream [xla   ]: {dt*1e3:8.1f} ms  "
            f"{blk/dt/1e6:6.2f} M blk/s  {blk*16/dt/1e9:5.2f} GB/s")

        def ks_pallas(rk_packed, nlo, nhi):
            from pvac_hfhe_cppbyv_tpu.crypto import aes_pallas

            rkm = aesv.rk_masks_from_packed(rk_packed, N)
            rk_lanes = jnp.moveaxis(rkm, -1, 0)
            return aes_pallas.aes_ctr_keystream_pallas(rk_lanes, nlo, nhi, nblocks)

        try:
            fn = jax.jit(ks_pallas, device=dev)
            dt = bench(fn, (rk, nlo, nhi))
            log(f"N={N:5d} keystream [pallas]: {dt*1e3:8.1f} ms  "
                f"{blk/dt/1e6:6.2f} M blk/s  {blk*16/dt/1e9:5.2f} GB/s")
        except Exception as ex:
            log(f"N={N:5d} keystream [pallas]: FAILED {type(ex).__name__}: {ex}")


if __name__ == "__main__":
    main()
