#!/usr/bin/env python
"""Fine-grained timing inside the enc sigma path (monkey-patched probes)."""
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
from pvac_hfhe_cppbyv_tpu.parallel import engine as ENG
from pvac_hfhe_cppbyv_tpu.parallel.engine import DeviceEngine, enable_device


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --- probes ---
orig_sigma = DeviceEngine.sigma
orig_compact = DeviceEngine._sigma_compact_padded
orig_prf_chunk = DeviceEngine._prf_chunk


def sigma(self, words, device_resident=True):
    t0 = time.time()
    out = orig_sigma(self, words, device_resident)
    log(f"    engine.sigma E={words.shape[0]}: {(time.time()-t0)*1e3:.1f} ms")
    return out


def compact(self, ltab_dev, u_pad, buf):
    t0 = time.time()
    out = orig_compact(self, ltab_dev, u_pad, buf)
    log(f"      compact_padded E={buf.shape[0]} u={u_pad}: "
        f"{(time.time()-t0)*1e3:.1f} ms")
    return out


def prf_chunk(self, keys, nonces, tk, tn):
    t0 = time.time()
    out = orig_prf_chunk(self, keys, nonces, tk, tn)
    log(f"    prf_chunk N={keys.shape[0]}: {(time.time()-t0)*1e3:.1f} ms")
    return out


DeviceEngine.sigma = sigma
DeviceEngine._sigma_compact_padded = compact
DeviceEngine._prf_chunk = prf_chunk


def main():
    dev = jax.devices()[0]
    log("device:", dev)
    prm = pvac.Params()
    pk, sk = pvac.keygen(prm)
    enable_device(pk, sk, device=dev)

    n = 32
    for rep in range(3):
        t0 = time.time()
        cts = pvac.enc_value_batch(pk, sk, list(range(n)))
        dt = time.time() - t0
        log(f"rep{rep}: {dt:.3f}s ({n/dt:.1f} ct/s)")


if __name__ == "__main__":
    main()
