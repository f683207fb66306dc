#!/usr/bin/env python
"""One-shot TPU validation + measurement session.

Run whenever the device link is healthy; performs, in order:
  1. pallas AES kernel bit-exactness on the TPU
  2. pallas-vs-XLA prf-core pipeline timing
  3. records results to /tmp/tpu_session_results.json

A keepalive thread issues a tiny device op every 3s throughout (the axon
tunnel wedges when idle).
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pvac_jax_cache")

RESULTS = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def keepalive():
    x = jnp.arange(8)
    while True:
        try:
            (x + 1).block_until_ready()
        except Exception:
            pass
        time.sleep(3.0)


def main():
    log("warm:", (jnp.arange(8) * 2).sum())
    threading.Thread(target=keepalive, daemon=True).start()

    from pvac_hfhe_cppbyv_tpu.crypto import aes, aesv, aes_pallas
    from pvac_hfhe_cppbyv_tpu.params import Params, small_test_params
    from pvac_hfhe_cppbyv_tpu.parallel import engine as ENG
    import pvac_hfhe_cppbyv_tpu as pvac

    # ---- 1. pallas kernel bit-exactness ----
    rng = np.random.default_rng(21)
    N, nblocks = 8, 64
    keys = rng.integers(0, 256, size=(N, 32), dtype=np.uint8)
    nonces = rng.integers(0, 1 << 64, size=(N,), dtype=np.uint64)
    rk_lanes = np.ascontiguousarray(
        np.moveaxis(aesv.expand_keys_bitsliced(keys), -1, 0))
    nlo = (nonces & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    nhi = (nonces >> np.uint64(32)).astype(np.uint32)
    t0 = time.time()
    f = jax.jit(lambda a, b, c: aes_pallas.aes_ctr_keystream_pallas(a, b, c, nblocks))
    words = np.asarray(f(jnp.asarray(rk_lanes), jnp.asarray(nlo), jnp.asarray(nhi)))
    log("pallas compile+run:", time.time() - t0)
    ok = True
    for n in range(N):
        sc = aes.AesCtr256(bytes(keys[n]), int(nonces[n]))
        want = sc.fill_u64(2 * nblocks)
        got = []
        for b in range(nblocks):
            got.append(int(words[n, b, 0]) | int(words[n, b, 1]) << 32)
            got.append(int(words[n, b, 2]) | int(words[n, b, 3]) << 32)
        ok &= got == want
    RESULTS["pallas_bit_exact"] = bool(ok)
    log("pallas bit-exact on TPU:", ok)

    # ---- 2. pallas vs XLA prf pipeline timing (default params shapes) ----
    prm = Params()
    pk, sk = pvac.keygen(small_test_params())  # keys irrelevant for timing
    pk.prm = prm

    lanes = 256
    keys2 = rng.integers(0, 256, size=(lanes, 32), dtype=np.uint8)
    nn2 = rng.integers(0, 1 << 63, size=(lanes,), dtype=np.uint64)

    for use_pallas in (False, True):
        try:
            eng = ENG.DeviceEngine(pk, sk, use_pallas=use_pallas)
            t0 = time.time()
            r1, _ = eng.prf_cores(keys2, nn2, keys2, nn2)
            compile_t = time.time() - t0
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                r2, _ = eng.prf_cores(keys2, nn2, keys2, nn2)
            run_t = (time.time() - t0) / reps
            name = "pallas" if use_pallas else "xla"
            RESULTS[f"prf_{name}_compile_s"] = round(compile_t, 2)
            RESULTS[f"prf_{name}_cores_per_s"] = round(lanes / run_t, 1)
            log(f"prf[{name}]: compile {compile_t:.1f}s, "
                f"{lanes/run_t:.0f} cores/s")
            if use_pallas:
                RESULTS["pallas_matches_xla"] = bool(np.array_equal(r1, r_xla))
                log("pallas prf matches xla prf:", RESULTS["pallas_matches_xla"])
            else:
                r_xla = r1
        except Exception as e:
            RESULTS[f"prf_{'pallas' if use_pallas else 'xla'}_error"] = repr(e)[:400]
            log("ERROR:", repr(e)[:400])

    with open("/tmp/tpu_session_results.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    log("results written")


if __name__ == "__main__":
    main()
