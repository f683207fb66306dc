#!/usr/bin/env python
"""Stage-by-stage timing of the device sigma program on the attached TPU.

Stages (all jitted separately, same shapes as one SIGMA_CHUNK=8192 batch):
  1. SHA-CTR draw streams (x_seed + noise), Pallas and XLA variants
  2. first-occurrence dedup + take mask (the O(D^2) pairwise compare)
  3. H gather-XOR accumulation (128+overshoot thin gathers)
  4. noise one-hot accumulation
Writes docs/sigma_stages.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pvac_jax_cache")


def bench(fn, *args, reps=3):
    r = fn(*args)
    jax_flat = [x for x in (r if isinstance(r, tuple) else (r,))]
    np.asarray(jax_flat[0])[:1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        jax_flat = [x for x in (r if isinstance(r, tuple) else (r,))]
        for x in jax_flat:
            x.block_until_ready()
        np.asarray(jax_flat[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/pvac_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    import pvac_hfhe_cppbyv_tpu as pvac
    from pvac_hfhe_cppbyv_tpu.crypto import shactr

    prm = pvac.Params()
    E = 8192
    rng = np.random.default_rng(0)
    lanes = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 32, (E, 7, 2), dtype=np.uint64)
                    .astype(np.uint32)), dev)
    H = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 32, (prm.n_bits + 1, 256),
                                 dtype=np.uint64).astype(np.uint32)), dev)
    out = {"E": E}

    # --- stage 1: SHA-CTR streams ---
    D = prm.x_col_wt + 16

    def stream(pallas):
        return jax.jit(lambda l: shactr.stream_u64s(
            "pvac.dom.x_seed", l, D, pallas_sha=pallas))

    for name, pallas in (("sha_pallas", True), ("sha_xla", False)):
        t0 = time.perf_counter()
        f = stream(pallas)
        dt = bench(f, lanes)
        out[f"{name}_s"] = round(dt, 4)
        print(f"{name}: {dt*1e3:.1f} ms (first-call {time.perf_counter()-t0:.1f}s)",
              flush=True)

    # --- stage 2: draws_and_take end-to-end (stream + dedup + take) ---
    def dt_fn(l):
        v, t, fb = shactr.draws_and_take(
            prm.x_col_wt, prm.n_bits, "pvac.dom.x_seed", l, pallas_sha=True)
        return v, t, fb

    dt = bench(jax.jit(dt_fn), lanes)
    out["draws_take_s"] = round(dt, 4)
    print(f"draws_and_take (stream+dedup): {dt*1e3:.1f} ms", flush=True)

    # --- stage 3: H gather-XOR with a precomputed idx ---
    idx = jax.device_put(jnp.asarray(
        rng.integers(0, prm.n_bits, (E, D), dtype=np.int64).astype(np.int32)),
        dev)

    def gather_xor(Hx, ix):
        sig = Hx[ix[:, 0]]
        for j in range(1, D):
            sig = sig ^ Hx[ix[:, j]]
        return sig

    dt = bench(jax.jit(gather_xor), H, idx)
    out["gather_xor_s"] = round(dt, 4)
    print(f"H gather-xor ({D} gathers): {dt*1e3:.1f} ms", flush=True)

    # --- stage 4: noise one-hot accumulation ---
    nvals = jax.device_put(jnp.asarray(
        rng.integers(0, prm.m_bits, (E, D), dtype=np.int64).astype(np.int32)),
        dev)
    ntake = jax.device_put(jnp.asarray(
        rng.integers(0, 2, (E, D), dtype=np.int64).astype(bool)), dev)
    mw = prm.sigma_words32

    def onehot(nv, nt):
        word = nv // 32
        bit = (nv % 32).astype(np.uint32)
        masks = jnp.where(nt, (np.uint32(1) << bit).astype(np.uint32),
                          np.uint32(0))
        hit = word[:, :, None] == jnp.arange(mw, dtype=np.int32)[None, None, :]
        return jnp.where(hit, masks[:, :, None], np.uint32(0)).sum(
            axis=1, dtype=np.uint32)

    dt = bench(jax.jit(onehot), nvals, ntake)
    out["noise_onehot_s"] = round(dt, 4)
    print(f"noise one-hot: {dt*1e3:.1f} ms", flush=True)

    # --- full sigma program (engine path) for reference ---
    from pvac_hfhe_cppbyv_tpu.parallel.engine import DeviceEngine
    pk, sk = pvac.keygen(prm)
    eng = DeviceEngine(pk, sk, device=dev)
    words = np.zeros((E, 7), dtype=np.uint64)
    words[:, 0] = np.uint64(pk.canon_tag)
    words[:, 1:4] = rng.integers(0, 1 << 63, (E, 3), dtype=np.uint64)
    words[:, 4] = rng.integers(0, prm.B, E, dtype=np.uint64)
    words[:, 5] = rng.integers(0, 2, E, dtype=np.uint64)
    words[:, 6] = rng.integers(0, 1 << 63, E, dtype=np.uint64)

    def full():
        sig, fb = eng.sigma(words)
        np.asarray(fb)
        return np.asarray(sig[:1])

    full()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        full()
        best = min(best, time.perf_counter() - t0)
    out["full_sigma_s"] = round(best, 4)
    print(f"full sigma program: {best*1e3:.1f} ms -> {E/best:,.0f} edges/s",
          flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "sigma_stages.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    os._exit(0)


if __name__ == "__main__":
    main()
