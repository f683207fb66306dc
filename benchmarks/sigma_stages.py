#!/usr/bin/env python
"""Stage-by-stage timing of the device sigma program on the attached TPU.

Methodology (round 5): K dispatches back-to-back, completion forced by ONE
device-side reduction + one scalar fetch (N serial np.asarray fetches cost
N x link-RTT and polluted the round-4 numbers), amortized per call; a
window-speed probe is recorded because the device is time-shared
(docs/ROUND5.md).

Stages (all jitted separately, E=16384 lanes like one SIGMA_CHUNK):
  1. SHA-CTR draw streams alone (both streams, Pallas midstate kernel)
  2. draws_and_take (streams + first-occurrence dedup + take masks)
  3. H gather-XOR accumulation (144 thin gathers, precomputed idx)
  4. noise one-hot accumulation (the measured winner of 5 variants —
     docs/session_r5c.json)
  5. the full production sigma program via the engine (marginal queued
     chunk, drained + compute-fenced)
Writes docs/sigma_stages.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pvac_jax_cache")


def main():
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    import pvac_hfhe_cppbyv_tpu as pvac
    from pvac_hfhe_cppbyv_tpu.crypto import shactr

    _red = jax.jit(lambda s: s.astype(jnp.uint32).sum())

    def probe():
        a = jnp.ones((2048, 2048), dtype=jnp.bfloat16)
        f = jax.jit(lambda x: lax.fori_loop(0, 50, lambda i, y: y @ a, x))
        np.asarray(f(a)[:1, :1], dtype=np.float32)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(f(a)[:1, :1], dtype=np.float32)
            best = min(best, time.time() - t0)
        return round(50 * 2 * 2048**3 / best / 1e12, 1)

    def amort(jf, *args, K=6):
        w = jf(*args)
        w0 = w[0] if isinstance(w, tuple) else w
        np.asarray(_red(w0))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(K):
                w = jf(*args)
            w0 = w[0] if isinstance(w, tuple) else w
            np.asarray(_red(w0))
            best = min(best, (time.time() - t0) / K)
        return best

    prm = pvac.Params()
    E = 16384
    D = prm.x_col_wt + 16
    mw = prm.sigma_words32
    rng = np.random.default_rng(0)
    out = {"E": E, "date": time.strftime("%Y-%m-%d %H:%M:%S"),
           "device": str(dev), "window_probe_tflops_start": probe()}
    print(f"window: {out['window_probe_tflops_start']} bf16 TFLOP/s",
          flush=True)

    lanes = jax.device_put(
        rng.integers(0, 1 << 32, (E, 7, 2), dtype=np.uint64).astype(
            np.uint32), dev)
    Hx = jax.device_put(
        rng.integers(0, 1 << 32, (prm.n_bits + 1, mw),
                     dtype=np.uint64).astype(np.uint32), dev)

    # --- 1. SHA streams only (both streams) ---
    def streams(lz):
        a = shactr.stream_u64s("pvac.dom.x_seed", lz, D, pallas_sha=True)
        b = shactr.stream_u64s("pvac.dom.noise", lz, D, pallas_sha=True)
        return a[..., 0] ^ b[..., 0]

    t = amort(jax.jit(streams), lanes)
    out["sha_streams_ms"] = round(t * 1e3, 2)
    print(f"SHA streams (2x{D} draws): {t*1e3:.2f} ms", flush=True)

    # --- 2. draws_and_take (streams + dedup + take) ---
    def dt_fn(lz):
        cv, ct, f1 = shactr.draws_and_take(
            prm.x_col_wt, prm.n_bits, "pvac.dom.x_seed", lz, pallas_sha=True)
        nv, nt, f2 = shactr.draws_and_take(
            prm.err_wt, prm.m_bits, "pvac.dom.noise", lz, pallas_sha=True)
        return (cv & ct) ^ (nv & nt)

    t = amort(jax.jit(dt_fn), lanes)
    out["draws_take_ms"] = round(t * 1e3, 2)
    print(f"draws_and_take (both streams): {t*1e3:.2f} ms", flush=True)

    # --- 3. H gather-XOR with precomputed idx ---
    idx = jax.device_put(
        rng.integers(0, prm.n_bits, (E, D), dtype=np.int64).astype(np.int32),
        dev)

    def gather_xor(Hxx, ix):
        sig = Hxx[ix[:, 0]]
        for j in range(1, D):
            sig = sig ^ Hxx[ix[:, j]]
        return sig

    t = amort(jax.jit(gather_xor), Hx, idx)
    out["gather_xor_ms"] = round(t * 1e3, 2)
    gb = E * D * mw * 4 / 1e9
    print(f"H gather-xor ({D} gathers, {gb:.1f} GB): {t*1e3:.2f} ms "
          f"-> {gb/t:.0f} GB/s effective", flush=True)
    out["gather_effective_GBps"] = round(gb / t, 0)

    # --- 4. noise one-hot accumulation ---
    nvals = jax.device_put(
        rng.integers(0, prm.m_bits, (E, D), dtype=np.int64).astype(np.int32),
        dev)
    ntake = jax.device_put(
        rng.integers(0, 2, (E, D), dtype=np.int64).astype(bool), dev)

    def onehot(nv, nt):
        word = nv // 32
        bit = (nv % 32).astype(np.uint32)
        masks = jnp.where(nt, (np.uint32(1) << bit).astype(np.uint32),
                          np.uint32(0))
        hit = word[:, :, None] == jnp.arange(mw, dtype=np.int32)[None, None, :]
        return jnp.where(hit, masks[:, :, None], np.uint32(0)).sum(
            axis=1, dtype=np.uint32)

    t = amort(jax.jit(onehot), nvals, ntake)
    out["noise_onehot_ms"] = round(t * 1e3, 2)
    print(f"noise one-hot: {t*1e3:.2f} ms", flush=True)

    # --- 5. full production sigma via the engine (marginal queued) ---
    from pvac_hfhe_cppbyv_tpu.parallel.engine import DeviceEngine

    pk, sk = pvac.keygen(prm)
    eng = DeviceEngine(pk, sk, device=dev)
    # production-like layer structure: a few hundred distinct layer
    # seeds shared by many edges, with the layer-table passthrough the
    # real ops use (16K DISTINCT seeds would pad the seed table to 64K
    # rows — a shape no production batch hits; it cost ~2.4x in r5
    # measurement before this was matched to the roofline row)
    U = 256
    ltab = rng.integers(0, 1 << 63, (U, 3), dtype=np.uint64)
    lid = rng.integers(0, U, E, dtype=np.int64)
    words = np.zeros((E, 7), dtype=np.uint64)
    words[:, 0] = np.uint64(pk.canon_tag)
    words[:, 1:4] = ltab[lid]
    words[:, 4] = rng.integers(0, prm.B, E, dtype=np.uint64)
    words[:, 5] = rng.integers(0, 2, E, dtype=np.uint64)
    words[:, 6] = rng.integers(0, 1 << 63, E, dtype=np.uint64)

    s, f, r = eng.sigma(words, tab=(ltab, lid))
    eng.drain()
    np.asarray(_red(s))
    K = 8
    best = float("inf")
    for _ in range(3):
        hs = []
        t0 = time.time()
        for _ in range(K):
            s, f, r = eng.sigma(words, tab=(ltab, lid))
            hs.append(s)
        eng.drain()
        np.asarray(_red(hs[-1]))
        best = min(best, (time.time() - t0) / K)
    out["full_sigma_ms"] = round(best * 1e3, 2)
    out["full_sigma_edges_per_s"] = round(E / best, 0)
    print(f"full sigma program (marginal): {best*1e3:.2f} ms -> "
          f"{E/best:,.0f} edges/s", flush=True)
    out["window_probe_tflops_end"] = probe()

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "sigma_stages.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
