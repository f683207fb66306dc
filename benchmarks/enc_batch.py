#!/usr/bin/env python
"""Batched-encryption benchmark (BASELINE config 3: 64K enc_value + ct_add
chains, AES-CTR PRF on-device).

Usage:
    python benchmarks/enc_batch.py [--n 65536] [--chunk 512] [--small]

Encrypts n values in engine-batched chunks, chains pairwise ct_adds, and
decrypts a sample to verify.  Reports ct/s and derived PRF-core and AES
block throughput.
"""
import argparse
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--host-only", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pvac_jax_cache")
    import jax.numpy as jnp

    import pvac_hfhe_cppbyv_tpu as pvac
    from pvac_hfhe_cppbyv_tpu.crypto import lpn
    from pvac_hfhe_cppbyv_tpu.parallel.engine import enable_device

    def keepalive():
        x = jnp.arange(8)
        while True:
            try:
                (x + 1).block_until_ready()
            except Exception:
                pass
            time.sleep(3.0)

    def probe():
        """Window-speed probe: the device is time-shared (see ROUND5.md);
        every artifact records the window its numbers came from."""
        try:
            import jax.lax as lax

            a = jnp.ones((2048, 2048), dtype=jnp.bfloat16)
            f = jax.jit(lambda x: lax.fori_loop(0, 50, lambda i, y: y @ a, x))
            np.asarray(f(a)[:1, :1], dtype=np.float32)
            best = float("inf")
            for _ in range(3):
                tp = time.time()
                np.asarray(f(a)[:1, :1], dtype=np.float32)
                best = min(best, time.time() - tp)
            return round(50 * 2 * 2048**3 / best / 1e12, 1)
        except Exception:
            return None

    prm = pvac.small_test_params() if args.small else pvac.Params()
    t0 = time.time()
    pk, sk = pvac.keygen(prm)
    print(f"keygen: {time.time()-t0:.1f}s", flush=True)
    probe_start = None
    if not args.host_only:
        threading.Thread(target=keepalive, daemon=True).start()
        enable_device(pk, sk)
        probe_start = probe()
        print(f"window speed: {probe_start} bf16 TFLOP/s (peak ~197)",
              flush=True)

    # warm compile
    pvac.enc_value_batch(pk, sk, list(range(min(args.chunk, args.n))))

    t0 = time.time()
    done = 0
    sample = []
    # software-pipelined: chunk i+1's device programs dispatch before
    # chunk i's host finalize (enc_value_batch pipelines internally when
    # given the whole range, but chunked calls here keep progress visible)
    from pvac_hfhe_cppbyv_tpu.ops.encrypt import enc_fp_depth_batch_start
    from pvac_hfhe_cppbyv_tpu.core import field as F

    def start(v0, take):
        vals2 = []
        for v in range(v0, v0 + take):
            mask = F.rand_fp_nonzero()
            vals2.append(F.fp_add(F.fp_from_u64(v), mask))
            vals2.append(F.fp_neg(mask))
        return take, enc_fp_depth_batch_start(
            pk, sk, vals2, [0] * len(vals2), pair_shares=True)

    prev = None
    while done < args.n or prev is not None:
        if done < args.n:
            take = min(args.chunk, args.n - done)
            nxt = start(done, take)
            done += take
        else:
            nxt = None
        if prev is not None:
            k, fin = prev
            cts = fin()  # pair-fused assembly (ops/encrypt.py)
            if not sample:
                sample = cts[:4]
            # ciphertexts stream OUT (serving shape): retaining all 64K
            # device-σ handles measurably degrades the allocator
            # (docs/session_r5b.json 64K retained: ~0.5x this rate)
            del cts
            el = time.time() - t0
            print(f"  {done}/{args.n} enc ({done/el:.1f} ct/s)", flush=True)
        prev = nxt
    # drain in-flight sigma so the clock covers all device work
    eng = getattr(pk, "_engine", None)
    if eng is not None:
        eng.drain()
    el = time.time() - t0
    cores = 2 * 15 * args.n
    blocks = cores * (lpn.n_ybits_blocks(prm) + 1)
    print(f"enc_value: {args.n/el:.1f} ct/s | {cores/el:.0f} prf-cores/s | "
          f"{blocks/el/1e6:.1f}M AES blocks/s", flush=True)

    # ct_add chain + verify
    acc = sample[0]
    for c in sample[1:4]:
        acc = pvac.ct_add(pk, acc, c)
    assert pvac.dec_value(pk, sk, acc) == 0 + 1 + 2 + 3
    print("add-chain decrypt ok")

    if args.n >= 4096 and not args.small:
        import json
        import os

        path = pathlib.Path(__file__).resolve().parent.parent / "docs" / \
            f"enc_batch_{args.n}.json"
        rec = {
            "date": time.strftime("%Y-%m-%d %H:%M:%S"),
            "device": str(jax.devices()[0]),
            "n": args.n,
            "chunk": args.chunk,
            "host_only": args.host_only,
            "elapsed_s": round(el, 1),
            "ct_per_s": round(args.n / el, 1),
            "prf_cores_per_s": round(cores / el),
            "aes_blocks_per_s": round(blocks / el),
            "window_probe_tflops": [probe_start, probe()],
        }
        # preserve prior runs: published figures must stay traceable even
        # after the headline entry is superseded
        hist = []
        if path.exists():
            try:
                old = json.loads(path.read_text())
                hist = old.get("history", [])
                hist.append({"date": old["date"], "ct_per_s": old["ct_per_s"],
                             "chunk": old.get("chunk")})
            except Exception:
                pass
        rec["history"] = hist
        path.write_text(json.dumps(rec, indent=1))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
