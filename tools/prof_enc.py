#!/usr/bin/env python
"""Phase breakdown of enc_value_batch on the attached device.

Times each stage of the batched encryptor separately: PRF dispatch, host
structure drawing, sigma dispatch, PRF fetch, host weight solving, sigma
fetch, cipher assembly.  Used to direct throughput work (VERDICT r1 #4).
"""
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
from pvac_hfhe_cppbyv_tpu.core import field as F
from pvac_hfhe_cppbyv_tpu.core import fieldv as FV
from pvac_hfhe_cppbyv_tpu.crypto import lpn
from pvac_hfhe_cppbyv_tpu.ops import encrypt as E
from pvac_hfhe_cppbyv_tpu.parallel.engine import enable_device


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def profile_batch(pk, sk, n_values, tag):
    values = []
    for v in range(n_values):
        val = F.fp_from_u64(v)
        mask = F.rand_fp_nonzero()
        values.append(F.fp_add(val, mask))
        values.append(F.fp_neg(mask))
    depth_hints = [0] * len(values)

    t = {}
    t0 = time.time()
    plans = [E._LayerPlan(pk, v, d) for v, d in zip(values, depth_hints)]
    reqs = []
    spans = []
    for p in plans:
        r = E._prf_requests(p)
        spans.append((len(reqs), len(r)))
        reqs.extend(r)
    seeds = np.array(
        [[s.ztag, s.nonce.lo, s.nonce.hi] for s, _ in reqs], dtype=np.uint64
    )
    dh = np.array([lpn.DOM_HASH[d] for _, d in reqs], dtype=np.uint64)
    t["plan+reqs"] = time.time() - t0

    t0 = time.time()
    prf_fin = lpn.prf_cores_batch_start(pk, sk, seeds, dh)
    t["prf dispatch"] = time.time() - t0

    t0 = time.time()
    for p in plans:
        E._draw_structure(pk, p)
    t["draw structure"] = time.time() - t0

    t0 = time.time()
    sig_fin = E._sigma_for_plans_start(pk, plans)
    t["sigma dispatch"] = time.time() - t0

    t0 = time.time()
    cores = FV.to_ints(prf_fin())
    t["prf fetch"] = time.time() - t0

    t0 = time.time()
    weights = [
        E._weights_from_cores(pk, p, cores[off : off + n])
        for p, (off, n) in zip(plans, spans)
    ]
    t["weight solve"] = time.time() - t0

    t0 = time.time()
    sig_all, offsets = sig_fin()
    t["sigma finalize"] = time.time() - t0

    t0 = time.time()
    from pvac_hfhe_cppbyv_tpu.types import LazySigma

    if isinstance(sig_all, np.ndarray):
        views = [sig_all[offsets[i] : offsets[i + 1]] for i in range(len(plans))]
    else:
        views = [
            LazySigma(sig_all, np.arange(offsets[i], offsets[i + 1]))
            for i in range(len(plans))
        ]
    out = []
    for p, ws, sig in zip(plans, weights, views):
        C = E._build_cipher_from_plan(pk, p, ws, sig)
        E.guard_budget(pk, C, "enc")
        E._shuffle_edges(C)
        out.append(C)
    shares = out
    combined = [
        E.combine_ciphers(pk, shares[2 * i], shares[2 * i + 1])
        for i in range(n_values)
    ]
    t["assemble+combine"] = time.time() - t0

    total = sum(t.values())
    log(f"--- {tag}: n={n_values} lanes={len(reqs)} total={total:.3f}s "
        f"({n_values/total:.1f} ct/s)")
    for k, v in t.items():
        log(f"  {k:>18}: {v*1e3:8.1f} ms  ({100*v/total:4.1f}%)")
    return combined


def main():
    dev = jax.devices()[0]
    log("device:", dev)
    prm = pvac.Params()
    t0 = time.time()
    pk, sk = pvac.keygen(prm)
    log(f"keygen: {time.time()-t0:.1f}s")
    enable_device(pk, sk, device=dev)

    n = int(os.environ.get("PROF_N", "32"))
    cts = profile_batch(pk, sk, n, "warmup(compile)")
    for rep in range(3):
        cts = profile_batch(pk, sk, n, f"rep{rep}")

    # decrypt breakdown
    t0 = time.time()
    vals = pvac.dec_value_batch(pk, sk, cts)
    log(f"dec warmup: {time.time()-t0:.2f}s")
    assert vals == list(range(n)), "decrypt mismatch"
    for rep in range(2):
        t0 = time.time()
        vals = pvac.dec_value_batch(pk, sk, cts)
        dt = time.time() - t0
        log(f"dec rep{rep}: {dt:.3f}s ({n/dt:.1f} ct/s)")


if __name__ == "__main__":
    main()
