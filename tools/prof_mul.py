#!/usr/bin/env python
"""Profile ct_mul_batch: host staging vs sigma generation vs glue."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pvac_jax_cache")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pvac_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pvac_hfhe_cppbyv_tpu as pvac
from pvac_hfhe_cppbyv_tpu.parallel.engine import enable_device
from pvac_hfhe_cppbyv_tpu.ops import arithmetic as AR
from pvac_hfhe_cppbyv_tpu.crypto import matrix
from pvac_hfhe_cppbyv_tpu.core.random import csprng_u64_array

def log(*a): print(*a, file=sys.stderr, flush=True)

dev = jax.devices()[0]
log("device:", dev)
prm = pvac.Params()
t0 = time.time(); pk, sk = pvac.keygen(prm); log(f"keygen {time.time()-t0:.1f}s")
enable_device(pk, sk, device=dev)

B = int(os.environ.get("NMUL", "16"))
cts = pvac.enc_value_batch(pk, sk, list(range(2 * B)))
pairs = [(cts[2*i], cts[2*i+1]) for i in range(B)]

# warm
prods = pvac.ct_mul_batch(pk, pairs)
log("warm done")

# timed: full
t0 = time.time(); prods = pvac.ct_mul_batch(pk, pairs); t_full = time.time() - t0
log(f"full ct_mul_batch({B}): {t_full*1e3:.0f} ms  ({B/t_full:.1f} ops/s)")

# timed: staging only
t0 = time.time()
staged = [AR._ct_mul_stage(pk, A, Bc) for A, Bc in pairs]
t_stage = time.time() - t0
counts = [len(s["out_lid"]) for s in staged]
log(f"stage: {t_stage*1e3:.0f} ms  edges/prod={counts[0]} total={sum(counts)}")

# timed: sigma only
zt = np.concatenate([s["zt"] for s in staged])
nlo = np.concatenate([s["nlo"] for s in staged])
nhi = np.concatenate([s["nhi"] for s in staged])
idxs = np.concatenate([np.asarray(s["out_idx"], dtype=np.uint64) for s in staged])
chs = np.concatenate([np.asarray(s["out_ch"], dtype=np.uint64) for s in staged])
salts = csprng_u64_array(int(sum(counts)))
t0 = time.time()
sig_all = matrix.sigma_words(pk, zt, nlo, nhi, idxs, chs, salts)
try:
    sig_all.block_until_ready()
except Exception:
    pass
t_sig = time.time() - t0
log(f"sigma({sum(counts)} lanes): {t_sig*1e3:.0f} ms")

# sub-breakdown of stage for one pair
import cProfile, pstats, io
pr = cProfile.Profile(); pr.enable()
for A, Bc in pairs:
    AR._ct_mul_stage(pk, A, Bc)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
log(s.getvalue())
