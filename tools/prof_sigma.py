#!/usr/bin/env python
"""Break down the device sigma program: SHA-CTR streams vs dedup vs H-gather."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pvac_jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pvac_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pvac_hfhe_cppbyv_tpu as pvac
from pvac_hfhe_cppbyv_tpu.crypto import shactr, sha256_pallas
from pvac_hfhe_cppbyv_tpu.parallel.engine import enable_device

def log(*a): print(*a, file=sys.stderr, flush=True)

dev = jax.devices()[0]
log("device:", dev)
prm = pvac.Params()
pk, sk = pvac.keygen(prm)
eng = enable_device(pk, sk, device=dev)

E = 8192
words = np.random.randint(0, 1 << 62, size=(E, 7), dtype=np.uint64)
lanes = np.stack(
    [(words & np.uint64(0xFFFFFFFF)).astype(np.uint32),
     (words >> np.uint64(32)).astype(np.uint32)], axis=-1)
lanes_dev = jax.device_put(jnp.asarray(lanes), dev)
H_dev = eng.Hx_dev  # the sigma program expects H + trailing all-zero row

def _force(r):
    # fetch ONE element (device-side slice, then a 4-byte transfer) so we
    # measure compute, not the 27 MB/s tunnel
    for x in jax.tree.leaves(r):
        np.asarray(x.ravel()[0:1])
    return r

def timeit(name, fn, reps=5):
    r = _force(fn())  # warm/compile
    t0 = time.time()
    rs = [fn() for _ in range(reps)]  # queue all reps async
    _force(rs[-1])
    dt = (time.time() - t0) / reps
    log(f"{name}: {dt*1e3:.1f} ms")
    return r

# 1. full sigma program
timeit("full sigma_fn(8192)", lambda: eng._sigma_fn(E)(H_dev, lanes_dev))

# 2. stream_u64s only (both domains), jitted
@jax.jit
def streams_only(lanes):
    a = shactr.stream_u64s("pvac.dom.x_seed", lanes, 192, pallas_sha=True)
    b = shactr.stream_u64s("pvac.dom.noise", lanes, 192, pallas_sha=True)
    return a, b
timeit("stream_u64s x2 (192 draws)", lambda: streams_only(lanes_dev))

# 3. choose_k_batch both domains (includes streams + dedup + gather-ranks)
@jax.jit
def choose_only(lanes):
    c1, f1 = shactr.choose_k_batch(128, prm.n_bits, "pvac.dom.x_seed", lanes, pallas_sha=True)
    c2, f2 = shactr.choose_k_batch(128, prm.m_bits, "pvac.dom.noise", lanes, pallas_sha=True)
    return c1, c2, f1 | f2
cols, noise, fb = timeit("choose_k_batch x2", lambda: choose_only(lanes_dev))

# 4. H-gather xor-accumulate only
@jax.jit
def gather_only(H, cols):
    sig = H[cols[:, 0]]
    for j in range(1, 128):
        sig = sig ^ H[cols[:, j]]
    return sig
timeit("H-gather xor x128", lambda: gather_only(H_dev, cols))

# 5. noise scatter only
@jax.jit
def scatter_only(sig, noise):
    word = noise // 32
    bit = (noise % 32).astype(np.uint32)
    masks = (np.uint32(1) << bit).astype(np.uint32)
    eids = jnp.broadcast_to(jnp.arange(E)[:, None], noise.shape)
    return sig.at[eids, word].add(masks)
sig = gather_only(H_dev, cols)
timeit("noise scatter", lambda: scatter_only(sig, noise))

# ---- choose_k internals ----
from pvac_hfhe_cppbyv_tpu.crypto.shactr import stream_u64s, mod_u64, bounded_ok_mask

D = 192
@jax.jit
def piece_streams(lanes):
    u1 = stream_u64s("pvac.dom.x_seed", lanes, D, pallas_sha=True)
    u2 = stream_u64s("pvac.dom.noise", lanes, D, pallas_sha=True)
    return mod_u64(u1, prm.n_bits).astype(np.int32), mod_u64(u2, prm.m_bits).astype(np.int32)
v1, v2 = timeit("streams+mod", lambda: piece_streams(lanes_dev))

@jax.jit
def piece_dedup(vals):
    earlier = jnp.tril(jnp.ones((D, D), dtype=bool), k=-1)
    dup = ((vals[:, :, None] == vals[:, None, :]) & earlier[None]).any(-1)
    return ~dup
f1 = timeit("dedup pairwise (1 domain)", lambda: piece_dedup(v1))

@jax.jit
def piece_rank(first, vals):
    rank = jnp.cumsum(first.astype(np.int32), axis=-1)
    take = first & (rank <= 128)
    dst = jnp.where(take, rank - 1, 128)
    out = jnp.zeros((vals.shape[0], 129), dtype=np.int32)
    out = out.at[jnp.arange(vals.shape[0])[:, None], dst].set(jnp.where(take, vals, 0))
    return out[:, :128]
timeit("rank+scatter-select (1 domain)", lambda: piece_rank(f1, v1))

# one-hot noise accumulation alternative
@jax.jit
def scatter_onehot(sig, noise):
    word = noise // 32                                     # [E, 128]
    bit = (noise % 32).astype(np.uint32)
    masks = (np.uint32(1) << bit).astype(np.uint32)        # [E, 128]
    words = jnp.arange(256, dtype=np.int32)                # [W]
    hit = (word[:, :, None] == words[None, None, :])       # [E, 128, W]
    contrib = jnp.where(hit, masks[:, :, None], np.uint32(0)).sum(axis=1, dtype=np.uint32)
    return sig ^ contrib.astype(np.uint32)
timeit("noise one-hot accumulate", lambda: scatter_onehot(sig, noise))
