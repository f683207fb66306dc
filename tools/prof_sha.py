#!/usr/bin/env python
"""Correctness + speed of the fused Pallas SHA-256 kernel vs hashlib/XLA."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pvac_jax_cache")
import hashlib, struct
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pvac_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, "/root/repo")
from pvac_hfhe_cppbyv_tpu.crypto import shactr, sha256_pallas
from pvac_hfhe_cppbyv_tpu.core import hash as H

def log(*a): print(*a, file=sys.stderr, flush=True)

dev = jax.devices()[0]
log("device:", dev)

# correctness: stream_u64s with pallas vs scalar CtrStream
rng = np.random.default_rng(7)
L = 64
words = rng.integers(0, 1 << 63, size=(L, 7), dtype=np.uint64)
lanes = np.stack([(words & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                  (words >> np.uint64(32)).astype(np.uint32)], axis=-1)
lanes_j = jax.device_put(jnp.asarray(lanes), dev)
got = np.asarray(shactr.stream_u64s("pvac.dom.x_seed", lanes_j, 192, pallas_sha=True))
for i in (0, 13, 63):
    st = shactr.CtrStream("pvac.dom.x_seed", [int(w) for w in words[i]])
    want = [st.rnd() for _ in range(192)]
    have = [int(got[i, j, 0]) | (int(got[i, j, 1]) << 32) for j in range(192)]
    assert have == want, f"lane {i} mismatch: {have[:3]} vs {want[:3]}"
log("pallas stream_u64s CORRECT vs scalar reference")

# choose_k parity
ck, fb = shactr.choose_k_batch(128, 16384, "pvac.dom.x_seed", lanes_j, pallas_sha=True)
ck = np.asarray(ck); fb = np.asarray(fb)
for i in (0, 31):
    want = shactr.choose_k_scalar(128, 16384, "pvac.dom.x_seed", [int(w) for w in words[i]])
    assert not fb[i] and list(ck[i]) == want, f"choose_k lane {i} mismatch"
log("pallas choose_k CORRECT")

# speed: 8192 lanes, 192 draws
L = 8192
words = rng.integers(0, 1 << 63, size=(L, 7), dtype=np.uint64)
lanes = np.stack([(words & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                  (words >> np.uint64(32)).astype(np.uint32)], axis=-1)
lanes_j = jax.device_put(jnp.asarray(lanes), dev)

for tag, ps in [("xla", False), ("pallas", True)]:
    f = jax.jit(lambda l, ps=ps: shactr.stream_u64s("pvac.dom.x_seed", l, 192, pallas_sha=ps), device=dev)
    out = f(lanes_j); np.asarray(jnp.ravel(out)[:1])
    t0 = time.time()
    for _ in range(3):
        out = f(lanes_j); np.asarray(jnp.ravel(out)[:1])
    log(f"stream 8192x192 [{tag}]: {(time.time()-t0)/3*1e3:.1f} ms")

for tag, ps in [("xla", False), ("pallas", True)]:
    f = jax.jit(lambda l, ps=ps: shactr.choose_k_batch(128, 16384, "pvac.dom.x_seed", l, pallas_sha=ps), device=dev)
    out = f(lanes_j); np.asarray(jnp.ravel(out[0])[:1])
    t0 = time.time()
    for _ in range(3):
        out = f(lanes_j); np.asarray(jnp.ravel(out[0])[:1])
    log(f"choose_k 8192 [{tag}]: {(time.time()-t0)/3*1e3:.1f} ms")

# breakdown: build_blocks vs kernel
from pvac_hfhe_cppbyv_tpu.crypto.shactr import _layout
layout = _layout(b"pvac.dom.x_seed", 7)
R = 48
def build(l):
    ctr = jnp.arange(R, dtype=jnp.uint32)
    zeros = jnp.zeros((R,), dtype=jnp.uint32)
    ctr_fields = jnp.stack([ctr, zeros], axis=-1)
    w = jnp.broadcast_to(l[:, None, :, :], (L, R, 7, 2))
    c = jnp.broadcast_to(ctr_fields[None, :, None, :], (L, R, 1, 2))
    fields = jnp.concatenate([w, c], axis=2)
    return layout.build_blocks(fields)
bj = jax.jit(build, device=dev)
blocks = bj(lanes_j); np.asarray(jnp.ravel(blocks)[:1])
t0 = time.time()
for _ in range(3):
    out = bj(lanes_j); np.asarray(jnp.ravel(out)[:1])
log(f"build_blocks: {(time.time()-t0)/3*1e3:.1f} ms")

kj = jax.jit(lambda b: sha256_pallas.sha256_many(b), device=dev)
out = kj(blocks); np.asarray(jnp.ravel(out)[:1])
t0 = time.time()
for _ in range(3):
    out = kj(blocks); np.asarray(jnp.ravel(out)[:1])
log(f"sha kernel only: {(time.time()-t0)/3*1e3:.1f} ms")
