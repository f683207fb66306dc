"""Device engine: jitted TPU pipelines for the scheme's hot paths.

Attach an engine to a public key with :func:`enable_device` and every
operation (enc/dec/mul/recrypt/text) transparently routes its bulk compute —
AES-CTR keystreams + LPN + Toeplitz (prf_R cores) and SHA-CTR + H-gather
(σ generation) — through jitted XLA programs on the attached devices, while
the host keeps key derivation, layer bookkeeping and field-scalar glue.

Shapes are static per jit cache entry; lane counts are padded to the next
power of two (min 32) to bound recompilation.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core import hash as H
from ..crypto import aesv, lpn, shactr
from ..types import PubKey, SecKey

U32 = np.uint32


def _pad_pow2(n: int, lo: int = 32) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def prf_program(prm, n_lanes: int, use_pallas: bool = False):
    """The single-chip prf_R-core forward program (jittable, pure).

    (rk_packed [1920, n/32], nlo, nhi [n], trk_packed, tnlo, tnhi, s32
    [2*s_words64]) -> (field limbs [n, 4], rejection flags [n]).

    With use_pallas=True the AES keystream runs as the fused Pallas kernel
    (state stays in VMEM across rounds) instead of the XLA op pipeline.
    """
    nblocks = lpn.n_ybits_blocks(prm)

    def _keystream_words(rk_packed, nlo, nhi, nb):
        rk = aesv.rk_masks_from_packed(rk_packed, n_lanes)
        if use_pallas:
            from ..crypto import aes_pallas

            rk_lanes = jnp.moveaxis(rk, -1, 0)  # [N, 15, 16, 8]
            return aes_pallas.aes_ctr_keystream_pallas(rk_lanes, nlo, nhi, nb)
        planes = aesv.counters_to_planes(nlo, nhi, nb)
        out = aesv.encrypt_planes(rk, planes)
        return aesv.planes_to_words(out, nb)

    def run(rk_packed, nlo, nhi, trk_packed, tnlo, tnhi, s32):
        words = _keystream_words(rk_packed, nlo, nhi, nblocks)  # [N, B, 4]
        lo = words[:, :, 0::2].reshape(n_lanes, -1)
        hi = words[:, :, 1::2].reshape(n_lanes, -1)
        u64s = jnp.stack([lo, hi], axis=-1)  # [N, 2*nblocks, 2]

        twords = _keystream_words(trk_packed, tnlo, tnhi, 1)  # [N, 1, 4]
        tlo = twords[:, :, 0::2].reshape(n_lanes, -1)
        thi = twords[:, :, 1::2].reshape(n_lanes, -1)
        top_u = jnp.stack([tlo, thi], axis=-1)  # [N, 2, 2]

        r, rej = lpn.cores_from_streams(u64s, top_u, s32, prm)
        return r, rej.any(axis=-1)

    return run


class DeviceEngine:
    """Holds device-resident key material and jit caches for one (pk, sk).

    sk material on device is limited to the LPN secret bit-vector (needed by
    the row-parity kernel); AES round keys are expanded host-side per call
    and shipped in packed (lane-compressed) form.
    """

    def __init__(self, pk: PubKey, sk: SecKey | None = None, device=None,
                 use_pallas: bool | None = None):
        self.pk = pk
        self.prm = pk.prm
        self.device = device or jax.devices()[0]
        import os

        if use_pallas is None:
            use_pallas = os.environ.get("PVAC_PALLAS") == "1"
        self.use_pallas = use_pallas
        # Fused Pallas SHA-256 for the σ choose_k streams: default on for
        # accelerator devices (the XLA op-per-round path is ~100x off VPU
        # speed of light), off on CPU where Pallas TPU kernels can't run.
        env_sha = os.environ.get("PVAC_PALLAS_SHA")
        if env_sha is not None:
            self.use_pallas_sha = env_sha == "1"
        else:
            self.use_pallas_sha = self.device.platform != "cpu"
        self.H_dev = (
            jax.device_put(pk.H, self.device) if pk.H is not None else None
        )
        self.s32_dev = (
            jax.device_put(sk.s_words32().reshape(-1), self.device)
            if sk is not None else None
        )
        self._prf_fn_cache = {}
        self._sigma_fn_cache = {}

    # ------------------------------------------------------------------
    # prf_R cores
    # ------------------------------------------------------------------

    def _prf_fn(self, n_pad: int):
        fn = self._prf_fn_cache.get(n_pad)
        if fn is not None:
            return fn
        fn = jax.jit(prf_program(self.prm, n_pad, self.use_pallas), device=self.device)
        self._prf_fn_cache[n_pad] = fn
        return fn

    PRF_CHUNK = 1024

    def prf_cores_async(self, keys: np.ndarray, nonces: np.ndarray,
                        toep_keys: np.ndarray, toep_nonces: np.ndarray):
        """[N,32] u8 keys + [N] u64 nonces (x2 for toep) -> (limbs [N,4],
        rej [N] bool), both device-resident jax arrays.

        Chunked like sigma(): all chunk programs are dispatched without an
        intervening sync (the device link has ~30 ms round-trip latency, so
        per-chunk blocking fetches would dominate); the caller fetches when
        it needs the values.
        """
        N = keys.shape[0]
        C = self.PRF_CHUNK
        if N > C:
            rs, rejs = [], []
            for off in range(0, N, C):
                r, rej = self._prf_chunk(
                    keys[off : off + C], nonces[off : off + C],
                    toep_keys[off : off + C], toep_nonces[off : off + C],
                )
                rs.append(r)
                rejs.append(rej)
            return jnp.concatenate(rs), jnp.concatenate(rejs)
        return self._prf_chunk(keys, nonces, toep_keys, toep_nonces)

    def prf_cores(self, keys: np.ndarray, nonces: np.ndarray,
                  toep_keys: np.ndarray, toep_nonces: np.ndarray):
        """Synchronous prf_cores_async -> (numpy limbs, numpy rej)."""
        r, rej = self.prf_cores_async(keys, nonces, toep_keys, toep_nonces)
        return np.asarray(r), np.asarray(rej)

    def _prf_chunk(self, keys, nonces, toep_keys, toep_nonces):
        """One padded chunk -> device-resident (limbs, rej); no host sync."""
        N = keys.shape[0]
        n_pad = _pad_pow2(N)

        def prep(kb, nn):
            kb_p = np.zeros((n_pad, 32), dtype=np.uint8)
            kb_p[:N] = kb
            rk = aesv.expand_keys_packed(kb_p)
            nlo = np.zeros(n_pad, dtype=U32)
            nhi = np.zeros(n_pad, dtype=U32)
            nlo[:N] = (nn & np.uint64(0xFFFFFFFF)).astype(U32)
            nhi[:N] = (nn >> np.uint64(32)).astype(U32)
            return rk, nlo, nhi

        rk, nlo, nhi = prep(keys, nonces)
        trk, tnlo, tnhi = prep(toep_keys, toep_nonces)
        r, rej = self._prf_fn(n_pad)(rk, nlo, nhi, trk, tnlo, tnhi, self.s32_dev)
        return r[:N], rej[:N]

    # ------------------------------------------------------------------
    # σ generation
    # ------------------------------------------------------------------

    def _sigma_fn(self, n_pad: int):
        fn = self._sigma_fn_cache.get(n_pad)
        if fn is not None:
            return fn
        prm = self.prm

        pallas_sha = self.use_pallas_sha

        def run(H, lanes):
            cols, fb1 = shactr.choose_k_batch(
                prm.x_col_wt, prm.n_bits, "pvac.dom.x_seed", lanes,
                pallas_sha=pallas_sha,
            )
            noise, fb2 = shactr.choose_k_batch(
                prm.err_wt, prm.m_bits, "pvac.dom.noise", lanes,
                pallas_sha=pallas_sha,
            )
            # XOR-accumulate thin gathers: avoids materializing the
            # [N, x_col_wt, mw] gathered tensor (~1 GB at 8192 lanes), which
            # costs ~7x the HBM traffic of the running accumulator.
            sig = H[cols[:, 0]]
            for j in range(1, prm.x_col_wt):
                sig = sig ^ H[cols[:, j]]
            # scatter err bits (unique indices -> disjoint bits -> add==xor)
            word = noise // 32
            bit = (noise % 32).astype(U32)
            masks = (U32(1) << bit).astype(U32)
            eids = jnp.broadcast_to(
                jnp.arange(n_pad)[:, None], noise.shape
            )
            sig = sig.at[eids, word].add(masks)
            return sig, fb1 | fb2

        fn = jax.jit(run, device=self.device)
        self._sigma_fn_cache[n_pad] = fn
        return fn

    SIGMA_CHUNK = 8192

    def sigma(self, words: np.ndarray, device_resident: bool = True):
        """Chunked σ generation: big batches run as repeats of one compiled
        8192-lane program plus one pow2-padded remainder call, instead of
        padding the whole batch to the next power of two.

        All chunks are dispatched back-to-back with no host sync in between
        (the device link's ~30 ms round trip would otherwise dominate); the
        fallback flags come back in a single fetch at the end.
        """
        E = words.shape[0]
        C = self.SIGMA_CHUNK
        sigs = []
        fbs = []
        for off in range(0, E, C):
            s, f = self._sigma_padded(words[off : off + C])
            sigs.append(s)
            fbs.append(f)
        sig = sigs[0] if len(sigs) == 1 else jnp.concatenate(sigs, axis=0)
        fb = fbs[0] if len(fbs) == 1 else jnp.concatenate(fbs, axis=0)
        if not device_resident:
            sig = np.asarray(sig)
        return sig, fb  # fb stays device-resident; callers fetch when needed

    def _sigma_padded(self, words: np.ndarray):
        """words [E, 7] uint64 (σ stream fields) -> (σ [E, mw] uint32,
        fallback [E] bool), both device-resident jax arrays (no host sync).

        σ stays on the accelerator; consumers that need host bytes
        (serialization, edge compaction) convert lazily.  Decryption and
        further homomorphic ops never read σ on the host, so op chains
        avoid the device->host transfer entirely.
        """
        E = words.shape[0]
        n_pad = _pad_pow2(E)
        wp = np.zeros((n_pad, 7), dtype=np.uint64)
        wp[:E] = words
        lanes = np.stack(
            [(wp & np.uint64(0xFFFFFFFF)).astype(U32),
             (wp >> np.uint64(32)).astype(U32)],
            axis=-1,
        )
        sig, fb = self._sigma_fn(n_pad)(self.H_dev, jnp.asarray(lanes))
        return sig[:E], fb[:E]


def enable_device(pk: PubKey, sk: SecKey | None = None, device=None,
                  use_pallas: bool | None = None) -> DeviceEngine:
    """Attach a DeviceEngine to pk; ops route hot kernels through it."""
    eng = DeviceEngine(pk, sk, device, use_pallas=use_pallas)
    pk._engine = eng
    return eng


def disable_device(pk: PubKey) -> None:
    if hasattr(pk, "_engine"):
        del pk._engine
