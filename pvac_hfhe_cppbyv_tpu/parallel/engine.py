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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import hash as H
from ..crypto import aesv, lpn, shactr
from ..types import PubKey, SecKey

U32 = np.uint32


def _pad_pow2(n: int, lo: int = 32) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def _load_autotune() -> dict:
    """Measured kernel choices written by benchmarks/roofline.py.

    Falls back to the checked-in copy (docs/kernel_autotune.json) when no
    machine-local autotune file exists — fresh processes on a clean /tmp
    still get the measured winners."""
    import json
    import os

    path = os.environ.get("PVAC_AUTOTUNE_FILE",
                          "/tmp/pvac_kernel_autotune.json")
    for p in (path, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "..", "docs",
            "kernel_autotune.json")):
        try:
            with open(p) as f:
                return json.load(f)
        except Exception:
            continue
    return {}


def prf_program(prm, n_lanes: int, use_pallas: bool = False,
                tp_axis: str | None = None, expand_on_device: bool = True,
                derive_layout=None, aes_gn: bool = False,
                aes_fused: bool = False):
    """The single-chip prf_R-core forward program (jittable, pure).

    (keys [n, 32] u8, nlo, nhi [n], toep_keys [n, 32] u8, tnlo, tnhi, s32
    [2*s_words64]) -> (field limbs [n, 4], rejection flags [n]).

    With expand_on_device=True (the accelerator default) the AES-256 key
    schedule runs ON DEVICE (aesv.expand_keys_packed_xp): raw 32-byte
    keys cost 8x less link transfer than pre-expanded round-key planes,
    which were the largest host->device transfer of a warm encryption
    batch.  With False the key inputs are host-expanded lane-packed
    planes [1920, n/32] — used on the CPU backend, where XLA:CPU's
    compile time on the in-program schedule chain is pathological.

    With use_pallas=True the AES keystream runs as the fused Pallas kernel
    (state stays in VMEM across rounds) instead of the XLA op pipeline.

    With tp_axis set the program is a shard_map BODY on a (dp, tp) mesh:
    n_lanes is the per-dp-rank lane count, s32 is the rank's LOCAL secret
    slice (P(tp_axis)), and the LPN contraction runs tensor-parallel with
    one psum of partial parities (lpn.cores_from_streams_tp).

    With derive_layout set (an lpn.derive_layout MsgLayout; requires
    expand_on_device), the AES keys themselves derive ON DEVICE: the
    signature becomes (tmpl [nb*16] u32, seeds3 [n, 3, 2] u32, dh [n, 2]
    u32, s32) and both the main and Toeplitz keys come from in-program
    SHA-256 over the shipped seed fields — raw seeds cost ~3x less link
    transfer than two 32-byte keys per core, and the host SHA pass
    disappears.  tmpl carries the keypair-dependent message prefix as
    DATA so the compiled HLO is keypair-independent.
    """
    nblocks = lpn.n_ybits_blocks(prm)

    def _keystream_words(k_in, nlo, nhi, nb):
        if expand_on_device:
            rk_packed = aesv.expand_keys_packed_xp(k_in)
            # materialization fence: keeps fusion from duplicating the
            # 52-step schedule chain into each round's consumers
            rk_packed = jax.lax.optimization_barrier(rk_packed)
        else:
            rk_packed = k_in
        rk = aesv.rk_masks_from_packed(rk_packed, n_lanes)
        if aes_fused and nb >= 32 and n_lanes % 128 == 0:
            # fused Pallas tile kernel: bitsliced state stays in VMEM
            # across all 14 rounds (measured 2.5x the XLA op pipeline at
            # the PRF shape — docs/roofline.json aes_ctr_keystream[fused]);
            # the single-block Toeplitz stream stays on the XLA path where
            # the kernel's G padding would be all waste.
            from ..crypto import aes_fused as AF

            return AF.aes_ctr_keystream_fused(rk, nlo, nhi, nb)
        if use_pallas:
            from ..crypto import aes_pallas

            rk_lanes = jnp.moveaxis(rk, -1, 0)  # [N, 15, 16, 8]
            return aes_pallas.aes_ctr_keystream_pallas(rk_lanes, nlo, nhi, nb)
        if aes_gn:
            # G-major plane layout: N (a multiple of 128) on the VPU lane
            # axis instead of G = ceil(nb/32) (129 for the PRF shape ->
            # 256-lane tiles, ~2x wasted lanes and fusion-boundary HBM)
            planes = aesv.counters_to_planes_gn(nlo, nhi, nb)
            out = aesv.encrypt_planes_gn(rk, planes)
            return aesv.planes_to_words_gn(out, nb)
        planes = aesv.counters_to_planes(nlo, nhi, nb)
        out = aesv.encrypt_planes(rk, planes)
        return aesv.planes_to_words(out, nb)

    fused_ok = aes_fused and n_lanes % 128 == 0

    def core(rk_packed, nlo, nhi, trk_packed, tnlo, tnhi, s32):
        twords = _keystream_words(trk_packed, tnlo, tnhi, 1)  # [N, 1, 4]
        tlo = twords[:, :, 0::2].reshape(n_lanes, -1)
        thi = twords[:, :, 1::2].reshape(n_lanes, -1)
        top_u = jnp.stack([tlo, thi], axis=-1)  # [N, 2, 2]

        if fused_ok and tp_axis is None:
            # plane-major fused keystream consumed directly (no [N, B, 4]
            # transpose of the ~67 MB materialized stream)
            from ..crypto import aes_fused as AF

            if expand_on_device:
                rk_packed = jax.lax.optimization_barrier(
                    aesv.expand_keys_packed_xp(rk_packed))
            rk = aesv.rk_masks_from_packed(rk_packed, n_lanes)
            words_t = AF.aes_ctr_keystream_fused_t(rk, nlo, nhi, nblocks)
            r, rej = lpn.cores_from_streams_t(words_t, top_u, s32, prm)
            return r, rej.any(axis=-1)

        words = _keystream_words(rk_packed, nlo, nhi, nblocks)  # [N, B, 4]
        lo = words[:, :, 0::2].reshape(n_lanes, -1)
        hi = words[:, :, 1::2].reshape(n_lanes, -1)
        u64s = jnp.stack([lo, hi], axis=-1)  # [N, 2*nblocks, 2]

        if tp_axis is None:
            r, rej = lpn.cores_from_streams(u64s, top_u, s32, prm)
        else:
            r, rej = lpn.cores_from_streams_tp(u64s, top_u, s32, prm,
                                               axis_name=tp_axis)
        return r, rej.any(axis=-1)

    if derive_layout is None:
        return core

    assert expand_on_device, "device key derivation implies device expansion"
    TOEP = lpn.DOM_HASH[lpn.Dom.TOEP]
    toep_c = np.array([TOEP & 0xFFFFFFFF, TOEP >> 32], dtype=U32)

    def run_derive(tmpl, f3, dh, s32):
        n = f3.shape[0]
        tc = jnp.asarray(toep_c)
        f_main = jnp.concatenate([f3, dh[:, None, :]], axis=1)  # [n, 4, 2]
        f_toep = jnp.concatenate(
            [f3, jnp.broadcast_to(tc[None, None, :], (n, 1, 2))], axis=1)
        keys = lpn.derive_keys_xp(derive_layout, tmpl, f_main)
        tkeys = lpn.derive_keys_xp(derive_layout, tmpl, f_toep)
        # nonce = dom_hash ^ seed.nonce.lo; toep nonce = (TOEP ^ lo) ^ dom
        nlo = dh[:, 0] ^ f3[:, 1, 0]
        nhi = dh[:, 1] ^ f3[:, 1, 1]
        tnlo = tc[0] ^ f3[:, 1, 0] ^ dh[:, 0]
        tnhi = tc[1] ^ f3[:, 1, 1] ^ dh[:, 1]
        return core(keys, nlo, nhi, tkeys, tnlo, tnhi, s32)

    return run_derive


class DeviceEngine:
    """Holds device-resident key material and jit caches for one (pk, sk).

    sk material on device is limited to the LPN secret bit-vector (needed by
    the row-parity kernel); AES round keys are expanded host-side per call
    and shipped in packed (lane-compressed) form.
    """

    def __init__(self, pk: PubKey, sk: SecKey | None = None, device=None,
                 use_pallas: bool | None = None, mesh: Mesh | None = None):
        self.pk = pk
        self.prm = pk.prm
        # Multi-chip mode: a 1-D mesh (or any mesh passed with one axis)
        # becomes a pure "dp" axis — every engine program is lane-/edge-
        # parallel with zero cross-lane dependencies, so GSPMD shards the
        # batch axis over all chips with no collectives and key material
        # (H, LPN secret, layer seed tables) is replicated.
        #
        # A 2-D mesh is treated as ("dp", "tp") and additionally runs σ
        # generation TENSOR-parallel: H lives column-sharded P(None, "tp")
        # (each chip holds m_bits/tp of every H row) and the σ gather-XOR
        # partitions over the word axis with zero collectives — the draw
        # streams are recomputed per tp rank (cheap VPU work) while the
        # HBM-heavy H traffic and σ residency split tp-ways.
        if mesh is not None:
            marr = np.asarray(mesh.devices)
            if marr.ndim == 2 and marr.shape[1] > 1:
                self.mesh = Mesh(marr, axis_names=("dp", "tp"))
                self.tp = marr.shape[1]
                self.n_dev = marr.shape[0]  # dp extent (lane padding)
            else:
                self.mesh = Mesh(marr.reshape(-1), axis_names=("dp",))
                self.tp = 1
                self.n_dev = marr.size
            self.device = marr.reshape(-1)[0]
            self._repl = NamedSharding(self.mesh, P())
            self._dp = lambda *rest: NamedSharding(self.mesh, P("dp", *rest))
        else:
            self.mesh = None
            self.tp = 1
            self.n_dev = 1
            self.device = device or jax.devices()[0]
        import os

        # Kernel selection: env var > measured autotune (benchmarks/
        # roofline.py, the reference-autotuner analogue of
        # crypto/toeplitz.hpp:202-257) > platform heuristic.  Autotune
        # results were measured on an accelerator, so they only apply there.
        tuned = _load_autotune() if self.device.platform != "cpu" else {}
        if use_pallas is None:
            env = os.environ.get("PVAC_PALLAS")
            if env is not None:
                use_pallas = env == "1"
            else:
                use_pallas = bool(tuned.get("use_pallas", False))
        self.use_pallas = use_pallas
        # AES bitsliced plane layout (see prf_program): measured autotune
        # choice, env-overridable like the other kernel selections.
        env_gn = os.environ.get("PVAC_AES_GN")
        if env_gn is not None:
            self.aes_gn = env_gn == "1"
        else:
            self.aes_gn = bool(tuned.get("aes_gn", False))
        # Fused Pallas AES tile kernel (crypto/aes_fused.py): default on
        # for accelerators (measured 2.5x the XLA op pipeline), off on CPU
        # where Pallas TPU kernels can't run.
        env_af = os.environ.get("PVAC_AES_FUSED")
        if env_af is not None:
            self.aes_fused = env_af == "1"
        elif "aes_fused" in tuned:
            self.aes_fused = bool(tuned["aes_fused"])
        else:
            self.aes_fused = self.device.platform != "cpu"
        # Device-side AES key-schedule expansion (8x less link transfer);
        # XLA:CPU compiles the in-program schedule pathologically, so CPU
        # engines keep host expansion.
        self._expand_dev = self.device.platform != "cpu"
        # Device-side key DERIVATION (in-program SHA-256 over shipped
        # seeds): implies device expansion, so accelerator-only too.
        self._derive_dev = self._expand_dev and sk is not None
        if self._derive_dev:
            self._dlayout = lpn.derive_layout(pk, sk)
            self._tmpl_dev = self._put_repl(self._dlayout.template_words())
        # Fused Pallas SHA-256 for the σ choose_k streams: default on for
        # accelerator devices (the XLA op-per-round path is ~100x off VPU
        # speed of light), off on CPU where Pallas TPU kernels can't run.
        env_sha = os.environ.get("PVAC_PALLAS_SHA")
        if env_sha is not None:
            self.use_pallas_sha = env_sha == "1"
        elif "use_pallas_sha" in tuned:
            self.use_pallas_sha = bool(tuned["use_pallas_sha"])
        else:
            self.use_pallas_sha = self.device.platform != "cpu"
        # Fused one-hot noise kernel for σ (crypto/onehot_pallas.py):
        # measured 1.87x the XLA compare-select-sum stage STANDALONE, but
        # ~4% SLOWER inside the production queued σ pipeline (A/B ct_mul
        # batch 128: 719.3 vs 687.3 ops/s) — the XLA stage's VPU work
        # hides under the gather DMAs, and the custom call breaks that
        # overlap.  Default OFF (reference + env/autotune hooks kept, like
        # the retired Pallas AES of round 4); also a GSPMD-sharded mesh
        # program could not partition the custom call anyway.
        env_oh = os.environ.get("PVAC_PALLAS_ONEHOT")
        if env_oh is not None:
            self.use_pallas_onehot = env_oh == "1"
        elif "pallas_onehot" in tuned:
            self.use_pallas_onehot = bool(tuned["pallas_onehot"])
        else:
            self.use_pallas_onehot = False
        # σ gather table = H plus one all-zero row at index n_bits:
        # masked-out draws gather the zero row, so the XOR accumulation
        # needs no select.  (A round-5 experiment appended single-bit
        # identity rows so the noise stream shared the gather path; the
        # side-by-side measurement, docs/session_r5c.json, showed the
        # one-hot compare noise stage is ~2x FASTER than gathering 144
        # 1 KB identity rows — gathers are DMA-descriptor-bound — so the
        # one-hot stage stays.)
        if pk.H is not None:
            mw = pk.H.shape[1]
            self.Hx_dev = self._put_H(
                np.concatenate(
                    [pk.H, np.zeros((1, mw), dtype=pk.H.dtype)])
            )
        else:
            self.Hx_dev = None
        if sk is not None:
            s32 = sk.s_words32().reshape(-1)
            # LPN-tp: the secret lives sharded P('tp') so the PRF
            # contraction — the hottest HBM read (SURVEY §6) — splits
            # tp-ways in the real prf program (see _prf_fn).  The guard is
            # on s_words64 (u64 words), not the flat u32 count: each rank's
            # slice must hold whole (lo, hi) u64 pairs, or the contraction
            # would misalign pairs and silently drop secret words.
            self._s32_tp = (self.tp > 1
                            and self.prm.s_words64 % self.tp == 0)
            # the fused AES Pallas call has no GSPMD partitioning rule:
            # allow it only where the program is single-device or a
            # shard_map body (manual SPMD — per-device programs)
            if (self.aes_fused and self.mesh is not None
                    and self.mesh.size > 1 and not self._s32_tp):
                self.aes_fused = False
            if self._s32_tp:
                self.s32_dev = jax.device_put(
                    s32, NamedSharding(self.mesh, P("tp")))
            else:
                self.s32_dev = self._put_repl(s32)
        else:
            self.s32_dev = None
            self._s32_tp = False
        self._canon2 = self._put_repl(
            np.array(
                [pk.canon_tag & 0xFFFFFFFF, (pk.canon_tag >> 32) & 0xFFFFFFFF],
                dtype=U32,
            )
        )
        self._prf_fn_cache = {}
        self._sigma_fn_cache = {}
        self._mulgrid = None
        # σ dispatch pipeline: a bounded queue of in-flight chunk handles.
        # Every synchronized device call costs a full link round trip
        # (~25-50 ms measured on the tunneled backend — comparable to the
        # ~11 ms of actual σ compute per 8192-edge chunk), so the round-1..3
        # one-deep throttle, which waited for the PREVIOUS dispatch before
        # enqueuing the next, serialized the whole pipeline at one round
        # trip per chunk (~170k edges/s).  Instead, chunks queue freely up
        # to SIGMA_QUEUE_DEPTH and the throttle waits on the OLDEST
        # outstanding chunk only — the queue stays full, dispatch overhead
        # amortizes, and measured throughput is ~560k+ edges/s.  The depth
        # bound still matters: unbounded queueing on the tunneled link was
        # measured 3x slower (round 3), and each in-flight chunk pins
        # ~8 MB of device σ output.
        self._sigma_queue = []
        # σ chunk failures observed by the pacing throttle: the op that
        # dispatched the chunk has already returned a Cipher, so the
        # failure is recorded here and re-raised at the next drain()
        # (every benchmark window and materialization barrier) instead of
        # being lost as a warning in a long run.
        self._sigma_failures: list[Exception] = []

    # ------------------------------------------------------------------
    # placement helpers (single-device vs dp mesh)
    # ------------------------------------------------------------------

    def _put_repl(self, arr):
        """Device-put with full replication (mesh) / plain put (1 device)."""
        if self.mesh is not None:
            return jax.device_put(arr, self._repl)
        return jax.device_put(arr, self.device)

    def _put_H(self, arr):
        """H placement: column-sharded over the tp axis when one exists
        (each chip holds m_bits/tp of every row), replicated otherwise."""
        if self.mesh is not None and self.tp > 1:
            return jax.device_put(
                arr, NamedSharding(self.mesh, P(None, "tp")))
        return self._put_repl(arr)

    @property
    def H_dev(self):
        """Routing flag kept for callers that check device-σ availability
        (matrix.sigma_words_start); the gather table subsumes H."""
        return self.Hx_dev

    @property
    def _wsp(self):
        """σ word-axis partition: 'tp' on a 2-D mesh, else unsharded."""
        return "tp" if self.tp > 1 else None

    def _jit(self, fn, in_specs=None, out_specs=None):
        """jit pinned to the engine's device, or GSPMD-sharded over the dp
        mesh when one is attached (in/out_specs are PartitionSpecs)."""
        if self.mesh is None:
            # jax.default_device (not the deprecated jit(device=...) arg,
            # whose legacy lowering path compiles the in-program AES key
            # schedule pathologically slowly) pins uncommitted inputs and
            # execution to the engine's device.
            jfn = jax.jit(fn)
            dev = self.device

            def call(*args):
                with jax.default_device(dev):
                    return jfn(*args)

            return call

        def ns(sp):
            # PartitionSpec subclasses tuple — check it before containers
            if isinstance(sp, P):
                return NamedSharding(self.mesh, sp)
            return tuple(ns(s) for s in sp)

        return jax.jit(fn, in_shardings=ns(in_specs), out_shardings=ns(out_specs))

    def _pad_lanes(self, n: int) -> int:
        """Lane padding: pow2, and in mesh mode a multiple of 32*n_dev so
        the lane-packed [1920, n/32] AES mask layout splits evenly."""
        return _pad_pow2(n, lo=32 * _pad_pow2(self.n_dev, 1))

    @property
    def mulgrid(self):
        """Dense-grid ct_mul program cache (parallel/mulgrid.py), lazy.

        In mesh mode the grid's independent layer blocks round-robin over
        every mesh device (block outputs are disjoint — no collectives)."""
        if self._mulgrid is None:
            from .mulgrid import MulGrid

            devs = (list(np.asarray(self.mesh.devices).reshape(-1))
                    if self.mesh is not None else [self.device])
            self._mulgrid = MulGrid(self.prm, devs)
        return self._mulgrid

    # ------------------------------------------------------------------
    # prf_R cores
    # ------------------------------------------------------------------

    def _prf_fn(self, n_pad: int, derive: bool = False):
        key = (n_pad, derive)
        fn = self._prf_fn_cache.get(key)
        if fn is not None:
            return fn
        layout = self._dlayout if derive else None
        # keys input layout depends on where the schedule expands:
        # raw [n, 32] u8 (device expansion) -> dp over the lane axis;
        # packed planes [1920, n/32] (host expansion) -> dp over columns.
        # In derive mode the inputs are (tmpl, seeds3, dh) instead.
        kspec = P("dp", None) if self._expand_dev else P(None, "dp")
        if derive:
            specs_tp = (P(), P("dp", None, None), P("dp", None), P("tp"))
            specs_dp = (P(), P("dp", None, None), P("dp", None), P())
        else:
            specs_tp = (kspec, P("dp"), P("dp"),
                        kspec, P("dp"), P("dp"), P("tp"))
            specs_dp = (kspec, P("dp"), P("dp"),
                        kspec, P("dp"), P("dp"), P())
        if self.mesh is not None and self._s32_tp:
            # Real-ops LPN-tp: shard_map over (dp, tp) with the secret
            # sharded P('tp'); each rank ANDs its word slice of every
            # sample row and partial parities combine with one psum
            # (lpn.cores_from_streams_tp; pattern proven in sharding.py).
            nloc = n_pad // self.n_dev
            body = prf_program(self.prm, nloc, self.use_pallas,
                               tp_axis="tp",
                               expand_on_device=self._expand_dev,
                               derive_layout=layout, aes_gn=self.aes_gn,
                               aes_fused=self.aes_fused)
            fn = jax.jit(jax.shard_map(
                body, mesh=self.mesh,
                in_specs=specs_tp,
                out_specs=(P("dp", None), P("dp")),
                check_vma=False,
            ))
        else:
            fn = self._jit(
                prf_program(self.prm, n_pad, self.use_pallas,
                            expand_on_device=self._expand_dev,
                            derive_layout=layout, aes_gn=self.aes_gn,
                            aes_fused=self.aes_fused),
                in_specs=specs_dp,
                out_specs=(P("dp", None), P("dp")),
            )
        self._prf_fn_cache[key] = fn
        return fn

    # Re-measured after the fused AES kernel (the r5 session-E sweep that
    # picked 1024 predates it): PRF-only 8K-core workload 144k/161k/147k
    # cores/s at 1024/2048/4096; end-to-end enc 2059->2197 ct/s, dec flat
    # (3007 vs 2951, RTT noise).  2048 amortizes the ~4 ms/chunk host+link
    # dispatch cost the 3.15 ms compiled program no longer hides.
    PRF_CHUNK = 2048

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
        C = self.PRF_CHUNK * self.n_dev
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

    def prf_cores_async_seeds(self, seeds_u64: np.ndarray,
                              dom_hashes: np.ndarray):
        """Derive-on-device prf cores: seeds_u64 [N, 3] u64 + dom_hashes
        [N] u64 ship raw (no host SHA, no key bytes) and the device derives
        both AES keys in-program.  Same chunked no-sync dispatch contract
        as :meth:`prf_cores_async`."""
        N = seeds_u64.shape[0]
        C = self.PRF_CHUNK * self.n_dev
        if N > C:
            rs, rejs = [], []
            for off in range(0, N, C):
                r, rej = self._prf_chunk_seeds(
                    seeds_u64[off : off + C], dom_hashes[off : off + C])
                rs.append(r)
                rejs.append(rej)
            return jnp.concatenate(rs), jnp.concatenate(rejs)
        return self._prf_chunk_seeds(seeds_u64, dom_hashes)

    def _prf_chunk_seeds(self, seeds_u64, dom_hashes):
        N = seeds_u64.shape[0]
        n_pad = self._pad_lanes(N)
        f3 = np.zeros((n_pad, 3, 2), dtype=U32)
        f3[:N, :, 0] = (seeds_u64 & np.uint64(0xFFFFFFFF)).astype(U32)
        f3[:N, :, 1] = (seeds_u64 >> np.uint64(32)).astype(U32)
        dh = np.zeros((n_pad, 2), dtype=U32)
        dh[:N, 0] = (dom_hashes & np.uint64(0xFFFFFFFF)).astype(U32)
        dh[:N, 1] = (dom_hashes >> np.uint64(32)).astype(U32)
        r, rej = self._prf_fn(n_pad, derive=True)(
            self._tmpl_dev, f3, dh, self.s32_dev)
        return r[:N], rej[:N]

    def prf_cores(self, keys: np.ndarray, nonces: np.ndarray,
                  toep_keys: np.ndarray, toep_nonces: np.ndarray):
        """Synchronous prf_cores_async -> (numpy limbs, numpy rej)."""
        r, rej = self.prf_cores_async(keys, nonces, toep_keys, toep_nonces)
        return np.asarray(r), np.asarray(rej)

    def _prf_chunk(self, keys, nonces, toep_keys, toep_nonces):
        """One padded chunk -> device-resident (limbs, rej); no host sync.

        On accelerators the raw 32-byte keys ship to the device and the
        AES-256 schedule expands in-program (prf_program); the CPU backend
        keeps host expansion (see prf_program docstring)."""
        N = keys.shape[0]
        n_pad = self._pad_lanes(N)

        def prep(kb, nn):
            kb_p = np.zeros((n_pad, 32), dtype=np.uint8)
            kb_p[:N] = kb
            k_in = kb_p if self._expand_dev else aesv.expand_keys_packed(kb_p)
            nlo = np.zeros(n_pad, dtype=U32)
            nhi = np.zeros(n_pad, dtype=U32)
            nlo[:N] = (nn & np.uint64(0xFFFFFFFF)).astype(U32)
            nhi[:N] = (nn >> np.uint64(32)).astype(U32)
            return k_in, nlo, nhi

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
        pallas_onehot = self.use_pallas_onehot

        mw = prm.sigma_words32

        def run(Hx, lanes):
            return self._sigma_from_lanes(Hx, lanes, prm, pallas_sha, mw,
                                          pallas_onehot)

        fn = self._jit(
            run,
            in_specs=(P(None, self._wsp), P("dp", None, None)),
            out_specs=(P("dp", self._wsp), P("dp")),
        )
        self._sigma_fn_cache[n_pad] = fn
        return fn

    @staticmethod
    def _sigma_from_lanes(Hx, lanes, prm, pallas_sha, mw,
                          pallas_onehot=False):
        # Hx = the unified gather table (see __init__): H columns, then an
        # all-zero row at index n_bits (masked-out draws land there, so the
        # XOR accumulation needs no select), then single-bit identity rows
        # so the noise stream shares the same gather-XOR path.
        cvals, ctake, fb1 = shactr.draws_and_take(
            prm.x_col_wt, prm.n_bits, "pvac.dom.x_seed", lanes,
            pallas_sha=pallas_sha,
        )
        nvals, ntake, fb2 = shactr.draws_and_take(
            prm.err_wt, prm.m_bits, "pvac.dom.noise", lanes,
            pallas_sha=pallas_sha,
        )
        # XOR of the selected H columns, order-free: thin gathers over all
        # D draws with non-selected draws redirected to the zero row.
        # Serial vs 8-way interleaved chains measured identical (XLA
        # reassociates; docs/session_r5b.json), so keep the simple chain.
        idx = jnp.where(ctake, cvals, np.int32(prm.n_bits))
        sig = Hx[idx[:, 0]]
        for j in range(1, idx.shape[1]):
            sig = sig ^ Hx[idx[:, j]]
        # noise bits via fused one-hot accumulation (selected values are
        # unique -> bits disjoint -> sum == xor).  Measured the FASTEST of
        # four variants at this shape — one-hot compare ~6 ms vs ~12 ms of
        # identity-row gathers, ~28 ms scatter-add, ~29 ms sort-compaction
        # (docs/session_r5c.json: v3 18.18 ms/16K edges vs v0 26.54).
        word = nvals // 32                      # [N, D]
        bit = (nvals % 32).astype(U32)
        masks = jnp.where(ntake, (U32(1) << bit).astype(U32), U32(0))
        if (pallas_onehot and word.shape[0] % 256 == 0 and mw % 128 == 0):
            # fused VMEM accumulator kernel — ~2x the XLA compare-select-
            # sum at the chunk shape (taken values are unique per edge so
            # XOR == the sum; crypto/onehot_pallas.py)
            from ..crypto import onehot_pallas as OH

            contrib = OH.onehot_noise_words(word, masks, mw)
        else:
            hit = (word[:, :, None]
                   == jnp.arange(mw, dtype=np.int32)[None, None, :])
            contrib = jnp.where(hit, masks[:, :, None], U32(0)).sum(
                axis=1, dtype=U32
            )
        return sig ^ contrib, fb1 | fb2

    def _sigma_compact_fn(self, n_pad: int, u_pad: int):
        """Compact-transfer σ program: per-edge data arrives as one packed
        u32 (layer-slot<<11 | idx<<1 | ch) plus a u64 salt, and per-layer
        seeds as a [U, 3, 2] u32 table — ~12 B/edge over the host link
        instead of 56 B/edge of expanded lane words.  Lane expansion (layer
        gather + field stacking) happens on device."""
        key = (n_pad, u_pad)
        fn = self._sigma_fn_cache.get(key)
        if fn is not None:
            return fn
        prm = self.prm
        pallas_sha = self.use_pallas_sha
        pallas_onehot = self.use_pallas_onehot
        mw = prm.sigma_words32

        def run(Hx, canon2, ltab, buf):
            # buf: [E, 3] u32 = (packed, salt_lo, salt_hi); canon2 [2] u32.
            # canon_tag is an INPUT, not a closure constant — baking it in
            # would give every keypair a different HLO and defeat the
            # persistent compile cache across keygens.
            E = buf.shape[0]
            packed = buf[:, 0]
            lid = (packed >> U32(11)).astype(np.int32)
            idx = (packed >> U32(1)) & U32(0x3FF)
            ch = packed & U32(1)
            zero = jnp.zeros((E,), dtype=jnp.uint32)
            seeds = ltab[lid]  # [E, 3, 2]
            lanes = jnp.stack(
                [
                    jnp.broadcast_to(canon2[None, :], (E, 2)),
                    seeds[:, 0], seeds[:, 1], seeds[:, 2],
                    jnp.stack([idx, zero], -1),
                    jnp.stack([ch, zero], -1),
                    buf[:, 1:3],
                ],
                axis=1,
            )  # [E, 7, 2]
            return self._sigma_from_lanes(Hx, lanes, prm, pallas_sha, mw,
                                          pallas_onehot)

        fn = self._jit(
            run,
            in_specs=(P(None, self._wsp), P(None), P(None, None, None),
                      P("dp", None)),
            out_specs=(P("dp", self._wsp), P("dp")),
        )
        self._sigma_fn_cache[key] = fn
        return fn

    SIGMA_CHUNK = 16384

    def sigma(self, words: np.ndarray, tab=None):
        """Chunked σ generation: big batches run as repeats of one compiled
        16384-lane program plus one pow2-padded remainder call, instead of
        padding the whole batch to the next power of two.

        All chunks are dispatched back-to-back with no host sync in between
        (the device link's ~30 ms round trip would otherwise dominate).

        Returns ``(sig, fb, rows)`` where sig/fb keep each chunk's PADDED
        lanes and ``rows`` (host int64 [E]) indexes the valid lanes.  The
        padding is deliberately NOT sliced off on device: edge counts
        jitter batch to batch, so a device-side ``[:E]`` slice compiles a
        fresh tiny XLA program (~0.4 s on this backend) for every novel E —
        a recurring compile tax that dominated warm encryption batches.
        Consumers gather ``rows`` host-side at materialization instead.
        """
        E = words.shape[0]
        C = self.SIGMA_CHUNK * self.n_dev
        if E == 0:
            mw = self.prm.sigma_words32
            return (np.zeros((0, mw), dtype=U32), np.zeros(0, dtype=bool),
                    np.zeros(0, dtype=np.int64))

        # Compact transfer form: the (ztag, nonce_lo, nonce_hi) triple is
        # per-layer (few distinct values per batch); ship the deduplicated
        # seed table + one packed u32 and a u64 salt per edge.
        compact = None
        if (
            E > 0
            and (words[:, 0] == np.uint64(self.pk.canon_tag)).all()
            and (words[:, 4] < np.uint64(1024)).all()
            and (words[:, 5] < np.uint64(2)).all()
        ):
            if tab is not None:
                # caller supplied the (layer seed table, per-edge row) pair
                # it already owns — skip the structured-sort dedup, the
                # single biggest host cost of a warm dispatch
                trips = np.ascontiguousarray(tab[0], dtype=np.uint64)
                lid = np.asarray(tab[1])
            else:
                trips, lid = np.unique(words[:, 1:4], axis=0,
                                       return_inverse=True)
                lid = lid.reshape(-1)  # numpy 2.0: [E, 1] for axis unique
            if trips.shape[0] < (1 << 21):
                ltab = np.stack(
                    [(trips & np.uint64(0xFFFFFFFF)).astype(U32),
                     (trips >> np.uint64(32)).astype(U32)],
                    axis=-1,
                )  # [U, 3, 2]
                # coarse padding grid: u_pad only grows in 8x steps so the
                # jit cache key (n_pad, u_pad) stays stable across batches
                u_pad = 128
                while u_pad < ltab.shape[0]:
                    u_pad *= 8
                ltab_p = np.zeros((u_pad, 3, 2), dtype=U32)
                ltab_p[: ltab.shape[0]] = ltab
                ltab_dev = self._put_repl(jnp.asarray(ltab_p))
                buf = np.empty((E, 3), dtype=U32)
                buf[:, 0] = (
                    (lid.astype(np.uint32) << U32(11))
                    | (words[:, 4].astype(np.uint32) << U32(1))
                    | words[:, 5].astype(np.uint32)
                )
                buf[:, 1] = (words[:, 6] & np.uint64(0xFFFFFFFF)).astype(U32)
                buf[:, 2] = (words[:, 6] >> np.uint64(32)).astype(U32)
                compact = (ltab_dev, u_pad, buf)

        sigs = []
        fbs = []
        row_parts = []
        pad_off = 0
        for off in range(0, E, C):
            self._throttle()
            n_valid = min(C, E - off)
            if compact is not None:
                ltab_dev, u_pad, buf = compact
                s, f = self._sigma_compact_padded(
                    ltab_dev, u_pad, buf[off : off + C]
                )
            else:
                s, f = self._sigma_padded(words[off : off + C])
            sigs.append(s)
            fbs.append(f)
            row_parts.append(pad_off + np.arange(n_valid, dtype=np.int64))
            pad_off += int(s.shape[0])
            self._sigma_queue.append(f[:1])
        sig = sigs[0] if len(sigs) == 1 else jnp.concatenate(sigs, axis=0)
        fb = fbs[0] if len(fbs) == 1 else jnp.concatenate(fbs, axis=0)
        rows = (row_parts[0] if len(row_parts) == 1
                else np.concatenate(row_parts))
        return sig, fb, rows  # device-resident; callers fetch when needed

    # In-flight σ chunk bound (~16 MB device output per 16K-edge chunk at
    # default Params -> ~768 MB ceiling on a 16 GB v5e).  Measured sweep
    # (ct_mul batch 512 = 38 chunks): depth 12 -> 384 ops/s, 24 -> 427,
    # 48 -> 545 — deep enough that a whole large batch dispatches without
    # stalling, while still bounding runaway queueing on the tunnel.
    SIGMA_QUEUE_DEPTH = 48

    def drain(self) -> None:
        """Wait for every queued σ chunk (the queue is in-order, so waiting
        on the newest completes them all).  Benchmarks call this so a timed
        window cannot hide still-in-flight σ work.  Re-raises any chunk
        failure the pacing throttle observed since the last drain — chunk
        programs are independent, so a dead chunk does NOT fail the newest
        handle and would otherwise vanish into a warning."""
        if self._sigma_queue:
            last = self._sigma_queue[-1]
            self._sigma_queue.clear()
            np.asarray(last)
        if self._sigma_failures:
            errs, self._sigma_failures = self._sigma_failures, []
            raise RuntimeError(
                f"{len(errs)} queued sigma chunk(s) failed since the last "
                f"drain; first failure: {errs[0]!r}"
            ) from errs[0]

    def _throttle(self) -> None:
        """Bound the σ dispatch queue: wait on the OLDEST outstanding chunk
        (never the newest — that would drain the whole in-order queue and
        cost one link round trip per chunk)."""
        while len(self._sigma_queue) >= self.SIGMA_QUEUE_DEPTH:
            old = self._sigma_queue.pop(0)
            try:
                np.asarray(old)
            except Exception as e:  # noqa: BLE001
                # The throttle fetch is advisory (its only job is pacing),
                # but a failure here usually means that σ chunk's program
                # died.  Record it for the next drain() to re-raise (the
                # dispatching op has already returned its Cipher) and warn
                # immediately so the trace isn't lost if nobody drains.
                import warnings

                self._sigma_failures.append(e)
                warnings.warn(
                    f"queued sigma chunk failed during throttle wait "
                    f"(will re-raise at drain): {e!r}",
                    RuntimeWarning, stacklevel=2,
                )

    def _sigma_compact_padded(self, ltab_dev, u_pad: int, buf: np.ndarray):
        """One padded chunk -> PADDED (sig [n_pad, mw], fb [n_pad]); valid
        lanes are the first buf.shape[0] (no device-side slice — see
        :meth:`sigma`)."""
        E = buf.shape[0]
        n_pad = self._pad_lanes(E)
        bp = buf
        if n_pad != E:
            bp = np.zeros((n_pad, 3), dtype=U32)
            bp[:E] = buf
        return self._sigma_compact_fn(n_pad, u_pad)(
            self.Hx_dev, self._canon2, ltab_dev, jnp.asarray(bp)
        )

    def _sigma_padded(self, words: np.ndarray):
        """words [E, 7] uint64 (σ stream fields) -> PADDED (σ [n_pad, mw]
        uint32, fallback [n_pad] bool), both device-resident jax arrays
        (no host sync, no device-side slice — see :meth:`sigma`).

        σ stays on the accelerator; consumers that need host bytes
        (serialization, edge compaction) convert lazily.  Decryption and
        further homomorphic ops never read σ on the host, so op chains
        avoid the device->host transfer entirely.
        """
        E = words.shape[0]
        n_pad = self._pad_lanes(E)
        wp = np.zeros((n_pad, 7), dtype=np.uint64)
        wp[:E] = words
        lanes = np.stack(
            [(wp & np.uint64(0xFFFFFFFF)).astype(U32),
             (wp >> np.uint64(32)).astype(U32)],
            axis=-1,
        )
        return self._sigma_fn(n_pad)(self.Hx_dev, jnp.asarray(lanes))


def enable_device(pk: PubKey, sk: SecKey | None = None, device=None,
                  use_pallas: bool | None = None,
                  mesh: Mesh | None = None) -> DeviceEngine:
    """Attach a DeviceEngine to pk; ops route hot kernels through it.

    Pass ``mesh`` to run every engine program sharded over the mesh's
    devices (data-parallel over lanes/edges, key material replicated)."""
    eng = DeviceEngine(pk, sk, device, use_pallas=use_pallas, mesh=mesh)
    pk._engine = eng
    return eng


def disable_device(pk: PubKey) -> None:
    if hasattr(pk, "_engine"):
        del pk._engine
