"""Profiling / tracing helpers (aux-subsystem parity: the reference's
ad-hoc chrono micro-benchmarks, tests/test_main.cpp:137-143, and the
Toeplitz autotuner's self-timing, crypto/toeplitz.hpp:219-247).

- :func:`bench_us`: median-of-reps wall-time for a thunk (host+device,
  blocks on jax outputs).
- :func:`trace`: context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace directory.
- :func:`op_report`: timing table for the standard op set of a keypair.
"""
from __future__ import annotations

import contextlib
import time


def bench_us(fn, reps: int = 5, warmup: int = 1) -> float:
    """Median wall-time of fn() in microseconds (blocks jax arrays)."""
    import jax

    def run_once():
        t0 = time.perf_counter()
        out = fn()
        try:
            jax.block_until_ready(out)
        except Exception:
            pass
        return (time.perf_counter() - t0) * 1e6

    for _ in range(warmup):
        run_once()
    times = sorted(run_once() for _ in range(reps))
    return times[len(times) // 2]


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def op_report(pk, sk, batch: int = 8) -> dict:
    """Timing table (µs/op) for the core op set; returns a dict and prints
    a small table."""
    from .. import (
        ct_add, ct_mul_batch, dec_value_batch, enc_value_batch,
    )

    out = {}
    cts = enc_value_batch(pk, sk, list(range(batch)))  # warm
    out["enc_value_us"] = bench_us(
        lambda: enc_value_batch(pk, sk, list(range(batch)))) / batch
    out["dec_value_us"] = bench_us(
        lambda: dec_value_batch(pk, sk, cts)) / batch
    out["ct_add_us"] = bench_us(lambda: ct_add(pk, cts[0], cts[1]))
    pairs = [(cts[i], cts[(i + 1) % batch]) for i in range(batch)]
    ct_mul_batch(pk, pairs[:1])  # warm
    out["ct_mul_us"] = bench_us(lambda: ct_mul_batch(pk, pairs)) / batch
    for k, v in out.items():
        print(f"  {k:16s} {v:12.1f}")
    return out
