"""Pallas TPU kernel: fused one-hot noise-bit accumulation for σ.

The σ program's noise stage turns ``err_wt`` accepted draws per edge into
a [E, mw] u32 bit mask: draw value v sets bit v%32 of word v//32.  The
XLA form (compare against a word iota, select, sum over draws) is the
measured winner of four variants (docs/session_r5c.json) but still runs
~10x off the VPU ceiling: XLA's loop structure streams the [E, D, mw]
compare through fusion buffers at HBM cost.  This kernel keeps the
[E_b, mw] accumulator in VMEM and loops the D draws as straight vector
ops — compute-bound, no intermediate traffic.

Semantics: values among taken draws are unique per edge (first-occurrence
take mask, crypto/shactr.draws_and_take), so bits are disjoint and
XOR == OR == sum — bit-exact with the XLA one-hot-sum stage (verified in
tests/test_onehot_pallas.py and by σ golden interop on device).

Reference analogue: the noise half of sigma row generation,
include/pvac/crypto/matrix.hpp:267-303.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = np.uint32

E_B = 256  # edges per grid program


def _kernel(word_ref, mask_ref, out_ref):
    D = word_ref.shape[1]
    mw = out_ref.shape[1]
    iota = lax.broadcasted_iota(jnp.int32, (E_B, mw), 1)
    zero = jnp.zeros((E_B, mw), dtype=jnp.uint32)
    # accumulate through the output ref: the ref dependency sequentializes
    # the unrolled chain so Mosaic's scoped-vmem liveness stays O(1) tiles
    # (an acc-value chain made all 144 iterations' temporaries live at
    # once -> scoped vmem OOM)
    out_ref[:] = zero
    for j in range(D):
        wj = word_ref[:, j : j + 1]        # [E_B, 1] i32
        mj = mask_ref[:, j : j + 1]        # [E_B, 1] u32
        out_ref[:] = out_ref[:] ^ jnp.where(
            wj == iota, jnp.broadcast_to(mj, (E_B, mw)), zero)


def _call(word, masks, mw: int, interpret: bool):
    E, D = word.shape
    assert E % E_B == 0, E
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((E, mw), jnp.uint32),
        grid=(E // E_B,),
        in_specs=[
            pl.BlockSpec((E_B, D), lambda e: (e, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E_B, D), lambda e: (e, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((E_B, mw), lambda e: (e, 0),
                               memory_space=pltpu.VMEM),
        # the XLA:TPU scheduler stages the whole operands in scoped vmem
        # for this call shape regardless of blocking; the default 16 MB
        # scoped limit then OOMs at chunk shapes.  The v5e has far more
        # physical VMEM — raise the cap and let it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(word, masks)


@functools.partial(jax.jit, static_argnums=(2,))
def onehot_noise_words(word, masks, mw: int):
    """word: [E, D] int32 draw word indices; masks: [E, D] u32 (0 for
    masked-out draws, else 1 << (val % 32)); returns [E, mw] u32 with each
    taken draw's bit set.  E must be a multiple of 256."""
    return _call(word, masks, mw, False)


def onehot_noise_words_interpret(word, masks, mw: int):
    """Interpreter-mode entry for the CPU test suite."""
    return _call(word, masks, mw, True)
