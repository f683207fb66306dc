"""Batched weight computation vs the scalar reference path.

_weights_from_cores_batch must reproduce _weights_from_cores (the direct
port of encrypt.hpp:162-252) bit-exactly for every (z2, z3) noise plan,
including mixed-depth batches that split into multiple vector groups.
"""
import numpy as np
import pytest

import pvac_hfhe_cppbyv_tpu as pvac
from pvac_hfhe_cppbyv_tpu.core import fieldv as FV
from pvac_hfhe_cppbyv_tpu.crypto import lpn
from pvac_hfhe_cppbyv_tpu.ops import encrypt as E


def _plans_and_cores(pk, sk, values, depths):
    plans = [E._LayerPlan(pk, v, d) for v, d in zip(values, depths)]
    reqs, spans = [], []
    for p in plans:
        r = E._prf_requests(p)
        spans.append((len(reqs), len(r)))
        reqs.extend(r)
    seeds = np.array(
        [[s.ztag, s.nonce.lo, s.nonce.hi] for s, _ in reqs], dtype=np.uint64
    )
    dh = np.array([lpn.DOM_HASH[d] for _, d in reqs], dtype=np.uint64)
    cores = np.asarray(lpn.prf_cores_batch_start(pk, sk, seeds, dh)(),
                       dtype=np.uint32)
    for p in plans:
        E._draw_structure(pk, p)
    return plans, cores, spans


@pytest.mark.parametrize("depths", [[0, 0, 0, 0], [0, 1, 2, 5]])
def test_batch_matches_scalar(small_keys, depths):
    pk, sk = small_keys
    values = [7, 0, pvac.P - 1, 123456789]
    plans, cores, spans = _plans_and_cores(pk, sk, values, depths)
    batched = E._weights_from_cores_batch(pk, plans, cores, spans)
    ints = FV.to_ints(cores)
    for p, (off, n), got in zip(plans, spans, batched):
        want = E._weights_from_cores(pk, p, ints[off : off + n])
        assert FV.to_ints(got) == want


def test_batch_zero_noise(small_keys):
    """depth plans that collapse to z2=z3=0 still vectorize correctly."""
    pk, sk = small_keys
    prm = pk.prm
    import dataclasses

    prm0 = dataclasses.replace(prm, noise_entropy_bits=0, depth_slope_bits=0)
    pk0 = dataclasses.replace(pk, prm=prm0)
    pk0.powg_B = pk.powg_B
    plans, cores, spans = _plans_and_cores(pk0, sk, [42, 5], [0, 0])
    assert plans[0].z2 == 0 and plans[0].z3 == 0
    batched = E._weights_from_cores_batch(pk0, plans, cores, spans)
    ints = FV.to_ints(cores)
    for p, (off, n), got in zip(plans, spans, batched):
        want = E._weights_from_cores(pk0, p, ints[off : off + n])
        assert FV.to_ints(got) == want


def test_enc_dec_roundtrip_after_batching(small_keys):
    pk, sk = small_keys
    vals = [0, 1, 2, 999999, pvac.P - 7]
    cts = pvac.enc_value_batch(pk, sk, vals)
    assert pvac.dec_value_batch(pk, sk, cts) == vals
