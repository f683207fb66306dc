"""Randomized op-sequence fuzzing vs a plaintext mirror
(port of tests/test_ct_fuzz.cpp)."""
import random

import pytest

import pvac_hfhe_cppbyv_tpu as pvac
from pvac_hfhe_cppbyv_tpu.core import field as F


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_op_chain(small_keys, seed):
    pk, sk = small_keys
    rng = random.Random(0xF00D + seed)
    val = rng.randrange(1000)
    ct = pvac.enc_value(pk, sk, val)
    muls = 0
    for _ in range(12):
        op = rng.randrange(4)
        k = rng.randrange(1, 50)
        if op == 0:
            ct = pvac.ct_add(pk, ct, pvac.enc_value(pk, sk, k))
            val = F.fp_add(val, k)
        elif op == 1:
            ct = pvac.ct_sub(pk, ct, pvac.enc_value(pk, sk, k))
            val = F.fp_sub(val, k)
        elif op == 2:
            ct = pvac.ct_scale(pk, ct, k)
            val = F.fp_mul(val, k)
        elif op == 3 and muls < 2:
            ct = pvac.ct_mul(pk, ct, pvac.enc_value(pk, sk, k))
            val = F.fp_mul(val, k)
            muls += 1
        assert ct.n_edges <= pk.prm.edge_budget
    assert pvac.dec_value(pk, sk, ct) == val
