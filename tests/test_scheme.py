"""End-to-end scheme semantics (port of tests/test_main.cpp's `make test`
suite, sections 1-20) on small test params."""
import random

import numpy as np
import pytest

import pvac_hfhe_cppbyv_tpu as pvac
from pvac_hfhe_cppbyv_tpu.core import field as F

P = F.P


@pytest.fixture(scope="module")
def keys(small_keys):
    return small_keys


class TestBasics:
    def test_enc_dec_roundtrip(self, keys):
        pk, sk = keys
        for v in [0, 1, 2, 42, 12345678901234567]:
            assert pvac.dec_value(pk, sk, pvac.enc_value(pk, sk, v)) == v

    def test_add_sub(self, keys):
        pk, sk = keys
        a = pvac.enc_value(pk, sk, 42)
        b = pvac.enc_value(pk, sk, 17)
        assert pvac.dec_value(pk, sk, pvac.ct_add(pk, a, b)) == 59
        assert pvac.dec_value(pk, sk, pvac.ct_sub(pk, a, b)) == 25
        assert pvac.dec_value(pk, sk, pvac.ct_sub(pk, b, a)) == P - 25

    def test_mul(self, keys):
        pk, sk = keys
        a = pvac.enc_value(pk, sk, 42)
        b = pvac.enc_value(pk, sk, 17)
        assert pvac.dec_value(pk, sk, pvac.ct_mul(pk, a, b)) == 714

    def test_add_sub_batch(self, keys):
        """ct_add_batch/ct_sub_batch are bit-exact vs the per-pair ops,
        compose (adds of adds, PROD-layer inputs), and serialize."""
        pk, sk = keys
        cts = pvac.enc_value_batch(pk, sk, list(range(6)))
        prod = pvac.ct_mul(pk, cts[0], cts[1])  # PROD layers in the mix
        pairs = [(cts[i % 6], cts[(i + 1) % 6]) for i in range(8)]
        pairs += [(prod, cts[2]), (cts[3], prod)]
        outs = pvac.ct_add_batch(pk, pairs)
        for (a, b), C in zip(pairs, outs):
            R = pvac.ct_add(pk, a, b)
            assert np.array_equal(C.layer_id, R.layer_id)
            assert np.array_equal(C.idx, R.idx)
            assert np.array_equal(C.ch, R.ch)
            assert np.array_equal(C.w, R.w)
            assert np.array_equal(np.asarray(C.sigma), np.asarray(R.sigma))
            assert len(C.layers) == len(R.layers)
        # nested: outputs (StackedSigma) feed back in as inputs
        c2 = pvac.ct_add_batch(pk, [(outs[0], outs[1]), (outs[2], prod)])
        assert pvac.dec_value(pk, sk, c2[0]) == (0 + 1 + 1 + 2) % P
        assert pvac.dec_value(pk, sk, c2[1]) == (2 + 3 + 0 * 1) % P
        subs = pvac.ct_sub_batch(pk, pairs)
        for (a, b), C in zip(pairs, subs):
            want = (pvac.dec_value(pk, sk, a)
                    - pvac.dec_value(pk, sk, b)) % P
            assert pvac.dec_value(pk, sk, C) == want
        # empty batches: both ops return [] (consistent public API)
        assert pvac.ct_add_batch(pk, []) == []
        assert pvac.ct_sub_batch(pk, []) == []
        # stacked σ roundtrips through the wire format
        import io as _io  # noqa: F401
        from pvac_hfhe_cppbyv_tpu.io import serial
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "t.ct")
            serial.save_cts([c2[0]], path)
            got = serial.load_cts(path)[0]
            assert pvac.dec_value(pk, sk, got) == (0 + 1 + 1 + 2) % P

    def test_identities(self, keys):
        pk, sk = keys
        x = pvac.enc_value(pk, sk, 999)
        zero = pvac.enc_value(pk, sk, 0)
        one = pvac.enc_value(pk, sk, 1)
        assert pvac.dec_value(pk, sk, pvac.ct_add(pk, x, zero)) == 999
        assert pvac.dec_value(pk, sk, pvac.ct_mul(pk, x, one)) == 999
        assert pvac.dec_value(pk, sk, pvac.ct_mul(pk, x, zero)) == 0

    def test_modular_wrap(self, keys):
        pk, sk = keys
        big = pvac.enc_fp_depth(pk, sk, P - 1, 0)
        two = pvac.enc_value(pk, sk, 2)
        assert pvac.dec_value(pk, sk, pvac.ct_add(pk, big, two)) == 1

    def test_scale_neg_div(self, keys):
        pk, sk = keys
        a = pvac.enc_value(pk, sk, 100)
        assert pvac.dec_value(pk, sk, pvac.ct_scale(pk, a, 7)) == 700
        assert pvac.dec_value(pk, sk, pvac.ct_neg(pk, a)) == P - 100
        assert pvac.dec_value(pk, sk, pvac.ct_div_const(pk, a, 4)) == F.fp_mul(
            100, F.fp_inv(4)
        )


class TestAlgebraLaws:
    def test_commutativity(self, keys):
        pk, sk = keys
        a = pvac.enc_value(pk, sk, 13)
        b = pvac.enc_value(pk, sk, 29)
        assert pvac.dec_value(pk, sk, pvac.ct_add(pk, a, b)) == pvac.dec_value(
            pk, sk, pvac.ct_add(pk, b, a)
        )
        assert pvac.dec_value(pk, sk, pvac.ct_mul(pk, a, b)) == pvac.dec_value(
            pk, sk, pvac.ct_mul(pk, b, a)
        )

    def test_associativity_distributivity(self, keys):
        pk, sk = keys
        a = pvac.enc_value(pk, sk, 3)
        b = pvac.enc_value(pk, sk, 5)
        c = pvac.enc_value(pk, sk, 7)
        lhs = pvac.ct_mul(pk, pvac.ct_add(pk, a, b), c)
        rhs = pvac.ct_add(pk, pvac.ct_mul(pk, a, c), pvac.ct_mul(pk, b, c))
        assert pvac.dec_value(pk, sk, lhs) == 56
        assert pvac.dec_value(pk, sk, rhs) == 56
        assoc1 = pvac.ct_mul(pk, pvac.ct_mul(pk, a, b), c)
        assoc2 = pvac.ct_mul(pk, a, pvac.ct_mul(pk, b, c))
        assert pvac.dec_value(pk, sk, assoc1) == 105
        assert pvac.dec_value(pk, sk, assoc2) == 105

    def test_random_ops_30(self, keys):
        pk, sk = keys
        rng = random.Random(424242)
        val = 1
        ct = pvac.enc_value(pk, sk, 1)
        for _ in range(30):
            op = rng.randrange(3)
            k = rng.randrange(1, 100)
            kc = pvac.enc_value(pk, sk, k)
            if op == 0:
                ct = pvac.ct_add(pk, ct, kc)
                val = F.fp_add(val, k)
            elif op == 1:
                ct = pvac.ct_sub(pk, ct, kc)
                val = F.fp_sub(val, k)
            else:
                ct = pvac.ct_scale(pk, ct, k)
                val = F.fp_mul(val, k)
        assert pvac.dec_value(pk, sk, ct) == val

    def test_linear_combination(self, keys):
        pk, sk = keys
        xs = [3, 14, 15, 92]
        ks = [2, 7, 18, 28]
        cts = pvac.enc_value_batch(pk, sk, xs)
        acc = pvac.ct_scale(pk, cts[0], ks[0])
        want = F.fp_mul(xs[0], ks[0])
        for x, k, c in zip(xs[1:], ks[1:], cts[1:]):
            acc = pvac.ct_add(pk, acc, pvac.ct_scale(pk, c, k))
            want = F.fp_add(want, F.fp_mul(x, k))
        assert pvac.dec_value(pk, sk, acc) == want

    def test_polynomial_and_square(self, keys):
        pk, sk = keys
        # p(x) = x^2 + 3x + 5 at x = 11 -> 159
        x = pvac.enc_value(pk, sk, 11)
        x2 = pvac.ct_mul(pk, x, x)
        poly = pvac.ct_add(
            pk, x2, pvac.ct_add(pk, pvac.ct_scale(pk, x, 3), pvac.enc_value(pk, sk, 5))
        )
        assert pvac.dec_value(pk, sk, poly) == 159
        # (a+b)^2 == a^2 + 2ab + b^2
        a = pvac.enc_value(pk, sk, 6)
        b = pvac.enc_value(pk, sk, 9)
        s = pvac.ct_add(pk, a, b)
        lhs = pvac.ct_mul(pk, s, s)
        assert pvac.dec_value(pk, sk, lhs) == 225


class TestChainsAndDepth:
    def test_pow2_chain_10(self, keys):
        pk, sk = keys
        ct = pvac.enc_value(pk, sk, 2)
        val = 2
        for _ in range(10):
            ct = pvac.ct_add(pk, ct, ct)
            val = F.fp_add(val, val)
        assert pvac.dec_value(pk, sk, ct) == val == 2 * 2**10

    def test_factorial_10(self, keys):
        pk, sk = keys
        acc = pvac.enc_value(pk, sk, 1)
        for k in range(2, 11):
            acc = pvac.ct_scale(pk, acc, k)
        assert pvac.dec_value(pk, sk, acc) == 3628800

    def test_repeated_squaring_depth(self, keys):
        """test_depth.cpp: x -> x^2 -> x^4 with real ct_mul.  (The reference
        binary itself OOMs at step 4 — quadratic edge growth; step counts
        here match what it can actually do.)"""
        pk, sk = keys
        ct = pvac.enc_value(pk, sk, 2)
        val = 2
        for _ in range(2):
            ct = pvac.ct_mul(pk, ct, ct)
            val = F.fp_mul(val, val)
            assert ct.n_edges <= pk.prm.edge_budget
        assert pvac.dec_value(pk, sk, ct) == val == 2**4

    @pytest.mark.slow
    def test_repeated_squaring_depth3(self, keys):
        pk, sk = keys
        ct = pvac.enc_value(pk, sk, 3)
        val = 3
        for _ in range(3):
            ct = pvac.ct_mul(pk, ct, ct)
            val = F.fp_mul(val, val)
        assert pvac.dec_value(pk, sk, ct) == val == 3**8

    def test_mul_gsum_invariant(self, keys):
        pk, sk = keys
        a = pvac.enc_value(pk, sk, 33)
        b = pvac.enc_value(pk, sk, 44)
        c = pvac.ct_mul(pk, a, b)
        assert pvac.check_mul_gsum_all(pk, a, b, c)


class TestRecrypt:
    def test_evalkey_recrypt(self, keys):
        pk, sk = keys
        ek = pvac.make_evalkey(pk, sk, 3, 0)
        assert pvac.dec_value(pk, sk, ek.enc_one) == 1
        a = pvac.enc_value(pk, sk, 777)
        b = pvac.enc_value(pk, sk, 223)
        s = pvac.ct_add(pk, a, b)
        r = pvac.ct_recrypt(pk, ek, s)
        assert pvac.dec_value(pk, sk, r) == 1000

    def test_recrypt_after_mul(self, keys):
        pk, sk = keys
        ek = pvac.make_evalkey(pk, sk, 2, 1)
        a = pvac.enc_value(pk, sk, 21)
        m = pvac.ct_mul(pk, a, pvac.enc_value(pk, sk, 2))
        r = pvac.ct_recrypt(pk, ek, m)
        assert pvac.dec_value(pk, sk, r) == 42


class TestCommitText:
    def test_commit_deterministic_unique(self, keys):
        pk, sk = keys
        a = pvac.enc_value(pk, sk, 5)
        b = pvac.enc_value(pk, sk, 5)
        assert pvac.commit_ct(pk, a) == pvac.commit_ct(pk, a)
        assert pvac.commit_ct(pk, a) != pvac.commit_ct(pk, b)

    def test_commit_vector(self, vectors, keys):
        """commit_ct KAT vs reference (synthetic cipher from vectors.json)."""
        import numpy as np
        from pvac_hfhe_cppbyv_tpu.core import fieldv as FV
        from pvac_hfhe_cppbyv_tpu.params import Params
        from pvac_hfhe_cppbyv_tpu.types import (
            Cipher, Layer, Nonce128, PubKey, RSeed, RRULE_BASE, RRULE_PROD,
        )

        pi = vectors["prf_inputs"]
        prm = Params()
        prm.m_bits = 512
        pkv = PubKey(
            prm=prm, canon_tag=int(pi["canon_tag"]), H=None, ubk=None,
            H_digest=bytes.fromhex(pi["H_digest"]), omega_B=0, powg_B=[],
        )
        layers = [
            Layer(RRULE_BASE, RSeed(11, Nonce128(22, 33))),
            Layer(RRULE_BASE, RSeed(44, Nonce128(55, 66))),
            Layer(RRULE_PROD, RSeed(0, Nonce128(0, 0)), 0, 1),
        ]
        sig = np.zeros((2, 16), dtype=np.uint32)
        bv = np.zeros(16, dtype=np.uint32)
        bv[0] = 0x9ABCDEF0
        bv[1] = 0x12345678
        bv[6] = 7
        sig[0] = bv
        sig[1] = bv
        C = Cipher(
            layers,
            np.array([0, 2], dtype=np.int32),
            np.array([5, 300], dtype=np.int32),
            np.array([0, 1], dtype=np.int8),
            FV.from_ints([42, 123 | (456 << 64)]),
            sig,
        )
        assert pvac.commit_ct(pkv, C).hex() == vectors["commit_ct"]

    def test_text_roundtrip(self, keys):
        pk, sk = keys
        msg = "the quick brown fox jumps over 13 lazy dogs!"
        cts = pvac.enc_text(pk, sk, msg)
        assert pvac.dec_text(pk, sk, cts) == msg

    def test_text_empty(self, keys):
        pk, sk = keys
        assert pvac.dec_text(pk, sk, pvac.enc_text(pk, sk, "")) == ""

    def test_metrics(self, keys, tmp_path):
        pk, sk = keys
        import pvac_hfhe_cppbyv_tpu.utils.metrics as M

        M._metrics_file = None
        c = pvac.enc_value(pk, sk, 5)
        M.dump_metrics(pk, "t1", c, 5, path=str(tmp_path / "m.csv"))
        M.dump_metrics(pk, "t2", c, 6, path=str(tmp_path / "m.csv"))
        M._metrics_file = None
        lines = (tmp_path / "m.csv").read_text().strip().split("\n")
        assert lines[0] == "tag,edges,layers,sigma_density,value_lo,value_hi"
        assert lines[1].startswith(f"t1,{c.n_edges},{c.n_layers},")
        assert 8.0 > pvac.sigma_shannon(c) > 7.0  # near-uniform bytes

    def test_sigma_density_band(self, keys):
        pk, sk = keys
        c = pvac.enc_value(pk, sk, 12345)
        d = pvac.sigma_density(pk, c)
        assert 0.3 < d < 0.7


class TestServiceRoles:
    def test_client_evaluator(self, keys):
        pk, sk = keys
        from pvac_hfhe_cppbyv_tpu.service import Client

        client = Client(pk, sk)
        a, b = client.encrypt([6, 7])
        ev = client.evaluator(client.evaluation_key(pool_size=2))
        prod = ev.mul(a, b)
        total = ev.add(prod, ev.scale(a, 10))
        rec = ev.recrypt(total)
        assert client.decrypt([prod, total, rec]) == [42, 102, 102]

    def test_op_report_runs(self, keys):
        pk, sk = keys
        from pvac_hfhe_cppbyv_tpu.utils.profiling import op_report

        r = op_report(pk, sk, batch=4)
        assert set(r) == {"enc_value_us", "dec_value_us", "ct_add_us", "ct_mul_us"}
        assert all(v > 0 for v in r.values())


class TestPipelinedEnc:
    def test_enc_value_batch_pipelined_chunks(self, keys):
        """The software-pipelined multi-chunk path (chunk i+1's device
        work dispatched before chunk i's finalize) must decrypt exactly
        like the single-batch path."""
        pk, sk = keys
        vals = list(range(41))
        cts = pvac.enc_value_batch(pk, sk, vals, pipeline_chunk=16)
        assert pvac.dec_value_batch(pk, sk, cts) == vals
        # and interoperate with everything downstream
        s = pvac.ct_add(pk, cts[3], cts[5])
        m = pvac.ct_mul(pk, cts[2], cts[4])
        assert pvac.dec_value_batch(pk, sk, [s, m]) == [8, 8]
