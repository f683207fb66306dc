#!/usr/bin/env python
"""Depth-10 multiplicative chain with recrypt re-randomization.

Raw repeated squaring (benchmarks/depth_sweep.py) is edge-exponential in
BOTH implementations — the reference C++ dies of std::bad_alloc at step 4
(tests/test_depth.cpp:25-74) and no recrypt can save it: ct_recrypt
(recrypt.hpp:26-41) re-randomizes σ, it does not compress edges.  The
scheme's practical deep-computation shape is the reference's 2^k chain
(tests/test_main.cpp "2^10 chain" sections): multiply by a FRESH
ciphertext each step, recrypting along the way.  Edge growth is then
linear-ish per step instead of quadratic, so depth 10 is reachable.

This driver runs c <- ct_mul(c, enc(2)) for `steps` steps (default 10),
with ct_recrypt every `--recrypt-every` steps (default 2, like the
reference's ±recrypt variants), decrypt-verifying 2^(k+1) at every step.
Writes docs/depth_recrypt.json.

Reference cost per step at this shape: one ct_mul (grows from 155 ms as
the chain deepens) + one recrypt (~18 ms), single-threaded (BASELINE.md).

Usage: python benchmarks/depth_recrypt.py [steps] [--pool N]
       [--recrypt-every K] [--no-recrypt]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import pvac_hfhe_cppbyv_tpu as pvac
    from pvac_hfhe_cppbyv_tpu.ops.recrypt import ct_recrypt, make_evalkey

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = int(args[0]) if args else 10
    pool = (int(sys.argv[sys.argv.index("--pool") + 1])
            if "--pool" in sys.argv else 8)
    every = (int(sys.argv[sys.argv.index("--recrypt-every") + 1])
             if "--recrypt-every" in sys.argv else 2)
    use_recrypt = "--no-recrypt" not in sys.argv

    prm = pvac.Params()
    t0 = time.time()
    pk, sk = pvac.keygen(prm)
    print(f"keygen: {time.time()-t0:.2f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    ek = make_evalkey(pk, sk, pool, 1)
    ek_s = time.time() - t0
    print(f"evalkey(pool={pool}): {ek_s:.2f}s", file=sys.stderr, flush=True)

    c = pvac.enc_value(pk, sk, 2)
    two = pvac.enc_value(pk, sk, 2)
    rows = []
    total0 = time.time()
    for k in range(1, steps + 1):
        t0 = time.time()
        c = pvac.ct_mul(pk, c, two)
        mul_s = time.time() - t0
        rec_s = 0.0
        pre_edges = c.n_edges
        if use_recrypt and k % every == 0:
            t0 = time.time()
            c = ct_recrypt(pk, ek, c)
            rec_s = time.time() - t0
        t0 = time.time()
        got = pvac.dec_value(pk, sk, c)
        dec_s = time.time() - t0
        want = pow(2, k + 1, pvac.P)
        ok = int(got == want)
        rows.append({
            "step": k, "mul_s": round(mul_s, 4), "recrypt_s": round(rec_s, 4),
            "dec_s": round(dec_s, 4), "edges": int(pre_edges),
            "edges_post_recrypt": int(c.n_edges), "layers": int(c.n_layers),
            "ok": ok,
        })
        print(f"step {k}: mul {mul_s:.3f}s  recrypt {rec_s:.3f}s  "
              f"dec {dec_s:.3f}s  edges {pre_edges}->{c.n_edges}  "
              f"layers {c.n_layers}  ok={ok}",
              file=sys.stderr, flush=True)
        if not ok:
            break
    out = {
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "engine": "host (numpy + native C++: AES-NI, SHA-NI)",
        "sigma_eager_max": int(os.environ.get("PVAC_SIGMA_EAGER_MAX",
                                              str(1 << 21))),
        "steps": steps,
        "recrypt_every": every if use_recrypt else 0,
        "evalkey_pool": pool,
        "evalkey_s": round(ek_s, 3),
        "chain_total_s": round(time.time() - total0, 3),
        "all_ok": int(all(r["ok"] for r in rows) and len(rows) == steps),
        "rows": rows,
    }
    virt = int(os.environ.get("PVAC_SIGMA_EAGER_MAX", str(1 << 21))) < (1 << 21)
    if not use_recrypt:
        name = "depth_chain_virtual.json"
    elif virt:
        name = "depth_recrypt_virtual.json"
    else:
        name = "depth_recrypt.json"
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))


if __name__ == "__main__":
    main()
