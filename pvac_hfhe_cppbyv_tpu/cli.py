"""Command-line tooling.

Replaces the reference's out-of-library binaries (tests/add.cpp: load
a.ct/b.ct -> sum.ct; tests/decode_ct.cpp: inspect/decode dumps) with a
first-class CLI:

    python -m pvac_hfhe_cppbyv_tpu keygen  OUTDIR [--small]
    python -m pvac_hfhe_cppbyv_tpu enc     OUTDIR VALUE... [-o out.ct]
    python -m pvac_hfhe_cppbyv_tpu dec     OUTDIR FILE.ct
    python -m pvac_hfhe_cppbyv_tpu add     OUTDIR A.ct B.ct -o SUM.ct
    python -m pvac_hfhe_cppbyv_tpu mul     OUTDIR A.ct B.ct -o PROD.ct
    python -m pvac_hfhe_cppbyv_tpu enc-text OUTDIR "message" -o out.ct
    python -m pvac_hfhe_cppbyv_tpu dec-text OUTDIR FILE.ct
    python -m pvac_hfhe_cppbyv_tpu inspect FILE.ct

KEYDIR layout: pklite.bin + sk.bin + params.json (H/ubk regenerate from
canon_tag on load).
"""
from __future__ import annotations

import argparse
import pathlib
import sys


def _load_keys(keydir: str, need_H: bool):
    from . import load_pklite, load_sk

    d = pathlib.Path(keydir)
    pk = load_pklite(str(d / "pklite.bin"), with_H=need_H)
    sk_path = d / "sk.bin"
    sk = load_sk(str(sk_path)) if sk_path.exists() else None
    return pk, sk


def cmd_keygen(args):
    from . import Params, keygen, save_params, save_pklite, save_sk
    from .params import small_test_params

    prm = small_test_params() if args.small else Params()
    pk, sk = keygen(prm)
    d = pathlib.Path(args.keydir)
    d.mkdir(parents=True, exist_ok=True)
    save_pklite(pk, str(d / "pklite.bin"))
    save_sk(sk, str(d / "sk.bin"))
    save_params(prm, str(d / "params.json"))
    print(f"wrote {d}/pklite.bin, sk.bin, params.json")


def cmd_enc(args):
    from . import enc_value_batch, save_cts

    pk, sk = _load_keys(args.keydir, need_H=True)
    cts = enc_value_batch(pk, sk, [int(v) for v in args.values])
    save_cts(cts, args.output)
    print(f"wrote {args.output} ({len(cts)} cipher(s))")


def cmd_dec(args):
    from . import dec_value_batch, load_cts

    pk, sk = _load_keys(args.keydir, need_H=False)
    cts = load_cts(args.file)
    for v in dec_value_batch(pk, sk, cts):
        lo, hi = v & ((1 << 64) - 1), v >> 64
        print(f"{lo} {hi}")


def cmd_add(args):
    from . import ct_add, load_cts, save_cts

    pk, _ = _load_keys(args.keydir, need_H=False)
    a = load_cts(args.a)[0]
    b = load_cts(args.b)[0]
    save_cts([ct_add(pk, a, b)], args.output)
    print(f"wrote {args.output}")


def cmd_mul(args):
    from . import ct_mul, load_cts, save_cts

    pk, _ = _load_keys(args.keydir, need_H=True)
    a = load_cts(args.a)[0]
    b = load_cts(args.b)[0]
    save_cts([ct_mul(pk, a, b)], args.output)
    print(f"wrote {args.output}")


def cmd_enc_text(args):
    from . import enc_text, save_cts

    pk, sk = _load_keys(args.keydir, need_H=True)
    save_cts(enc_text(pk, sk, args.message), args.output)
    print(f"wrote {args.output}")


def cmd_dec_text(args):
    from . import dec_text, load_cts

    pk, sk = _load_keys(args.keydir, need_H=False)
    print(dec_text(pk, sk, load_cts(args.file)))


def cmd_inspect(args):
    """Structural dump of a .ct file (decode_ct.cpp equivalent)."""
    import numpy as np

    from . import load_cts
    from .core import bitvec as BV
    from .types import RRULE_BASE

    cts = load_cts(args.file)
    print(f"{args.file}: {len(cts)} cipher(s)")
    for i, c in enumerate(cts):
        mbits = c.sigma.shape[1] * 32
        dens = (
            float(BV.popcnt(np.asarray(c.sigma)).sum()) / (c.n_edges * mbits)
            if c.n_edges else 0.0
        )
        n_base = sum(1 for L in c.layers if L.rule == RRULE_BASE)
        print(
            f"  [{i}] layers={c.n_layers} (base={n_base}) edges={c.n_edges} "
            f"sigma_bits={mbits} density={dens:.4f}"
        )
        if args.verbose:
            for j, L in enumerate(c.layers):
                if L.rule == RRULE_BASE:
                    print(f"      L{j}: BASE ztag={L.seed.ztag:#018x}")
                else:
                    print(f"      L{j}: PROD pa={L.pa} pb={L.pb}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="pvac_hfhe_cppbyv_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("keygen")
    s.add_argument("keydir")
    s.add_argument("--small", action="store_true")
    s.set_defaults(fn=cmd_keygen)

    s = sub.add_parser("enc")
    s.add_argument("keydir")
    s.add_argument("values", nargs="+")
    s.add_argument("-o", "--output", default="out.ct")
    s.set_defaults(fn=cmd_enc)

    s = sub.add_parser("dec")
    s.add_argument("keydir")
    s.add_argument("file")
    s.set_defaults(fn=cmd_dec)

    for name, fn in (("add", cmd_add), ("mul", cmd_mul)):
        s = sub.add_parser(name)
        s.add_argument("keydir")
        s.add_argument("a")
        s.add_argument("b")
        s.add_argument("-o", "--output", required=True)
        s.set_defaults(fn=fn)

    s = sub.add_parser("enc-text")
    s.add_argument("keydir")
    s.add_argument("message")
    s.add_argument("-o", "--output", default="text.ct")
    s.set_defaults(fn=cmd_enc_text)

    s = sub.add_parser("dec-text")
    s.add_argument("keydir")
    s.add_argument("file")
    s.set_defaults(fn=cmd_dec_text)

    s = sub.add_parser("inspect")
    s.add_argument("file")
    s.add_argument("-v", "--verbose", action="store_true")
    s.set_defaults(fn=cmd_inspect)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
