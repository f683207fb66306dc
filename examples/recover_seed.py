#!/usr/bin/env python
"""Attack sketch: the bounty-era "R-leak" structural attack.

Port of examples/recover_seed.cpp from the reference — kept for parity and
as a security-regression demonstration.  (The reference version does not
even compile against its own library: it reads raw structs with nonexistent
``Edge::sign``/``weight`` fields and guesses at file offsets — drifted
bounty-era code.  This port implements the attack IDEA against real parsed
ciphertexts.)

The attack hypothesis: if a fresh ciphertext contained two edges at the
same generator index with opposite signs whose signed term sum telescoped
to something R-related, an attacker could recover the blinding factor R and
strip it.  The scheme's edge compaction (one edge per (layer, idx, sign)
after compact_edges) plus the Z2/Z3 noise-delta design makes the searched
structure absent — which tests/test_noise_struct.py pins as a regression.

Run:  python examples/recover_seed.py [path/to/seed.ct]
Expected outcome: "structural leakage not found" on any honest ciphertext.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pvac_hfhe_cppbyv_tpu as pvac
from pvac_hfhe_cppbyv_tpu.core import field as F
from pvac_hfhe_cppbyv_tpu.core import fieldv as FV
from pvac_hfhe_cppbyv_tpu.types import SGN_P


def attempt_r_leak(ct: pvac.Cipher) -> tuple[bool, int]:
    """Search one ciphertext for the exploitable pair structure.

    A P/M edge pair at the same (layer, idx) is normal and harmless — the
    leak the bounty-era attack needed is a pair whose raw weights cancel
    (w_i + w_j = 0) or repeat (w_i = w_j), which would expose an R-multiple
    directly (cf. tests/bounty_r2_attack.cpp).  Honest encryption never
    produces it; returns (found, leaked_value)."""
    ws = FV.to_ints(ct.w)
    n = ct.n_edges
    for i in range(n):
        for j in range(i + 1, n):
            if ws[i] == ws[j] or F.fp_add(ws[i], ws[j]) == 0:
                return True, ws[i]
    return False, 0


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else str(
        pathlib.Path(__file__).resolve().parent.parent
        / "tests" / "golden" / "bounty3" / "seed.ct"
    )
    cts = pvac.load_cts(path)
    print(f"[+] loaded {len(cts)} cipher(s), "
          f"{sum(c.n_edges for c in cts)} edges total")
    for k, ct in enumerate(cts):
        found, r = attempt_r_leak(ct)
        if found:
            print(f"[!] cipher {k}: structural R-leak candidate {r:#034x}")
            print("    (if this ever prints on an honest ciphertext, the "
                  "compaction/noise design regressed — see "
                  "tests/test_noise_struct.py)")
            return 1
    print("[-] structural leakage not found in the data.")
    print("    honest encryption never emits cancelling or repeated raw "
          "weights (every weight carries an independent random factor "
          "times R); tests/test_security.py pins this class.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
