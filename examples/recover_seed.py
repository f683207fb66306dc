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
    """Search one ciphertext for the (idx-collision, opposite-sign) edge
    pair the attack relies on; returns (found, candidate_R)."""
    ws = FV.to_ints(ct.w)
    n = ct.n_edges
    for i in range(n):
        for j in range(i + 1, n):
            if (int(ct.idx[i]) == int(ct.idx[j])
                    and int(ct.layer_id[i]) == int(ct.layer_id[j])
                    and int(ct.ch[i]) != int(ct.ch[j])):
                return True, F.fp_add(ws[i], ws[j])
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
    print("    compact_edges keeps at most one edge per (layer, idx, sign), "
          "so the attacked structure cannot occur in honest ciphertexts.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
