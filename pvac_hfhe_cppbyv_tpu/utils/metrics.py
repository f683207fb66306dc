"""Metrics / diagnostics (reference: include/pvac/utils/metrics.hpp)."""
from __future__ import annotations

import math

import numpy as np

from ..core import field as F
from ..core import fieldv as FV
from ..ops.encrypt import sigma_density
from ..types import Cipher, PubKey, SGN_P

_metrics_file = None


def dump_metrics(pk: PubKey, tag: str, C: Cipher, val: int,
                 path: str = "pvac_metrics.csv") -> None:
    """Append-mode CSV (metrics.hpp:13-41)."""
    global _metrics_file
    if _metrics_file is None:
        _metrics_file = open(path, "a")
        _metrics_file.write("tag,edges,layers,sigma_density,value_lo,value_hi\n")
    dens = sigma_density(pk, C)
    lo, hi = F.fp_to_words(val)
    _metrics_file.write(
        f"{tag},{C.n_edges},{C.n_layers},{dens:.6f},{lo},{hi}\n"
    )
    _metrics_file.flush()


def sigma_shannon(C: Cipher) -> float:
    """Byte-entropy of all σ vectors (metrics.hpp:43-68)."""
    if C.n_edges == 0:
        return 0.0
    by = np.asarray(C.sigma).astype("<u4").tobytes()
    freq = np.bincount(np.frombuffer(by, dtype=np.uint8), minlength=256)
    total = freq.sum()
    if total == 0:
        return 0.0
    p = freq[freq > 0] / total
    return float(-(p * np.log2(p)).sum())


def agg_layer_gsum(pk: PubKey, X: Cipher, lid: int) -> int:
    """Signed sum of w*g^idx over one layer's edges (metrics.hpp:70-86)."""
    s = 0
    powg = pk.powg_B
    for e in range(X.n_edges):
        if int(X.layer_id[e]) != lid:
            continue
        w = FV.to_ints(X.w[e : e + 1])[0]
        term = F.fp_mul(w, powg[int(X.idx[e])])
        s = F.fp_add(s, term) if int(X.ch[e]) == SGN_P else F.fp_sub(s, term)
    return s


def check_mul_gsum_all(pk: PubKey, A: Cipher, B: Cipher, C: Cipher) -> bool:
    """Homomorphism invariant of ct_mul layer sums (metrics.hpp:88-113)."""
    base = A.n_layers + B.n_layers
    for la in range(A.n_layers):
        for lb in range(B.n_layers):
            lc = base + la * B.n_layers + lb
            aa = agg_layer_gsum(pk, A, la)
            bb = agg_layer_gsum(pk, B, lb)
            cc = agg_layer_gsum(pk, C, lc)
            if cc != F.fp_mul(aa, bb):
                return False
    return True
