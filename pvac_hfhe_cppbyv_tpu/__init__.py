"""pvac_hfhe_cppbyv_tpu — TPU-native PVAC-HFHE framework (under construction).

Full umbrella API is assembled in tools/__init__full.py.txt and restored as
modules land.
"""
PVAC_TPU_VERSION = "0.1.0"

from .config import get_debug_level, set_debug_level
from .params import Params, params_from_json, params_to_json
from .core.field import (
    P, MASK63, fp_from_u64, fp_from_words, fp_to_words,
    fp_add, fp_sub, fp_neg, fp_mul, fp_inv, fp_pow, rand_fp_nonzero,
)
from .core import fieldv
from .core.random import csprng_bytes, csprng_u64
