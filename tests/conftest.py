"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform so sharding tests exercise
real multi-device code paths without TPU hardware.  Must run before the first
``import jax`` anywhere in the test session.
"""
import os

# PVAC_TEST_TPU=1 runs the suite against the attached accelerator instead
# (used by tools/tpu_session.py for the device-only kernel tests).
_USE_TPU = os.environ.get("PVAC_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import json
import pathlib

import pytest

# Persistent XLA compilation cache: first run pays compile cost, repeats are
# instant.  Keep outside the repo tree.
import jax

# The axon TPU plugin in this image overrides the JAX_PLATFORMS env var, so
# force the CPU platform through the config API as well — otherwise every op
# in the test suite round-trips through the TPU tunnel.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/pvac_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def vectors():
    with open(GOLDEN / "vectors.json") as f:
        return json.load(f)


@pytest.fixture(scope="session")
def golden_small():
    return GOLDEN / "small"


@pytest.fixture(scope="session")
def small_keys():
    """Fresh small-params keypair shared across scheme tests."""
    import pvac_hfhe_cppbyv_tpu as pvac

    pk, sk = pvac.keygen(pvac.small_test_params())
    return pk, sk


@pytest.fixture(scope="session")
def golden_default():
    return GOLDEN / "default"
