"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip logic (sharded descriptor bank, distributed PGO) is validated on
CPU because JAX collectives are backend-portable; the driver separately
dry-run-compiles the multi-chip path and benches on real TPU.

Note: in this environment jax may arrive pre-imported with a TPU backend
(JAX_PLATFORMS=axon), so we both set the env vars (fresh-import case) and
flip jax.config (pre-imported case) — the CPU backend initializes lazily and
picks up XLA_FLAGS at first use.
"""

import os

# NRS_TESTS_TPU=1 leaves the real backend in place (for the manually-run
# TPU-only suite, tests/test_tpu_only.py); everything else runs on the
# virtual 8-device CPU mesh.
if os.environ.get("NRS_TESTS_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
