"""Test configuration: hermetic CPU backend with 8 virtual devices.

The reference's tests require the real GPU (`SURVEY.md §4`); ours are
hermetic by design — Pallas kernels run in interpreter mode on the CPU
backend, and multi-chip sharding runs on a virtual 8-device CPU mesh
(the thing the reference couldn't simulate).  Set MFA_TPU_TEST_REAL=1
to run against real devices instead.
"""

import os

if not os.environ.get("MFA_TPU_TEST_REAL"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        )
    # A site plugin may have force-registered a hardware platform and
    # overridden jax_platforms at interpreter startup; claw it back
    # before any backend initializes.
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    # On the real chip the jnp golden models run on-device too, and
    # TPU's default matmul precision computes fp32 contractions in
    # bf16 passes (~5e-3 error at golden scale) — far looser than the
    # kernels, which request HIGHEST explicitly for fp32 inputs.
    # Pin the default so goldens are trustworthy; kernels that pass an
    # explicit `precision=` are unaffected.
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    # The suite's adversarial head dims (34, 77, 95, ...) would each
    # trigger a minutes-long first-dispatch autotune sweep on the
    # chip; tests assert table behavior, so pin the policy off (the
    # autotune-on-miss tests opt back in explicitly).
    from metal_flash_attention_tpu.descriptors import parameters

    parameters.set_autotune_on_miss(False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
