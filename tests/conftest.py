"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU (fast iteration, no TPU needed) with 8 virtual devices so
multi-chip sharding paths are exercised the way the driver's dryrun does.
Must set env vars before JAX initializes a backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's axon TPU plugin sets jax_platforms via jax.config, which
# wins over the JAX_PLATFORMS env var — force it back to CPU for tests.
# PLONKY2_TPU_TEST_BACKEND=tpu runs the suite on the real chip instead (used
# for the heavy e2e tests, whose jitted programs compile minutes-to-hours on
# XLA:CPU but seconds on TPU).
_backend = os.environ.get("PLONKY2_TPU_TEST_BACKEND", "cpu")
if _backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
# any other value: leave the plugin-selected default (the tunneled TPU chip
# registers through a plugin whose platform alias differs from "tpu", so we
# must not override jax_platforms for it)
jax.config.update("jax_threefry_partitionable", True)
# Persistent compile cache: the limb-arithmetic graphs are compile-heavy and
# identical across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest


@pytest.fixture(scope="session")
def fib_data_and_proof():
    """One shared fibonacci circuit + proof for all e2e tests (proving is
    expensive on this 1-core box; every consumer reuses this session proof)."""
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config(),
                             seed=1234)
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    prev, cur = a, b
    for _ in range(99):
        prev, cur = cur, builder.add(prev, cur)
    for t in (a, b, cur):
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 0)
    pw.set_target(b, 1)
    return data, data.prove(pw)
