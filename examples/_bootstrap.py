"""Shared example bootstrap: choose a REACHABLE backend before any backend
initialization (the TPU plugin blocks indefinitely when its tunnel is down
— probe it in a subprocess with a hard timeout and fall back to CPU), and
enable the persistent compile cache so repeat runs skip XLA compiles.

Set PLONKY2_TPU_EXAMPLE_PLATFORM=cpu|tpu to skip the probe."""

import os
import subprocess
import sys


def setup():
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
    want = os.environ.get("PLONKY2_TPU_EXAMPLE_PLATFORM")
    if want is None:
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert jax.devices()[0].platform == 'tpu'"],
                timeout=90, check=True, capture_output=True)
            want = ""          # TPU reachable: keep the default platform
        except Exception:
            want = "cpu"
    import jax
    if want:
        jax.config.update("jax_platforms", want)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/plonky2_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_threefry_partitionable", True)
