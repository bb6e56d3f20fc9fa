"""Multi-host (multi-process) scaling: bootstrap + global-mesh helpers.

The reference's multi-device story stops at one host (fri/oracle.rs:288-301
chunks columns over the GPUs of a single machine, with host staging copies).
The TPU-native design has no such ceiling: a jax.sharding.Mesh is agnostic
to whether its devices sit behind one process or many, so every sharded
kernel in this package — `sharding.commit_sharded` (columns data-parallel),
`ntt_sharded.coset_lde_large` (one polynomial spanning the mesh) — runs
unchanged on a multi-host slice once `jax.distributed` is initialized and
the inputs are constructed as global arrays. Collectives ride ICI within a
slice (and DCN across slices) exactly where the mesh axes put them; nothing
in the kernels mentions processes.

This module holds the three process-level pieces a multi-host run needs:

 1. `init_multihost()` — one `jax.distributed.initialize` call per process
    (coordinator rendezvous; TPU pods auto-discover all arguments from the
    environment).
 2. `global_mesh()` — a Mesh over ALL devices in the job (not just this
    process's), optionally 2D ("data" x "seq") so column-parallel commits
    and the four-step sequence-parallel NTT compose on one slice.
 3. `host_local_to_global()` — lift each process's host-local shard of a
    coefficient array into one global jax.Array with the mesh sharding
    (`jax.make_array_from_process_local_data`), so a 2^24-coefficient
    polynomial never has to exist on any single host.

Single-process meshes (the 8-virtual-device CPU mesh in tests, one real
chip) go through the same code paths — `init_multihost` is simply not
called, and `host_local_to_global` degrades to `jax.device_put`.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Per-process rendezvous. On a TPU pod slice all arguments are
    auto-discovered from the environment; on CPU/GPU fleets pass them
    explicitly. Idempotent: a second call is a no-op."""
    if getattr(init_multihost, "_done", False):
        return
    # NOTE: must not touch jax.process_count()/jax.devices() here — any
    # backend query initializes XLA and makes distributed.initialize
    # impossible (found by tests/test_multihost_2proc.py).
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # idempotence: a prior initialize (e.g. the pod launcher) is fine
        if "already" not in str(e) and "once" not in str(e):
            raise
    init_multihost._done = True


def global_mesh(seq_parallel: int = 1, axes: tuple[str, str] = ("col", "x")
                ) -> Mesh:
    """Mesh over every device in the job. seq_parallel > 1 carves a second
    axis for the four-step NTT (one polynomial spanning `seq_parallel`
    devices); the rest stay columns-data-parallel. Axis names match what
    `sharding.commit_sharded` ("col") and `ntt_sharded.coset_lde_large`
    (its mesh's first axis) expect."""
    devs = np.asarray(jax.devices())
    n = devs.size
    assert n % seq_parallel == 0, (n, seq_parallel)
    if seq_parallel == 1:
        return Mesh(devs, (axes[0],))
    return Mesh(devs.reshape(n // seq_parallel, seq_parallel), axes)


def host_local_to_global(local_lo: np.ndarray, local_hi: np.ndarray,
                         mesh: Mesh, spec: P):
    """Assemble one global array from per-process host-local shards.

    Each process passes ONLY its own rows/columns (its shard under `spec`);
    the result is a logically-global jax.Array sharded over the whole mesh —
    the entry point for proving over traces too large for any single host.
    Returns (lo, hi) device arrays; wrap with GF(lo, hi).
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return (jax.device_put(local_lo, sharding),
                jax.device_put(local_hi, sharding))
    return (jax.make_array_from_process_local_data(sharding, local_lo),
            jax.make_array_from_process_local_data(sharding, local_hi))
