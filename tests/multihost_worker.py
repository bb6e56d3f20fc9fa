"""Worker process for test_multihost_2proc: a REAL jax.distributed
2-process CPU job (2 virtual devices per process, 4 global) driving
init_multihost -> global_mesh -> host_local_to_global -> coset_lde_large,
value-checked against the single-device LDE.

Usage: python multihost_worker.py <coordinator_port> <process_id> <nprocs>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402


def main():
    port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from plonky2_tpu.field.goldilocks import GF
    from plonky2_tpu.ops import ntt
    from plonky2_tpu.parallel import multihost, ntt_sharded

    multihost.init_multihost(coordinator_address=f"127.0.0.1:{port}",
                             num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 2 * nprocs, n_global

    mesh = multihost.global_mesh(seq_parallel=n_global, axes=("col", "x"))
    seq_mesh = jax.sharding.Mesh(mesh.devices.reshape(-1), ("x",))

    lg_in, rate = 10, 2
    n_in = 1 << lg_in
    lg_n = lg_in + rate
    rng = np.random.default_rng(7)
    full = rng.integers(0, (1 << 64) - (1 << 32) + 1, size=(n_in,),
                        dtype=np.uint64)
    lo_full = (full & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi_full = (full >> np.uint64(32)).astype(np.uint32)

    # build the global coefficient vector from per-process host-local
    # blocks: with P("x") over 4 devices (2 per process), process pid owns
    # the contiguous half [pid*n/2, (pid+1)*n/2) — no single process ever
    # holds the full input
    shard_rows = n_in // n_global
    spec = P("x")
    local_lo = lo_full[pid * 2 * shard_rows:(pid + 1) * 2 * shard_rows]
    local_hi = hi_full[pid * 2 * shard_rows:(pid + 1) * 2 * shard_rows]
    glo, ghi = multihost.host_local_to_global(local_lo, local_hi,
                                              seq_mesh, spec)
    coeffs = GF(glo, ghi)

    out = ntt_sharded.coset_lde_large(coeffs, seq_mesh, rate)

    # expected: single-device LDE of the full vector, computed locally
    expected = ntt.coset_lde(GF.from_u64(full), rate).to_u64()
    for shard in out.lo.addressable_shards:
        sl = shard.index[0]
        got_lo = np.asarray(shard.data)
        exp = expected[sl]
        assert np.array_equal(got_lo,
                              (exp & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                              ), f"lo mismatch in shard {sl}"
    for shard in out.hi.addressable_shards:
        sl = shard.index[0]
        got_hi = np.asarray(shard.data)
        exp = expected[sl]
        assert np.array_equal(got_hi,
                              (exp >> np.uint64(32)).astype(np.uint32)
                              ), f"hi mismatch in shard {sl}"
    print(f"proc {pid}: multihost coset_lde_large OK "
          f"({jax.process_count()} processes, {n_global} devices)",
          flush=True)


if __name__ == "__main__":
    main()
