"""Multi-host (multi-process) initialization for the distributed solver.

BASELINE.md:23 targets a sharded pose graph across 2+ hosts. JAX's model:
every participating process calls `jax.distributed.initialize`, after
which `jax.devices()` spans ALL hosts and a single `Mesh` over them makes
the solver's `shard_map` collectives ride ICI within a host and DCN
across hosts — no reference counterpart (slam_toolbox is single-process;
its Ceres solver is shared-memory threads only, ceres_solver.cpp:157-181).

Usage (per host):
    from slam_toolbox_tpu.dist import multihost
    multihost.initialize()          # reads SLAM_COORD/SLAM_NPROCS/
                                    # SLAM_PROC_ID, or JAX's own env
    mesh = multihost.global_mesh()  # 1-D mesh over every device
    ... distributed_lm_solve(mesh, ...)

`distributed_lm_solve` already feeds its inputs through
`jax.make_array_from_process_local_data`, so each process contributes the
shards it can address; every process ends with the same replicated
solution. Validated end-to-end by scripts/test_multihost.py (two local
CPU processes, 4 virtual devices each)."""
from __future__ import annotations

import os

import numpy as np


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Call jax.distributed.initialize from explicit args or the
    SLAM_COORD / SLAM_NPROCS / SLAM_PROC_ID environment. Returns True if
    multi-process mode was initialized, False for single-process (no
    coordinator configured — a valid deployment)."""
    import jax

    coordinator = coordinator or os.environ.get("SLAM_COORD")
    if num_processes is None:
        num_processes = int(os.environ.get("SLAM_NPROCS", "0") or 0)
    if process_id is None:
        pid = os.environ.get("SLAM_PROC_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(axis: str = "graph"):
    """1-D mesh over every device of every initialized process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def process_info():
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
