"""Multi-process (multi-"host") validation of the distributed solver,
inside the suite (VERDICT r4 next #6).

Spawns 2 subprocesses, each with 4 virtual CPU devices, initializes
jax.distributed against a 127.0.0.1 coordinator, builds the same
snake-path graph in both, runs distributed_lm_solve over the global
8-device mesh, and asserts each process converges to the host-sparse
reference and shuts down cleanly. Regression guard for the
jax.distributed wiring (dist/multihost.py); on real deployments the same
code path rides DCN between hosts (BASELINE.md 2+ host target).
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/scripts")
import jax
jax.config.update("jax_platforms", "cpu")
from slam_toolbox_tpu.dist import multihost
ok = multihost.initialize()
assert ok, "multihost.initialize() did not engage"
import numpy as np
info = multihost.process_info()
assert info["global_devices"] == 8, info
from bench_dist import build_snake_graph, pack, host_sparse_solve
from slam_toolbox_tpu.dist.solver_dist import distributed_lm_solve

gt, init, edges = build_snake_graph(512, aisle_len=32)
n = len(init)
mesh = multihost.global_mesh()
packed = pack(init, edges, 8)
out, chi2 = distributed_lm_solve(mesh, *packed, cg_iters=200, block=128)
ref, _, _ = host_sparse_solve(init, edges)
d = np.sqrt(np.sum((out[:n, :2] - ref[:, :2]) ** 2, axis=1)).max()
assert d < 2e-2, f"proc {info['process_index']}: max dxy {d}"
print(f"MULTIHOST_WORKER_OK proc={info['process_index']} "
      f"chi2={chi2:.4f} max_dxy={d:.5f}", flush=True)
"""


def test_two_process_distributed_solve_parity():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            SLAM_COORD=coord,
            SLAM_NPROCS="2",
            SLAM_PROC_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        # the conftest's JAX knobs must not leak: the workers configure
        # their own backend; PYTHONPATH breaks the axon plugin
        env.pop("PYTHONPATH", None)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER % {"repo": REPO}],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outputs = []
    rc = 0
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outputs.append(out.decode())
            rc |= p.returncode
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()  # exact PID only
                p.wait(timeout=30)
    joined = "\n".join(o[-4000:] for o in outputs)
    assert rc == 0, f"worker failed:\n{joined}"
    for pid in range(2):
        assert f"MULTIHOST_WORKER_OK proc={pid}" in joined, joined
