"""Two-process multi-host validation of the distributed solver.

Spawns 2 local processes, each with 4 virtual CPU devices, initializes
jax.distributed (127.0.0.1 coordinator), builds the SAME snake-path graph
in both, runs distributed_lm_solve over the global 8-device mesh, and
asserts every process converges to the host-sparse reference. This is the
end-to-end evidence that the solver's sharding works across process
boundaries (where collectives ride DCN on real multi-host deployments).

Run: python scripts/test_multihost.py
"""
import os
import socket
import subprocess
import sys

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
print(f"proc {info['process_index']}: OK chi2={chi2:.4f} "
      f"max_dxy={d:.5f} devices={info}", flush=True)
"""


def main():
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
        env.pop("PYTHONPATH", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER % {"repo": REPO}],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    rc = 0
    for p in procs:
        out, _ = p.communicate(timeout=600)
        txt = out.decode()
        print(txt[-2000:])
        rc |= p.returncode
    if rc == 0:
        print("MULTIHOST OK")
    else:
        print("MULTIHOST FAILED")
    sys.exit(rc)


if __name__ == "__main__":
    main()
