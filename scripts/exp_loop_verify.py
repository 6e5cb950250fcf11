"""Split the fused loop-verify cost: host pack prep, uploads, device
program, fetch — on a realistic 43-scan chain from the bench world.

Run: python scripts/exp_loop_verify.py > /tmp/exp_lv.txt 2>&1
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

import bench
from slam_toolbox_tpu.core.scan import LocalizedScan
from slam_toolbox_tpu.mapper import Mapper
from slam_toolbox_tpu.kernels import loop_verify as lv


def main():
    cfg, laser, data = bench.make_workload()
    mapper = Mapper(cfg)
    mapper.initialize(laser.range_threshold)

    scans = []
    for i, (scan, tp) in enumerate(data[:160]):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        s.unique_id = i
        s.state_id = i
        scans.append(s)
    chain = scans[:43]
    query = scans[120]

    def event(tag, reps):
        for r in range(reps):
            t0 = time.perf_counter()
            packs = lv.dispatch_loop_verify(
                mapper.loop_matcher, mapper.sequential_matcher,
                query, [chain], cfg,
            )
            t1 = time.perf_counter()
            stacked = jnp.stack(packs)
            stacked.block_until_ready()
            t2 = time.perf_counter()
            rows = np.asarray(stacked, np.float64)
            t3 = time.perf_counter()
            print(f"{tag} rep{r}: dispatch {1e3*(t1-t0):7.1f} ms  "
                  f"block {1e3*(t2-t1):7.1f} ms  fetch {1e3*(t3-t2):6.1f} ms"
                  f"  gate={rows[0, 26]}", flush=True)

    # rep0 pays compiles + per-scan pack uploads; later reps use cached
    # device packs (scan._pack_dev) — the delta is the upload+prep cost
    event("warm", 5)

    # fresh scan objects: re-pays scan_pack + device_put per chain scan
    for r in range(2):
        chain2 = []
        for s in chain:
            c = LocalizedScan(laser, s.ranges, s.odom_pose, s.time)
            c.unique_id = s.unique_id
            c.state_id = s.state_id
            chain2.append(c)
        t0 = time.perf_counter()
        packs = lv.dispatch_loop_verify(
            mapper.loop_matcher, mapper.sequential_matcher,
            query, [chain2], cfg,
        )
        t1 = time.perf_counter()
        stacked = jnp.stack(packs)
        stacked.block_until_ready()
        t2 = time.perf_counter()
        print(f"fresh rep{r}: dispatch {1e3*(t1-t0):7.1f} ms  "
              f"block {1e3*(t2-t1):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
