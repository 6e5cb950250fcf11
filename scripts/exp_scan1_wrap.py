"""Does wrapping the matcher's raster/score programs in a length-1
lax.scan recover the straight-line compile pathology (measured ~6-10x on
the loop-verify program)?

Times a realistic near-chain-style match (raster 16Ki points + fused
score) amortized over 6 dispatches with one final fetch.

Run: python scripts/exp_scan1_wrap.py > /tmp/exp_scan1.txt 2>&1
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from slam_toolbox_tpu.core.scan import LocalizedScan
from slam_toolbox_tpu.mapper import Mapper
from slam_toolbox_tpu.kernels import match as mk


def scan1(fn):
    """Length-1 lax.scan shell around a jittable impl."""
    def wrapped(*args, **kw):
        def step(c, _):
            return c, fn(*args, **kw)

        _, out = jax.lax.scan(step, 0, None, length=1)
        return jax.tree_util.tree_map(lambda x: x[0], out)

    return wrapped


def main():
    cfg, laser, data = bench.make_workload()
    m = Mapper(cfg)
    m.initialize(laser.range_threshold)
    seq = m.sequential_matcher

    scans = []
    for i, (scan, tp) in enumerate(data[:40]):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        s.unique_id = i
        s.state_id = i
        scans.append(s)
    chain = scans[:10]
    query = scans[30]

    def run(tag, raster_jit, score_jit, reps=6):
        orig_r, orig_s = mk._raster_jit, mk._score_jit
        mk._raster_jit = raster_jit
        mk._score_jit = score_jit
        try:
            packs = seq.dispatch_scans_batch(query, [chain], refine=True)
            np.asarray(jnp.stack(packs))  # compile + sync
            t0 = time.perf_counter()
            allp = []
            for _ in range(reps):
                allp += seq.dispatch_scans_batch(query, [chain],
                                                 refine=True)
            out = np.asarray(jnp.stack(allp))
            dt = (time.perf_counter() - t0) / reps
            print(f"{tag:24s} amort {1e3*dt:7.1f} ms per match "
                  f"resp={out[0,0]:.4f}", flush=True)
            return out[:1]
        finally:
            mk._raster_jit = orig_r
            mk._score_jit = orig_s

    base = run("straight-line (current)", mk._raster_jit, mk._score_jit)

    wrapped_r = jax.jit(
        scan1(mk._raster_quant_impl),
        static_argnames=("grid_size", "half_kernel", "acc_r", "parity"),
    )
    wrapped_s = jax.jit(
        scan1(mk._score_impl),
        static_argnames=("grid_size", "na_coarse", "na_fine", "refine",
                         "acc_r"),
    )
    got = run("scan1-wrapped", wrapped_r, wrapped_s)
    print("identical:", np.array_equal(base, got), flush=True)


if __name__ == "__main__":
    main()
