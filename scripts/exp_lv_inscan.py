"""Measure loop-verify DEVICE compute by scanning it 8x inside one
program (carry-varied center) — separates real compute from per-program
tunnel/host overhead.

Run: python scripts/exp_lv_inscan.py > /tmp/exp_lvs.txt 2>&1
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
from slam_toolbox_tpu.kernels import loop_verify as lv
from slam_toolbox_tpu.kernels.match import _scan_device_cache

REPS = 8


def main():
    cfg, laser, data = bench.make_workload()
    mapper = Mapper(cfg)
    mapper.initialize(laser.range_threshold)
    seq, loop = mapper.sequential_matcher, mapper.loop_matcher

    scans = []
    for i, (scan, tp) in enumerate(data[:160]):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        s.unique_id = i
        s.state_id = i
        scans.append(s)
    chain = scans[:43]
    query = scans[120]

    # build the same inputs dispatch_loop_verify builds
    Cb = lv.chain_bucket(len(chain))
    poses = np.zeros((Cb, 3), np.float32)
    cvalid = np.zeros(Cb, bool)
    devs = []
    for i, sc in enumerate(chain):
        poses[i] = sc.sensor_pose
        cvalid[i] = True
        devs.append(lv._pack_dev(sc))
    zero = jnp.zeros(devs[0].shape, jnp.float32)
    devs.extend([zero] * (Cb - len(chain)))
    packs = jnp.stack(devs)
    local_dev, finite_dev = _scan_device_cache(query)
    center = np.asarray(query.sensor_pose, np.float32)
    gates = jnp.asarray(np.array([
        cfg.loop_match_minimum_response_coarse,
        cfg.loop_match_maximum_variance_coarse,
    ], np.float32))

    kwargs = dict(
        loop_args=dict(loop._score_args),
        seq_args=dict(seq._score_args),
        loop_sigma=np.float32(loop.sigma_cells),
        seq_sigma=np.float32(seq.sigma_cells),
        loop_half_span=np.float32(0.5 * (loop.G - 1) * loop.resolution),
        seq_half_span=np.float32(0.5 * (seq.G - 1) * seq.resolution),
    )
    statics = dict(
        loop_G=loop.G, loop_hk=loop.half_kernel, loop_acc_r=loop._acc_r,
        loop_parity=loop.use_pallas, loop_na_c=loop._na_coarse,
        loop_na_f=loop._na_fine,
        seq_G=seq.G, seq_hk=seq.half_kernel, seq_acc_r=seq._acc_r,
        seq_parity=seq.use_pallas, seq_na_c=seq._na_coarse,
        seq_na_f=seq._na_fine,
    )

    def scanned(packs, poses, cvalid, local, finite, center0, gates,
                **kw):
        def step(c, _):
            row = lv._loop_verify_impl(
                packs, poses, cvalid, local, finite, c, gates,
                **kw, **statics,
            )
            # vary the carry so iterations can't be hoisted/merged
            return c + row[:3] * 1e-6, row

        _, rows = jax.lax.scan(step, center0, None, length=REPS)
        return rows

    fn = jax.jit(scanned)

    def call():
        return fn(packs, jnp.asarray(poses), jnp.asarray(cvalid),
                  local_dev, finite_dev, jnp.asarray(center), gates,
                  **kwargs)

    t0 = time.perf_counter()
    rows = call()
    np.asarray(rows)
    print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        rows = call()
    out = np.asarray(rows)
    dt = (time.perf_counter() - t0) / 3
    print(f"in-scan verify: {1e3*dt/REPS:7.2f} ms per verify "
          f"({1e3*dt:.1f} ms per {REPS}-scan program)", flush=True)
    print("gate:", out[0, 26], flush=True)


if __name__ == "__main__":
    main()


def single():
    """Same program but length-1 scan, dispatched 6x independently —
    does the scan wrapper alone recover the speed?"""
    global REPS
    REPS = 1
    main()


if "single" in sys.argv:
    single()
