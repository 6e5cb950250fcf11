"""A/B: loop-attempt cadence x drain size on the bench workload (TPU).

On the 16-lap mapping bench a closure fires at EVERY drain (each drain
covers ~2 laps), its correction is cm-scale (drift since the previous
closure), so the staleness-gated resync stays hot and every drain pays
the settle-first serialization (~875 ms/drain: exposed 600 ms batch +
145 ms verify settle + 90 ms bookkeep). Rate-limiting loop attempts
(loop_attempt_interval_scans) makes attempt-free drains dispatch-first
(fully overlapped); the final ATE is dominated by the terminal solve,
not the online correction cadence.

One process, warm first (shared module-level executables), then one
measured pass per variant. Run: python scripts/exp_loop_interval_ab.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from slam_toolbox_tpu.api import SlamSession  # noqa: E402
from slam_toolbox_tpu.io.dataset import ate_rmse  # noqa: E402

VARIANTS = [
    # (drain, loop_attempt_interval_scans)
    (256, 0),
    (256, 384),
    (256, 512),
    (320, 384),
]


def run(cfg, laser, data, drain, tag):
    sess = SlamSession(cfg, laser, streaming=True, drain_every=drain)
    t0 = time.time()
    gt = []
    n = 0
    for i, (scan, tp) in enumerate(data):
        out = sess.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        if out is not None:
            n += 1
            gt.append(tp)
    sess.flush()
    wall = time.time() - t0
    est = np.stack([s.corrected_pose for s in
                    sess.mapper.all_processed_scans()])
    k = min(len(est), len(gt))
    ate = ate_rmse(est[:k], np.stack(gt)[:k])
    print(f"{tag}: {n} scans in {wall:.1f}s = {n/wall:.1f} scans/s "
          f"ATE {ate:.4f}", flush=True)
    return n / wall, ate


def main():
    cfg0, laser, data = bench.make_workload()

    # warm: one full pass per distinct drain bucket (compiles)
    import dataclasses

    for drain in sorted({d for d, _ in VARIANTS}):
        t0 = time.time()
        run(cfg0, laser, data, drain, f"warm(drain={drain})")
        print(f"# warm drain={drain} took {time.time()-t0:.0f}s",
              flush=True)

    results = {}
    for drain, interval in VARIANTS:
        cfg = dataclasses.replace(
            cfg0, loop_attempt_interval_scans=interval
        )
        results[(drain, interval)] = run(
            cfg, laser, data, drain, f"drain={drain} interval={interval}"
        )
    print("# summary")
    for k, (sps, ate) in results.items():
        print(f"#   drain={k[0]} interval={k[1]}: {sps:.1f} scans/s "
              f"ATE {ate:.4f}")


if __name__ == "__main__":
    main()
