"""Drain-cadence A/B on the real TPU after the round-4 early-verify
reorder: per-drain fixed costs (loop verify, solve, refresh, dispatch)
amortize over drain_every scans, while correction latency and the
batch's exposed device time grow with it. One process, two passes per
cadence (first warms the cadence's executables).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

import bench  # noqa: E402
from slam_toolbox_tpu.api import SlamSession  # noqa: E402
from slam_toolbox_tpu.io.dataset import ate_rmse  # noqa: E402

cfg, laser, data = bench.make_workload()


def run(drain):
    sess = SlamSession(cfg, laser, streaming=True, drain_every=drain)
    gt = []
    t0 = time.time()
    for i, (rec, tp) in enumerate(data):
        out = sess.process_scan(rec.ranges, rec.odom_pose, time=i * 0.1)
        if out is not None:
            gt.append(tp)
    sess.flush()
    wall = time.time() - t0
    scans = sess.mapper.all_processed_scans()
    est = np.stack([s.corrected_pose for s in scans])
    k = min(len(est), len(gt))
    ate = ate_rmse(est[:k], np.stack(gt)[:k])
    return len(gt) / wall, ate


for drain in (192, 256, 320, 384):
    r1, a1 = run(drain)
    r2, a2 = run(drain)
    print(f"== drain {drain}: {r2:.1f} scans/s (warm {r1:.1f}) "
          f"ATE {a2:.4f}", flush=True)
