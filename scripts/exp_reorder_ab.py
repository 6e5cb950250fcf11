"""A/B the round-4 drain changes on the real TPU, in ONE process (the
tunnel compiler serializes and drifts; only same-process comparisons are
trustworthy — CLAUDE.md).

Variants (each over the full bench workload, fresh session each):
  base      — SLAM_EARLY_VERIFY=0, SPEC_LOOP on (round-3 behavior)
  early     — early-verify ordering, SPEC_LOOP on
  early_ns  — early-verify ordering, SPEC_LOOP off (batch program
              sheds the speculative verify's device time)
First pass of each variant warms any new executables; second pass is
the honest wall-clock. ATE printed per pass (must stay ~0.027).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

import bench  # noqa: E402
from slam_toolbox_tpu.mapper import streaming  # noqa: E402
from slam_toolbox_tpu.api import SlamSession  # noqa: E402
from slam_toolbox_tpu.io.dataset import ate_rmse  # noqa: E402

cfg, laser, data = bench.make_workload()
drain = 192


def run(tag):
    sess = SlamSession(cfg, laser, streaming=True, drain_every=drain)
    sess.stats.enabled = True
    gt, odo = [], []
    t0 = time.time()
    for i, (rec, tp) in enumerate(data):
        out = sess.process_scan(rec.ranges, rec.odom_pose, time=i * 0.1)
        if out is not None:
            gt.append(tp)
            odo.append(rec.odom_pose)
    sess.flush()
    wall = time.time() - t0
    scans = sess.mapper.all_processed_scans()
    est = np.stack([s.corrected_pose for s in scans])
    k = min(len(est), len(gt))
    ate = ate_rmse(est[:k], np.stack(gt)[:k])
    n = len(gt)
    print(f"## {tag}: {n} scans {wall:.2f}s = {n/wall:.1f} scans/s "
          f"ATE {ate:.4f}", flush=True)
    keep = ("accum_window", "commit_bookkeep", "drain_fetch",
            "loop_closure_settle", "loop_verify_wait", "batch_dispatch",
            "graph_edges", "solve", "refresh_state")
    for kk, v in sess.stats.summary().items():
        if kk in keep:
            print(f"#    {kk}: {v}", flush=True)
    return n / wall, ate


for variant, early, spec in (
    ("base", False, True),
    ("early", True, True),
    ("early_ns", True, False),
):
    streaming.EARLY_VERIFY = early
    streaming.SPEC_LOOP = spec
    r1, a1 = run(f"{variant} warm")
    r2, a2 = run(f"{variant} meas")
    print(f"== {variant}: {r2:.1f} scans/s (warm {r1:.1f}) ATE {a2:.4f}",
          flush=True)
