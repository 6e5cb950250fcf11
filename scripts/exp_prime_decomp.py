"""Decompose relocalization first-touch (prime) cost at the 100k prior
(VERDICT r3 #5). Uses the cached /tmp prior; cProfile over the single
prime scan shows host hot spots, stats show device waits.
"""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo/scripts")
from bench_suite import _cfg, _laser, _load_lap  # noqa: E402

from slam_toolbox_tpu.api import SlamSession  # noqa: E402
from slam_toolbox_tpu.api.slam import MatchType  # noqa: E402

laser = _laser(1.0 / 3)
snap = "/tmp/slam_prior_100000_1081.npz"
lap = _load_lap("/tmp/slam_loc_lap_100000_1081_4.npz", laser)

cfg = _cfg(minimum_travel_distance=0.2,
           loop_match_maximum_variance_coarse=0.16,
           loop_match_maximum_variance_fine=0.09,
           loop_closure_maximum_jump=1.0,
           localization_solve_radius=20.0,
           loop_attempt_interval_scans=16)
loc = SlamSession(cfg, laser, mode="localization", streaming=True,
                  drain_every=16)
loc.stats.enabled = True
t0 = time.time()
loc.deserialize(snap, MatchType.LOCALIZE_AT_POSE,
                initial_pose=lap[0][1])
print(f"deserialize {time.time()-t0:.1f}s", flush=True)

s0, tp0 = lap[0]
pr = cProfile.Profile()
t0 = time.time()
pr.enable()
loc.process_scan(s0.ranges, s0.odom_pose, time=0.0)
pr.disable()
print(f"prime {time.time()-t0:.2f}s", flush=True)
buf = io.StringIO()
pstats.Stats(pr, stream=buf).sort_stats("cumulative").print_stats(35)
print(buf.getvalue())
for k, v in loc.stats.summary().items():
    print(f"# stage {k}: {v}")
