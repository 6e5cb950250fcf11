"""Profile the HOST-side per-scan path (accum/gating window) on CPU.

The TPU bench's remaining cycle at drain 192 is ~420 ms batch exec +
~110 bookkeep + ~130 settle + ~180 accum/gating. The accum window is
pure host Python/numpy (gating, scan_pack, chunk staging) — profile it
here without the tunnel to find what the ~0.94 ms/scan actually is.
"""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

cfg, laser, data = bench.make_workload()
print(f"workload: {len(data)} sim steps", flush=True)

from slam_toolbox_tpu.core.scan import LocalizedScan  # noqa: E402
from slam_toolbox_tpu.mapper.streaming import scan_pack  # noqa: E402
from slam_toolbox_tpu.mapper.mapper import Mapper  # noqa: E402

# --- component micro-timings -------------------------------------------
scans = []
for rec, _tp in data[:400]:
    s = LocalizedScan(laser, np.array(rec.ranges), np.asarray(rec.odom_pose))
    scans.append(s)

t0 = time.perf_counter()
for s in scans:
    laser.validate(s.ranges)
t1 = time.perf_counter()
print(f"validate: {(t1 - t0) / len(scans) * 1e3:.3f} ms/scan")

t0 = time.perf_counter()
for s in scans:
    scan_pack(s)
t1 = time.perf_counter()
print(f"scan_pack (cold): {(t1 - t0) / len(scans) * 1e3:.3f} ms/scan")

# LocalizedScan construction cost (bench loop does this per sim step)
t0 = time.perf_counter()
for rec, _tp in data[:400]:
    LocalizedScan(laser, np.array(rec.ranges), np.asarray(rec.odom_pose))
t1 = time.perf_counter()
print(f"LocalizedScan ctor: {(t1 - t0) / 400 * 1e3:.3f} ms/scan")

m = Mapper(cfg)
t0 = time.perf_counter()
for i in range(1, len(scans)):
    m.has_moved_enough(scans[i], scans[i - 1])
t1 = time.perf_counter()
print(f"has_moved_enough: {(t1 - t0) / (len(scans) - 1) * 1e3:.3f} ms/scan")

# --- cProfile of a short streaming run (CPU backend) -------------------
from slam_toolbox_tpu.api import SlamSession  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
sess = SlamSession(cfg, laser, streaming=True, drain_every=32)
pr = cProfile.Profile()
pr.enable()
for i, (rec, _tp) in enumerate(data[:n]):
    sess.process_scan(rec.ranges, rec.odom_pose, time=i * 0.1)
sess.finish()
pr.disable()
buf = io.StringIO()
ps = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
ps.print_stats(45)
print(buf.getvalue())
