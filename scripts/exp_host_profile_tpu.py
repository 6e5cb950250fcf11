"""Profile host-side work in the REAL TPU streaming bench.

Pass 1 warms every executable; pass 2 runs under cProfile. Device waits
show up in block_until_ready / np.asarray; everything else with tottime
is host Python — the vectorization target list (VERDICT r3 next #1).
"""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

import bench  # noqa: E402
from slam_toolbox_tpu.api import SlamSession  # noqa: E402

cfg, laser, data = bench.make_workload()
n = int(sys.argv[1]) if len(sys.argv) > 1 else len(data)
drain = int(sys.argv[2]) if len(sys.argv) > 2 else 192
data = data[:n]
print(f"workload: {len(data)} steps, drain {drain}", flush=True)

for tag in ("warm", "measure"):
    sess = SlamSession(cfg, laser, streaming=True, drain_every=drain)
    sess.stats.enabled = True
    pr = cProfile.Profile()
    t0 = time.time()
    if tag == "measure":
        pr.enable()
    for i, (rec, _tp) in enumerate(data):
        sess.process_scan(rec.ranges, rec.odom_pose, time=i * 0.1)
        if i % 200 == 0:
            print(f"# {tag} {i} t={time.time()-t0:.1f}s", flush=True)
    sess.flush()
    if tag == "measure":
        pr.disable()
    wall = time.time() - t0
    naccept = len(sess.mapper.all_processed_scans())
    print(f"# {tag}: {naccept} scans in {wall:.1f}s = "
          f"{naccept/wall:.1f} scans/s", flush=True)
    for k, v in sess.stats.summary().items():
        print(f"# stage {k}: {v}", flush=True)
    if tag == "measure":
        buf = io.StringIO()
        ps = pstats.Stats(pr, stream=buf)
        ps.sort_stats("tottime").print_stats(50)
        print(buf.getvalue())
        buf = io.StringIO()
        ps = pstats.Stats(pr, stream=buf)
        ps.sort_stats("cumulative").print_stats(60)
        print(buf.getvalue())
