"""Diagnose config4 localization drift against the cached 50k prior.

Traces online-pose error every 25 accepted scans, reports the post-hoc
corrected-pose ATE of the localization buffer trajectory, and compares
drain cadences (the classic drain=1 path is the correctness baseline:
if it drifts too, the failure is matching/world, not the streaming
localization machinery).

Run: python scripts/exp_loc_diag.py [--drain 4] [--nodes 50000]
     (BENCH_CPU=1 for the CPU backend; --beam-res 3 for fast CPU runs)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--drain", type=int, default=4)
    ap.add_argument("--nodes", type=int, default=50000)
    ap.add_argument("--beam-res", dest="beam_res", type=float,
                    default=1.0 / 3)
    ap.add_argument("--budget", type=float, default=1200.0)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--no-loop", dest="no_loop", action="store_true")
    ap.add_argument("--loop-fine", dest="loop_fine", type=float, default=None)
    ap.add_argument("--loop-coarse", dest="loop_coarse", type=float,
                    default=None)
    args = ap.parse_args()

    if os.environ.get("BENCH_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from bench_suite import _cfg, _laser, _rows_world, build_prior_snapshot
    from slam_toolbox_tpu.api import SlamSession
    from slam_toolbox_tpu.api.slam import MatchType
    from slam_toolbox_tpu.io.dataset import LidarSimulator

    laser = _laser(args.beam_res)
    cache = f"/tmp/slam_prior_{args.nodes}_{laser.n_beams}.npz"
    per_row = int(60.0 / 0.3)
    if os.path.exists(cache):
        world = _rows_world((args.nodes + per_row - 1) // per_row + 1)
        print(f"# cached prior {cache}", file=sys.stderr)
    else:
        world = build_prior_snapshot(cache, args.nodes, laser)

    wps = []
    for row in range(args.rows):
        y = row * 2.0
        if row % 2 == 0:
            wps += [(1.0, y), (1.0 + 59.7, y)]
        else:
            wps += [(1.0 + 59.7, y), (1.0, y)]
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.012, 0.005), seed=29)
    data = sim.simulate(np.array(wps), step=0.3)
    print(f"# {len(data)} localization scans", file=sys.stderr)

    cfg = _cfg(minimum_travel_distance=0.2)
    import dataclasses

    if args.no_loop:
        cfg = dataclasses.replace(cfg, do_loop_closing=False)
    if args.loop_fine is not None:
        cfg = dataclasses.replace(
            cfg, loop_match_minimum_response_fine=args.loop_fine
        )
    if args.loop_coarse is not None:
        cfg = dataclasses.replace(
            cfg, loop_match_minimum_response_coarse=args.loop_coarse
        )
    loc = SlamSession(cfg, laser, mode="localization", streaming=True,
                      drain_every=args.drain)
    loc.stats.enabled = True
    t0 = time.time()
    loc.deserialize(cache, MatchType.LOCALIZE_AT_POSE,
                    initial_pose=data[0][1])
    print(f"# deserialize {loc.mapper.solver.n_nodes} nodes "
          f"in {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    err, gt_list, acc = [], [], []
    for i, (scan, tp) in enumerate(data):
        out = loc.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        if out is not None:
            e = float(np.hypot(*(out[0][:2] - tp[:2])))
            err.append(e)
            gt_list.append(tp)
            acc.append(scan)
            if len(err) % 25 == 0:
                print(f"# scan {i} acc={len(err)} online_err={e:.3f} "
                      f"p50so far={np.percentile(err, 50):.3f} "
                      f"t={time.time()-t0:.0f}s",
                      file=sys.stderr, flush=True)
        if time.time() - t0 > args.budget:
            print("# budget", file=sys.stderr)
            break
    loc.flush()
    wall = time.time() - t0

    # post-hoc: corrected poses vs ground truth (drain lag excluded —
    # pure matching quality)
    traj = loc.trajectory
    if len(traj) and len(gt_list):
        # trajectory = corrected poses of all processed scans (incl.
        # relocalization seed); align lengths from the tail
        k = min(len(traj), len(gt_list))
        te = np.hypot(*(np.asarray(traj)[-k:, :2] - np.asarray(gt_list)[-k:, :2]).T)
        print(f"# corrected-pose err p50={np.percentile(te,50):.3f} "
              f"p90={np.percentile(te,90):.3f} max={te.max():.3f}",
              file=sys.stderr)
    e = np.asarray(err)
    print(f"# online err p50={np.percentile(e,50):.3f} "
          f"p90={np.percentile(e,90):.3f} max={e.max():.3f} "
          f"rmse={np.sqrt(np.mean(e**2)):.3f}; {len(e)} scans "
          f"in {wall:.0f}s", file=sys.stderr)
    for kk, v in loc.stats.summary().items():
        print(f"# stage {kk}: {v}", file=sys.stderr)
    print(f"# counts: {dict(loc.stats.counts)}", file=sys.stderr)
    print("{}")


if __name__ == "__main__":
    main()
