"""BASELINE config 5: 500k-node multi-session merge + sharded solve.

Synthesizes S serialized warehouse sessions totalling ~500k nodes
(procedural trajectories + simulated lidar, corrected poses perturbed so
the joint solve has work), then runs the REAL product path end to end:

  1. `MapMerger.add_submap` deserializes every session,
  2. `auto_align` rigidly registers adjacent sessions by wide-window
     correlative matching,
  3. `merge()` re-rasters the global occupancy grid through the native
     Bresenham accumulator (kernels/occupancy.py `_accumulate`; the XLA
     scatter path would take tens of minutes at this scale),
  4. the joint 500k-node pose graph (all sessions + cross-session
     alignment edges) takes distributed Gauss-Newton steps on the
     8-device mesh (dist/solver_dist, block-Jacobi Schwarz).

Writes MERGE500K.json. Run (CPU mesh):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/bench_merge500k.py
Scale knobs: --nodes-per, --sessions (default 8 x 62500 = 500k).
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def build_session(sess_idx, nodes, laser, world, y0, rng):
    """One serpentine mapping session as a ready Mapper (skeleton build:
    poses + scans + odometry chain; corrected poses carry realistic
    residual error so the joint solve has something to do)."""
    from slam_toolbox_tpu.core.scan import LocalizedScan
    from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld
    from slam_toolbox_tpu.core.params import MapperConfig
    from slam_toolbox_tpu.mapper import Mapper

    step = 0.3
    aisle_len = 60.0
    per_aisle = int(aisle_len / step)
    # windowed sub-worlds per aisle: ray casting is O(beams * segments),
    # and the full warehouse has ~10^4 shelving segments while only those
    # within max_range of the aisle can be hit — a per-aisle window keeps
    # the 500k-scan simulation to minutes instead of hours
    segs = world.segments
    seg_ymin = np.minimum(segs[:, 1], segs[:, 3])
    seg_ymax = np.maximum(segs[:, 1], segs[:, 3])
    sub_sims = {}

    def sim_for(aisle):
        s = sub_sims.get(aisle)
        if s is None:
            y = y0 + aisle * 2.0
            keep = (seg_ymax >= y - 13.0) & (seg_ymin <= y + 13.0)
            s = LidarSimulator(
                SegmentWorld(segs[keep]), laser,
                range_noise=0.01, seed=100 + sess_idx,
            )
            sub_sims[aisle] = s
        return s

    m = Mapper(MapperConfig(use_scan_matching=False))
    m.initialize(laser.range_threshold)
    sm = m.sensor_manager
    cov = np.diag([1e-3, 1e-3, 1e-4])
    prev = None
    t0 = time.time()
    for i in range(nodes):
        aisle, k = divmod(i, per_aisle)
        y = y0 + aisle * 2.0
        x = k * step if aisle % 2 == 0 else (per_aisle - 1 - k) * step
        th = 0.0 if aisle % 2 == 0 else np.pi
        gt = np.array([x, y, th])
        r = sim_for(aisle).scan_at(gt)
        corrected = gt + rng.normal(0, [0.02, 0.02, 0.005])
        odom = gt + rng.normal(0, [0.05, 0.05, 0.01])
        s = LocalizedScan(laser, r, odom, time=float(i))
        s.set_corrected_pose(corrected)
        sm.add_scan(s)
        m.graph.add_vertex(s)
        if prev is not None:
            m.graph.link_scans(prev, s, s.sensor_pose, cov)
        prev = s
        if i and i % 20000 == 0:
            print(f"#   session {sess_idx}: {i}/{nodes} scans "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=8)
    ap.add_argument("--nodes-per", type=int, default=62500)
    ap.add_argument("--beams", type=int, default=61)
    ap.add_argument("--resolution", type=float, default=0.1)
    ap.add_argument("--gn-steps", type=int, default=3)
    args = ap.parse_args()

    from slam_toolbox_tpu.api.merge import MapMerger
    from slam_toolbox_tpu.core.scan import LaserConfig
    from slam_toolbox_tpu.io.dataset import SegmentWorld
    from slam_toolbox_tpu.io.serialization import save_snapshot

    laser = LaserConfig(
        beam_count=args.beams, min_angle=-np.pi / 2, max_angle=np.pi / 2,
        min_range=0.05, max_range=12.0, range_threshold=10.0, is_360=False,
    )
    # warehouse: long horizontal walls every 2 m spanning all sessions
    n_rows = args.sessions * (args.nodes_per // int(60.0 / 0.3) + 2) + 4
    segs = []
    width = 62.0
    for row in range(n_rows):
        y = row * 2.0 - 1.0
        # broken shelving walls (gaps make scans locally distinctive)
        for x0 in np.arange(-1.0, width, 7.0):
            segs.append((x0, y, min(x0 + 5.5, width), y))
    segs.append((-1.0, -1.0, -1.0, n_rows * 2.0))
    segs.append((width, -1.0, width, n_rows * 2.0))
    world = SegmentWorld(np.array(segs, dtype=np.float64))

    rng = np.random.default_rng(7)
    tmp = tempfile.mkdtemp()
    results = {"sessions": args.sessions, "nodes_per": args.nodes_per}
    t_all = time.time()

    per_aisle = int(60.0 / 0.3)
    n_aisles = (args.nodes_per + per_aisle - 1) // per_aisle
    # overlap by an EVEN aisle offset: the serpentine alternates travel
    # direction per aisle and FindValidPoints back-face-culls opposing
    # scans (Mapper.cpp:986-1030 semantics), so the shared aisle must be
    # driven the same way in both sessions for auto_align to see it
    off_aisles = n_aisles - 1
    if off_aisles % 2:
        off_aisles -= 1
    paths = []
    t0 = time.time()
    for s in range(args.sessions):
        y0 = s * off_aisles * 2.0
        m = build_session(s, args.nodes_per, laser, world, y0, rng)
        p = os.path.join(tmp, f"session{s}.npz")
        save_snapshot(m, p)
        paths.append(p)
        print(f"# session {s}: {m.solver.n_nodes} nodes "
              f"({time.time()-t0:.0f}s cum)", file=sys.stderr, flush=True)
        del m
    results["build_s"] = round(time.time() - t0, 1)

    merger = MapMerger()
    t0 = time.time()
    for p in paths:
        merger.add_submap(p)
    results["load_s"] = round(time.time() - t0, 1)
    total_nodes = sum(len(s) for s in merger.submaps)
    results["total_nodes"] = total_nodes
    print(f"# loaded {total_nodes} nodes in {results['load_s']}s",
          file=sys.stderr, flush=True)

    t0 = time.time()
    aligned = 0
    for s in range(1, args.sessions):
        r = merger.auto_align(s - 1, s, search_size=2.0,
                              resolution=0.05, min_response=0.2)
        aligned += r is not None
    results["aligned"] = aligned
    results["align_s"] = round(time.time() - t0, 1)
    print(f"# auto-aligned {aligned}/{args.sessions - 1} "
          f"in {results['align_s']}s", file=sys.stderr, flush=True)

    t0 = time.time()
    grid = merger.merge(resolution=args.resolution)
    dt = time.time() - t0
    results["merge_s"] = round(dt, 1)
    results["merge_nodes_per_sec"] = round(total_nodes / dt, 1)
    results["grid_shape"] = list(grid.cells.shape)
    print(f"# merged occupancy {grid.cells.shape} in {dt:.1f}s "
          f"({total_nodes / dt:.0f} nodes/s)", file=sys.stderr, flush=True)

    # joint sharded solve: all sessions' chains + cross-session edges
    from jax.sharding import Mesh

    from slam_toolbox_tpu.dist.solver_dist import distributed_lm_solve

    t0 = time.time()
    n = total_nodes
    n_pad = 1
    while n_pad < n:
        n_pad <<= 1
    poses = np.zeros((n_pad, 3), np.float32)
    srcs, dsts, rels, sis = [], [], [], []
    si_odom = np.linalg.cholesky(
        np.linalg.inv(np.diag([1e-3, 1e-3, 1e-4]))).T
    si_x = np.linalg.cholesky(
        np.linalg.inv(np.diag([4e-3, 4e-3, 4e-4]))).T
    base = 0
    bases = []
    from slam_toolbox_tpu.core import geometry

    for scans in merger.submaps:
        bases.append(base)
        for i, sc in enumerate(scans):
            poses[base + i] = sc.corrected_pose
        for i in range(len(scans) - 1):
            srcs.append(base + i)
            dsts.append(base + i + 1)
            # measurement noise on the chain constraints so the joint
            # solve has real residuals to balance against the cross edges
            rels.append(np.asarray(geometry.relative_pose(
                scans[i].corrected_pose, scans[i + 1].corrected_pose
            )) + rng.normal(0, [0.002, 0.002, 0.0005]))
            sis.append(si_odom)
        base += len(scans)
    # cross-session edges: every 64th node of session s against the
    # spatially nearest node of session s-1 (bands overlap one aisle)
    for s in range(1, args.sessions):
        a = merger.submaps[s - 1]
        b = merger.submaps[s]
        axy = np.stack([sc.corrected_pose[:2] for sc in a])
        for i in range(0, len(b), 64):
            bxy = b[i].corrected_pose[:2]
            j = int(np.argmin(np.sum((axy - bxy) ** 2, axis=1)))
            if np.hypot(*(axy[j] - bxy)) < 1.0:
                srcs.append(bases[s - 1] + j)
                dsts.append(bases[s] + i)
                rels.append(np.asarray(geometry.relative_pose(
                    a[j].corrected_pose, b[i].corrected_pose
                ) + rng.normal(0, 0.004, 3)))
                sis.append(si_x)
    e = len(srcs)
    devices = jax.devices()
    nd = len(devices)
    e_pad = ((e + nd - 1) // nd) * nd
    src = np.full(e_pad, n_pad - 1, np.int64)
    dst = np.full(e_pad, n_pad - 1, np.int64)
    rel = np.zeros((e_pad, 3))
    si = np.zeros((e_pad, 3, 3))
    em = np.zeros(e_pad, bool)
    src[:e] = srcs
    dst[:e] = dsts
    rel[:e] = rels
    si[:e] = sis
    em[:e] = True
    free = np.ones(n_pad, np.float32)
    free[n:] = 0
    free[0] = 0
    mesh = Mesh(np.array(devices), ("graph",))
    print(f"# joint graph: {n} nodes, {e} edges; solving "
          f"{args.gn_steps} GN steps on {nd} devices",
          file=sys.stderr, flush=True)
    out, chi2 = distributed_lm_solve(
        mesh, poses, src, dst, rel, si, em, free,
        max_iterations=args.gn_steps, cg_iters=50, block=512,
    )
    results["solve_s"] = round(time.time() - t0, 1)
    results["solve_chi2"] = float(chi2)
    results["solve_cg_iters"] = distributed_lm_solve.last_cg_iters
    results["solve_devices"] = nd
    print(f"# sharded solve: chi2={chi2:.1f} in {results['solve_s']}s "
          f"cg={results['solve_cg_iters']}", file=sys.stderr, flush=True)

    results["total_s"] = round(time.time() - t_all, 1)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MERGE500K.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({
        "metric": "merge_nodes_total", "value": total_nodes,
        "unit": "nodes", "merge_s": results["merge_s"],
    }))
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__" and not os.environ.get("MERGE500K_PROJECT_ONLY"):
    main()


def project_chip_solve(n, e, cg_iters, n_devices,
                       hbm_gbps=818.0, coll_us=20.0, launch_us=150.0):
    """Project the distributed solve onto real TPU chips (VERDICT r3
    next #7): the CPU-mesh wall time is contention-bound; the chip
    projection models the solve as HBM-bandwidth-bound streaming over
    the edge shards, calibrated by the measured on-chip rate of the
    Pallas smear kernel (~818 GB/s effective, CLAUDE.md round-2
    measurement on this chip).

    Per CG iteration (per device, E/n_devices edges + N/n_devices
    nodes):
      - block matvec: ~120 B/edge (two 3x3 f32 blocks + index/vector
        gather-scatter traffic),
      - two-level Schwarz V-cycle + vector ops: ~200 B/node,
      - one psum + ring collective latency ~coll_us,
      - kernel-launch/fusion overhead ~launch_us per iteration.
    Per LM step: ~3 extra edge passes (residual/Jacobian refresh).
    """
    bytes_iter = 120.0 * e / n_devices + 200.0 * n / n_devices
    t_iter = bytes_iter / (hbm_gbps * 1e9) + (coll_us + launch_us) * 1e-6
    total_cg = sum(cg_iters)
    lm_steps = len(cg_iters)
    t_lm = 3.0 * (120.0 * e / n_devices) / (hbm_gbps * 1e9) + 1e-3
    return total_cg * t_iter + lm_steps * t_lm


if __name__ == "__main__" and os.environ.get("MERGE500K_PROJECT_ONLY"):
    # patch an existing artifact with the chip projection without
    # rerunning the 40-minute build
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MERGE500K.json")
    with open(path) as f:
        r = json.load(f)
    n = r["total_nodes"]
    e = n - r["sessions"] + (n // 64)  # chains + cross edges (approx)
    for nd in (8, 16):
        r[f"projected_chip_solve_s_{nd}dev"] = round(
            project_chip_solve(n, e, r["solve_cg_iters"], nd), 4
        )
    r["projection_model"] = (
        "HBM-bandwidth-bound: 120 B/edge matvec + 200 B/node "
        "V-cycle+vectors per CG iteration at 818 GB/s (calibrated by "
        "the measured Pallas smear kernel rate on this chip), + 20 us "
        "collective + 150 us launch overhead per iteration and 3 edge "
        "passes per LM step; cg_iters from the real converged run. "
        "Compute is not the bound (~100 FLOP/edge)."
    )
    with open(path, "w") as f:
        json.dump(r, f, indent=1)
    print(json.dumps({k: r[k] for k in r if "projected" in k}))
    sys.exit(0)
