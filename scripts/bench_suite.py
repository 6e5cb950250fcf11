"""Benchmark suite for the BASELINE.md configs beyond bench.py's config 1.

Each subcommand prints ONE JSON line (same shape as bench.py). Sizes are
scaled down by default so every config runs in minutes; pass --full for
the BASELINE-sized workloads.

  python scripts/bench_suite.py config2   # offline multi-lap apartment bag
  python scripts/bench_suite.py config3   # warehouse session + lifelong decay
  python scripts/bench_suite.py config4   # localization on a big prior graph
  python scripts/bench_suite.py config5   # multi-session merge + sharded solve

CPU backend: BENCH_CPU=1 (forced programmatically, the env var is
overridden by the axon sitecustomize).
"""
from __future__ import annotations

import argparse
import pathlib
import sys as _sys
_sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import json
import os
import sys
import time

import numpy as np


def _maybe_cpu():
    if os.environ.get("BENCH_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")


def _emit(metric, value, unit, baseline):
    print(json.dumps({
        "metric": metric, "value": round(value, 3), "unit": unit,
        "vs_baseline": round(value / baseline, 3) if baseline else None,
    }))


def _load_info():
    """Host load fields for every CONFIG artifact (VERDICT r4 next #4):
    a 1-min load beyond the bench's own ~2 processes on this 2-core host
    means the number is a contention-bound lower bound."""
    try:
        load = float(os.getloadavg()[0])
    except OSError:
        return {}
    return {"load_1m": round(load, 2),
            "contended": bool(load > (os.cpu_count() or 1) + 1)}


def _apartment():
    from slam_toolbox_tpu.io.dataset import SegmentWorld

    return SegmentWorld.rooms(16.0, 10.0)


def _warehouse(aisles: int = 4, length: float = 30.0, pitch: float = 4.0):
    """Aisle-grid warehouse: long racks with gaps, outer walls."""
    from slam_toolbox_tpu.io.dataset import SegmentWorld

    w = aisles * pitch + 4.0
    h = length + 4.0
    segs = [(-2, -2, w - 2, -2), (w - 2, -2, w - 2, h - 2),
            (w - 2, h - 2, -2, h - 2), (-2, h - 2, -2, -2)]
    for a in range(aisles):
        x = a * pitch + pitch / 2
        # racks with a mid-aisle gap so loops can close crosswise; inset
        # from y=0/length so the serpentine cross-legs clear the endpoints
        segs.append((x, 0.5, x, length / 2 - 1.5))
        segs.append((x, length / 2 + 1.5, x, length - 0.5))
        # rack clutter: boxes jutting into the aisle every ~7 m with
        # aisle-dependent offsets — real racks are not featureless, and
        # without longitudinal texture correlative matching can slide
        # along the aisle (observed as localization drift)
        y0 = 2.0 + 1.3 * a
        while y0 < length - 2.0:
            d = 0.25 + 0.15 * ((a + int(y0)) % 3)
            segs.append((x - d, y0, x, y0))
            segs.append((x - d, y0, x - d, y0 + 0.6))
            segs.append((x - d, y0 + 0.6, x, y0 + 0.6))
            y0 += 6.5 + 0.9 * ((a * 7 + int(y0)) % 3)
    # freestanding clutter (round-5 experiment, DEFAULT OFF): pillars at
    # seeded-RNG off-lattice positions, unique per aisle side, intended
    # to break the aisle-periodic aliasing behind the CONFIG3 online
    # excursions (VERDICT r4 next #5). MEASURED OUTCOME (40-lap A/B,
    # CONFIG3.json note): the clutter made accuracy WORSE, not better —
    # delete-variant survivors-ATE 3.55 -> 4.08 m, marginalized 0.27 ->
    # 1.64 m. At the loop matcher's 5 cm resolution the 0.24-0.64 m
    # pillars mismatch between passes (approach-angle-dependent
    # occlusion of the long-range rack geometry), degrading exactly the
    # closures they were meant to disambiguate. Kept as an opt-in knob
    # (SLAM_WAREHOUSE_CLUTTER=N pillars per aisle side) for future
    # world-design experiments; placement keeps >=0.8 m of clearance
    # from every serpentine corridor and the y=0/length cross legs so
    # simulate() trajectories stay valid.
    n_clutter = int(os.environ.get("SLAM_WAREHOUSE_CLUTTER", "0"))
    rng = np.random.default_rng(4242)
    for a in range(aisles):
        cx = a * pitch
        for side in (-1.0, 1.0):
            for _ in range(n_clutter):
                px = cx + side * rng.uniform(0.85, 1.55)
                py = rng.uniform(2.0, length - 2.0)
                s = rng.uniform(0.12, 0.32)
                segs += [
                    (px - s, py - s, px + s, py - s),
                    (px + s, py - s, px + s, py + s),
                    (px + s, py + s, px - s, py + s),
                    (px - s, py + s, px - s, py - s),
                ]
    return SegmentWorld(segs), aisles, length, pitch


def _serpentine(aisles, length, pitch):
    wps = []
    for a in range(aisles):
        x = a * pitch
        if a % 2 == 0:
            wps += [(x, 0.0), (x, length)]
        else:
            wps += [(x, length), (x, 0.0)]
    return np.array(wps)


def _laser(beam_res_deg: float = 1.0 / 3):
    from slam_toolbox_tpu.core.scan import LaserConfig

    return LaserConfig(
        min_range=0.05, max_range=12.0, range_threshold=10.0,
        angular_resolution=np.deg2rad(beam_res_deg),
    )


def _cfg(**kw):
    from slam_toolbox_tpu.core.params import MapperConfig

    base = dict(
        minimum_travel_distance=0.2, minimum_time_interval=3600.0,
        scan_buffer_size=10,
        link_match_minimum_response_fine=0.1,
        link_scan_maximum_distance=1.5,
        loop_search_maximum_distance=3.0,
        loop_match_minimum_response_coarse=0.35,
        loop_match_minimum_response_fine=0.45,
        loop_match_maximum_variance_coarse=3.0,
        correlation_search_space_dimension=0.5,
        correlation_search_space_resolution=0.01,
        correlation_search_space_smear_deviation=0.1,
        distance_variance_penalty=0.5, angle_variance_penalty=1.0,
    )
    base.update(kw)
    return MapperConfig(**base)


def _run_session(sess, data, budget_s, tag):
    from slam_toolbox_tpu.io.dataset import ate_rmse

    t0 = time.time()
    lat, gt = [], []
    t_prev = t0
    for i, (scan, tp) in enumerate(data):
        out = sess.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        t_now = time.time()
        if out is not None:
            lat.append(t_now - t_prev)
            gt.append(tp)
        t_prev = t_now
        if i % 200 == 0:
            print(f"# {tag} scan {i}/{len(data)} t={t_now-t0:.0f}s",
                  file=sys.stderr, flush=True)
        if t_now - t0 > budget_s:
            print(f"# {tag} budget reached at scan {i}", file=sys.stderr)
            break
    sess.flush()
    wall = time.time() - t0
    # honest wall-clock throughput: only one-time compile stalls (>5 s
    # latencies) are subtracted from the denominator
    lat = np.asarray(lat)
    stall = float(lat[lat >= 5.0].sum())
    sps = len(lat) / max(wall - stall, 1e-9)
    print(f"# {tag} wall={wall:.1f}s stalls={stall:.1f}s "
          f"scans={len(lat)}", file=sys.stderr)
    scans_done = sess.mapper.all_processed_scans()
    ate = None
    if scans_done and gt:
        est = np.stack([s.corrected_pose for s in scans_done])
        k = min(len(est), len(gt))
        ate = ate_rmse(est[:k], np.stack(gt)[:k])
        print(f"# {tag} ATE={ate:.3f} m over {k} scans", file=sys.stderr)
    return sps, ate, len(scans_done)


def cmd_config2(args) -> int:
    """Offline mapping of a ~5k-scan multi-lap apartment sequence
    (BASELINE config 2), 1 chip, streaming pipeline."""
    _maybe_cpu()
    from slam_toolbox_tpu.api import SlamSession
    from slam_toolbox_tpu.io.dataset import LidarSimulator

    laser = _laser(args.beam_res)
    world = _apartment()
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.015, 0.006), seed=7)
    lap = [(-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 0.5), (5.5, 3.5),
           (1.0, 3.5), (-3.0, 3.5), (-6.0, 3.0), (-6.5, -1.0), (-6.0, -3.5)]
    laps = 40 if args.full else args.laps
    wps = np.array(lap * laps)
    data = sim.simulate(wps, step=0.3)
    print(f"# config2: {len(data)} raw scans, {laps} laps", file=sys.stderr)
    # two-pass like bench.py: pass 1 fires every remote compile; pass 2
    # reports honest wall-clock with no exclusions
    t0 = time.time()
    sess = SlamSession(_cfg(), laser, streaming=True,
                       drain_every=args.drain)
    sps, ate, n = _run_session(sess, data, args.budget * 0.75, "config2w")
    if time.time() - t0 < args.budget - 60.0:
        sess = SlamSession(_cfg(), laser, streaming=True,
                           drain_every=args.drain)
        sps2, ate2, n2 = _run_session(
            sess, data, args.budget - (time.time() - t0), "config2"
        )
        if n2 >= 0.9 * n:
            sps, ate = sps2, ate2
    assert ate is None or ate < 0.15, f"accuracy regression: {ate}"
    _emit("offline_apartment_scans_per_sec", sps, "scans/s", 50.0)
    return 0


def cmd_config3(args) -> int:
    """Warehouse session with lifelong decay (BASELINE config 3): repeated
    serpentine laps; the decay keeps graph growth bounded."""
    _maybe_cpu()
    from slam_toolbox_tpu.api import SlamSession
    from slam_toolbox_tpu.io.dataset import LidarSimulator
    from slam_toolbox_tpu.mapper.lifelong import LifelongMapper

    laser = _laser(args.beam_res)
    world, aisles, length, pitch = _warehouse()
    sim = LidarSimulator(world, laser, range_noise=0.01,
                         odom_noise=(0.012, 0.005), seed=11)
    laps = 20 if args.full else args.laps
    wps = np.concatenate([_serpentine(aisles, length, pitch)] * laps)
    data = sim.simulate(wps, step=0.3)
    print(f"# config3: {len(data)} raw scans, {laps} laps", file=sys.stderr)

    def one_pass(budget, tag):
        # chain minimum 5 (localization preset uses 3): decay replaces
        # old laps, so surviving state-id runs are shorter than a fresh
        # map's — the default 10 starves the loop sweep of candidates
        sess = SlamSession(
            _cfg(loop_match_minimum_chain_size=5,
                 # A/B knob: compose removed nodes' constraints onto
                 # their neighbors instead of deleting (graph/marginal)
                 marginalize_on_removal=(
                     os.environ.get("SLAM_MARGINALIZE") == "1")),
            laser, streaming=True, drain_every=args.drain)
        if os.environ.get("BENCH_STATS") == "1":
            sess.stats.enabled = True
        from slam_toolbox_tpu.mapper.lifelong import LifelongConfig
        ll_cfg = LifelongConfig()
        if os.environ.get("SLAM_SS_MIN") is not None:  # A/B knob
            ll_cfg = LifelongConfig(steady_state_min_candidates=int(
                os.environ["SLAM_SS_MIN"]))
        lifelong = LifelongMapper(sess.mapper, ll_cfg)
        sess._ensure_pipe().post_finish = lifelong.stream_hook
        t0 = time.time()
        lat, curve, err, gts = [], [], [], []
        t_prev = t0
        for i, (scan, tp) in enumerate(data):
            out = sess.process_scan(scan.ranges, scan.odom_pose,
                                    time=i * 0.1)
            t_now = time.time()
            if out is not None:
                lat.append(t_now - t_prev)
                err.append(np.hypot(*(out[0][:2] - tp[:2])))
                gts.append(tp)
            t_prev = t_now
            if i % 200 == 0:
                nodes = sess.mapper.solver.n_nodes
                curve.append([i, int(nodes)])
                print(f"# {tag} scan {i}/{len(data)} nodes={nodes} "
                      f"t={t_now-t0:.0f}s", file=sys.stderr, flush=True)
            if t_now - t0 > budget:
                break
        sess.flush()
        wall = time.time() - t0
        lat = np.asarray(lat)
        stall = float(lat[lat >= 5.0].sum())
        nodes = sess.mapper.solver.n_nodes
        curve.append([i, int(nodes)])
        sps_raw = len(lat) / max(wall, 1e-9)
        sps_f = len(lat) / max(wall - stall, 1e-9)
        e = np.asarray(err) if err else np.zeros(1)
        # map quality: ATE over the SURVIVING nodes' corrected poses
        # (unique_id indexes the accepted order, so gts[uid] is each
        # survivor's ground truth). The per-scan online pose lags by up
        # to a drain of odometry propagation; the survivors' ATE is the
        # actual post-correction map accuracy.
        surv = sess.mapper.all_processed_scans()
        ate = None
        if surv and gts:
            pairs = [(s.corrected_pose[:2], gts[s.unique_id][:2])
                     for s in surv if s.unique_id < len(gts)]
            if pairs:
                est_a = np.stack([a for a, _ in pairs])
                gt_a = np.stack([b for _, b in pairs])
                ate = float(np.sqrt(np.mean(
                    np.sum((est_a - gt_a) ** 2, axis=1))))
        print(f"# {tag} final nodes={nodes} after {len(lat)} scans "
              f"(decay bounds growth); wall={wall:.1f}s "
              f"stalls={stall:.1f}s online p50={np.percentile(e,50):.3f} "
              f"p95={np.percentile(e,95):.3f} max={e.max():.3f} "
              f"survivors ATE={ate}",
              file=sys.stderr)
        if os.environ.get("BENCH_STATS") == "1":
            for k, v in sess.stats.summary().items():
                print(f"# stage {k}: {v}", file=sys.stderr)
        return sps_raw, sps_f, len(lat), wall, stall, curve, nodes, e, ate

    t0 = time.time()
    res = one_pass(args.budget * 0.7, "config3w")
    if time.time() - t0 < args.budget - 60.0:
        res2 = one_pass(args.budget - (time.time() - t0), "config3")
        if res2[2] >= 0.9 * res[2]:
            res = res2
    sps_raw, sps_f, n_scans, wall, stall, curve, nodes, e, ate = res
    # plateau check over the curve tail: node growth across the last
    # quarter of the run must be near zero (VERDICT r2 #2)
    tail = [c for c in curve if c[0] >= curve[-1][0] * 0.75]
    tail_growth = (tail[-1][1] - tail[0][1]) if len(tail) > 1 else 0
    tail_scans = (tail[-1][0] - tail[0][0]) if len(tail) > 1 else 1
    art = {
        "metric": "lifelong_warehouse_scans_per_sec",
        "scans_processed": int(n_scans), "raw_scans": len(data),
        "laps": laps,
        **_load_info(),
        "value_no_exclusions": round(sps_raw, 1),
        "value_stall_filtered": round(sps_f, 1),
        "wall_s": round(wall, 1), "stalls_excluded_s": round(stall, 1),
        "unit": "scans/s",
        "final_nodes": int(nodes),
        "survivors_ate_m": None if ate is None else round(ate, 3),
        "online_err_p50_m": round(float(np.percentile(e, 50)), 3),
        "online_err_p95_m": round(float(np.percentile(e, 95)), 3),
        "online_err_max_m": round(float(e.max()), 3),
        "nodes_vs_scans": curve,
        "tail_growth_nodes_per_scan": round(
            tail_growth / max(tail_scans, 1), 4),
        "pipeline": "streaming_f32_chain_rasters",
        "note": "steady-state decay (LifelongConfig."
                "steady_state_min_candidates, PARITY.md §Known): in "
                "over-covered areas the worst-scoring redundant node is "
                "removed per added scan, so revisit laps hold the node "
                "count flat.",
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CONFIG3.json"), "w") as f:
        json.dump(art, f, indent=1)
    _emit("lifelong_warehouse_scans_per_sec", sps_raw, "scans/s", 50.0)
    return 0


def _rows_world(n_rows: int, width: float = 62.0):
    """Big warehouse as horizontal broken-shelving rows every 2 m,
    scalable to arbitrarily many rows. Gap phases and box clutter vary
    per row: without longitudinal texture, correlative matching slides
    along the aisle (observed as multi-meter localization drift — the
    shelving is periodic every 7 m)."""
    from slam_toolbox_tpu.io.dataset import SegmentWorld

    segs = []
    for row in range(n_rows):
        y = row * 2.0 - 1.0
        phase = (row * 1.7) % 7.0
        # clear corridors at both x ends: the serpentine transitions rows
        # there (simulate() rejects wall-crossing trajectories)
        for x0 in np.arange(-1.0 + phase - 7.0, width, 7.0):
            a = max(x0, 2.5)
            b = min(x0 + 5.5, width - 2.5)
            if b > a:
                segs.append((a, y, b, y))
        # boxes jutting out of the shelving at irregular x (deterministic
        # per row): depth discontinuities pin the along-aisle alignment
        xb = 3.5 + ((row * 13) % 11)
        while xb < width - 3.5:
            d = 0.3 + 0.15 * ((row + int(xb)) % 3)
            segs.append((xb, y, xb, y + d))
            segs.append((xb, y + d, xb + 0.7, y + d))
            segs.append((xb + 0.7, y + d, xb + 0.7, y))
            xb += 6.3 + ((row * 7 + int(xb) * 3) % 5)
    segs.append((-1.0, -1.0, -1.0, n_rows * 2.0))
    segs.append((width, -1.0, width, n_rows * 2.0))
    return SegmentWorld(np.array(segs, dtype=np.float64))


def build_prior_snapshot(path, n_nodes, laser, seed=7):
    """Synthesize a BASELINE-config-4-scale prior directly (skeleton
    build: simulated scans at serpentine poses, odometry chain + cross-row
    loop edges, corrected poses with realistic residual noise) — building
    it through full SLAM would take hours at 50k-100k nodes; the
    localization product path only needs the serialized graph. Windowed
    per-row sub-worlds keep the 1081-beam simulation to minutes
    (scripts/bench_merge500k.py technique). Returns the world so the
    caller can localize in it."""
    from slam_toolbox_tpu.core.params import MapperConfig
    from slam_toolbox_tpu.core.scan import LocalizedScan
    from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld
    from slam_toolbox_tpu.io.serialization import save_snapshot
    from slam_toolbox_tpu.mapper import Mapper

    step = 0.3
    width = 62.0
    per_row = int(60.0 / step)  # 200 nodes per row
    n_rows = (n_nodes + per_row - 1) // per_row + 1
    world = _rows_world(n_rows, width)
    rng = np.random.default_rng(seed)

    segs = world.segments
    seg_ymin = np.minimum(segs[:, 1], segs[:, 3])
    seg_ymax = np.maximum(segs[:, 1], segs[:, 3])
    sub_sims = {}

    def sim_for(row):
        s = sub_sims.get(row)
        if s is None:
            y = row * 2.0
            keep = (seg_ymax >= y - 13.0) & (seg_ymin <= y + 13.0)
            s = LidarSimulator(SegmentWorld(segs[keep]), laser,
                               range_noise=0.01, seed=100 + row)
            sub_sims[row] = s
            if len(sub_sims) > 8:  # bounded cache
                sub_sims.pop(next(iter(sub_sims)))
        return s

    m = Mapper(MapperConfig(use_scan_matching=False))
    m.initialize(laser.range_threshold)
    sm = m.sensor_manager
    cov_odom = np.diag([1e-3, 1e-3, 1e-4])
    cov_loop = np.diag([4e-3, 4e-3, 4e-4])
    prev = None
    scans = []
    t0 = time.time()
    for i in range(n_nodes):
        row, k = divmod(i, per_row)
        y = row * 2.0  # mid-aisle: shelving lines are at odd y
        x = 1.0 + k * step if row % 2 == 0 else 1.0 + (per_row - 1 - k) * step
        th = 0.0 if row % 2 == 0 else np.pi
        gt = np.array([x, y, th])
        r = sim_for(row).scan_at(gt)
        corrected = gt + rng.normal(0, [0.015, 0.015, 0.004])
        odom = gt + rng.normal(0, [0.05, 0.05, 0.01])
        s = LocalizedScan(laser, r, odom, time=float(i))
        s.set_corrected_pose(corrected)
        sm.add_scan(s)
        m.graph.add_vertex(s)
        if prev is not None:
            m.graph.link_scans(prev, s, s.sensor_pose, cov_odom)
        # cross-row loop edge every 8th node (the connectivity real
        # sessions produce; drives near-linked BFS + solver fill)
        if row > 0 and k % 8 == 0:
            j = (row - 1) * per_row + (
                k if row % 2 == 1 else per_row - 1 - k
            )
            if 0 <= j < len(scans):
                m.graph.link_scans(scans[j], s, s.sensor_pose, cov_loop)
        scans.append(s)
        sm.set_last_scan(s)
        prev = s
        if i and i % 10000 == 0:
            print(f"# prior build {i}/{n_nodes} ({time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
    # a realistic running buffer tail
    for s in scans[-8:]:
        sm.add_running_scan(s)
    t1 = time.time()
    save_snapshot(m, path)
    print(f"# prior snapshot {n_nodes} nodes -> {path} "
          f"(build {t1-t0:.0f}s, save {time.time()-t1:.0f}s)",
          file=sys.stderr, flush=True)
    return world


def _save_lap(path, data):
    """Cache a simulated lap (raycasting a 100k-prior world costs ~10
    minutes per run; the arrays are a few MB)."""
    np.savez_compressed(
        path,
        ranges=np.stack([s.ranges for s, _ in data]),
        odom=np.stack([s.odom_pose for s, _ in data]),
        gt=np.stack([tp for _, tp in data]),
    )


def _load_lap(path, laser):
    import types

    z = np.load(path)
    out = []
    for r, o, g in zip(z["ranges"], z["odom"], z["gt"]):
        out.append((types.SimpleNamespace(ranges=r, odom_pose=o), g))
    return out


def _repeat_circuit(data, repeats, odom_noise, seed):
    """Tile a CLOSED localization circuit `repeats` times with freshly
    drawn CONTINUOUS odometry noise (ranges + ground truth repeat; the
    5k-scan steady state VERDICT r4 next #4 asks for would cost ~1 h of
    re-raycasting against the 100k-prior world otherwise)."""
    import types

    from slam_toolbox_tpu.io.dataset import _compose_np, _relative_np

    if repeats <= 1:
        return data
    rng = np.random.default_rng(seed)
    gts = [np.asarray(tp) for _, tp in data] * repeats
    ranges = [r.ranges for r, _ in data] * repeats
    out = []
    odom = np.array(gts[0])
    prev = gts[0]
    for i, (tp, rr) in enumerate(zip(gts, ranges)):
        if i > 0:
            rel = _relative_np(prev, tp)
            rel[0] += rng.normal(0, odom_noise[0])
            rel[1] += rng.normal(0, odom_noise[0] * 0.3)
            rel[2] += rng.normal(0, odom_noise[1])
            odom = _compose_np(odom, rel)
            prev = tp
        out.append((
            types.SimpleNamespace(ranges=rr, odom_pose=odom.copy()),
            np.array(tp),
        ))
    return out


def cmd_config4(args) -> int:
    """Localization against a large prior graph (BASELINE config 4):
    build + serialize a big session, then run elastic localization on a
    fresh pass and report steady localization scans/s. --prior-nodes N
    synthesizes an N-node prior directly (50k-100k scale)."""
    _maybe_cpu()
    import tempfile

    from slam_toolbox_tpu.api import SlamSession
    from slam_toolbox_tpu.api.slam import MatchType
    from slam_toolbox_tpu.io.dataset import LidarSimulator, ate_rmse

    laser = _laser(args.beam_res)
    if args.prior_nodes:
        cache = f"/tmp/slam_prior_{args.prior_nodes}_{laser.n_beams}.npz"
        snap = cache
        n_nodes = args.prior_nodes
        if os.path.exists(cache):
            per_row = int(60.0 / 0.3)
            world = _rows_world((n_nodes + per_row - 1) // per_row + 1)
            print(f"# config4: cached prior {cache}", file=sys.stderr)
        else:
            world = build_prior_snapshot(cache, n_nodes, laser)
        # localization circuit: serpentine over the first rows of the
        # big warehouse and back (CLOSED loop, same world, fresh noise)
        # — closure lets --loc-repeat tile it for a long steady state
        per_row = int(60.0 / 0.3)
        lap_rows = 4
        wps = []
        for row in range(lap_rows):
            y = row * 2.0  # mid-aisle, same lines the prior drove
            if row % 2 == 0:
                wps += [(1.0, y), (1.0 + 59.7, y)]
            else:
                wps += [(1.0 + 59.7, y), (1.0, y)]
        for row in range(lap_rows - 1, -1, -1):  # return leg
            y = row * 2.0
            if row % 2 == 0:
                wps += [(1.0 + 59.7, y), (1.0, y)]
            else:
                wps += [(1.0, y), (1.0 + 59.7, y)]
        lap_cache = (f"/tmp/slam_loc_circ_{n_nodes}_{laser.n_beams}"
                     f"_{lap_rows}.npz")
        if os.path.exists(lap_cache):
            data2 = _load_lap(lap_cache, laser)
            print(f"# config4: cached circuit {lap_cache}",
                  file=sys.stderr)
        else:
            sim2 = LidarSimulator(world, laser, range_noise=0.01,
                                  odom_noise=(0.012, 0.005), seed=29)
            data2 = sim2.simulate(np.array(wps), step=0.3)
            _save_lap(lap_cache, data2)
        if getattr(args, "loc_repeat", 1) > 1:
            data2 = _repeat_circuit(
                data2, args.loc_repeat, (0.012, 0.005), seed=31
            )
            print(f"# config4: circuit x{args.loc_repeat} = "
                  f"{len(data2)} raw scans", file=sys.stderr)
    else:
        world, aisles, length, pitch = _warehouse()
        sim = LidarSimulator(world, laser, range_noise=0.01,
                             odom_noise=(0.012, 0.005), seed=13)
        laps = 12 if args.full else max(1, args.laps // 2)
        wps = np.concatenate([_serpentine(aisles, length, pitch)] * laps)
        data = sim.simulate(wps, step=0.3)
        print(f"# config4: building prior graph from {len(data)} scans",
              file=sys.stderr)
        build = SlamSession(_cfg(), laser, streaming=True,
                            drain_every=args.drain)
        for i, (scan, tp) in enumerate(data):
            build.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        build.flush()
        n_nodes = build.mapper.solver.n_nodes
        snap = os.path.join(tempfile.mkdtemp(), "prior.npz")
        build.serialize(snap)
        print(f"# config4: prior graph {n_nodes} nodes -> {snap}",
              file=sys.stderr)

        sim2 = LidarSimulator(world, laser, range_noise=0.01,
                              odom_noise=(0.012, 0.005), seed=29)
        data2 = sim2.simulate(_serpentine(aisles, length, pitch), step=0.3)
    # localization returns the prior-propagated pose between drains, so
    # the drain cadence bounds the online pose lag: heading drift over an
    # 8-scan lag costs 10-20 cm at these odometry noise levels. With the
    # fused pool-gather chain matching the drain bookkeeping is cheap, so
    # a short cadence keeps both error and throughput
    # round-3: the LOCALIZATION self-similarity defenses (reference
    # coarse-variance default 0.16 instead of the loose yaml 3.0, a
    # fine-variance ceiling, and a 1 m closure-jump cap — drift between
    # corrections is cm-scale, so a 2 m row-aliased correction is
    # rejected; PoseGraph._loop_accept, PARITY.md §Known), plus the
    # windowed elastic solve and a 16-scan loop-attempt cadence
    def _loc_cfg():
        return _cfg(minimum_travel_distance=0.2,
                    loop_match_maximum_variance_coarse=0.16,
                    loop_match_maximum_variance_fine=0.09,
                    loop_closure_maximum_jump=1.0,
                    localization_solve_radius=20.0,
                    loop_attempt_interval_scans=16)

    # WARM PASS (two-pass like bench.py): the tunneled TPU has no
    # persistent executable cache, so a cold single pass pays every
    # (batch, chain-bucket, verify) compile mid-run — the measured
    # floor of the round-3 cold runs. Module-level jits share
    # executables across sessions in-process.
    t_w = time.time()
    warm = SlamSession(_loc_cfg(), laser, mode="localization",
                       streaming=True, drain_every=min(args.drain, 16))
    warm.deserialize(snap, MatchType.LOCALIZE_AT_POSE,
                     initial_pose=data2[0][1])
    # cover the FULL sequence: loop events in later rows hit chain/solver
    # buckets a truncated warm never compiles (round-3: a 400-scan warm
    # left 27 s of residual stalls in the measured pass)
    for i, (scan, tp) in enumerate(data2):
        warm.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        if time.time() - t_w > args.budget * 0.55:
            break
    warm.flush()
    print(f"# config4: warm pass {time.time()-t_w:.0f}s",
          file=sys.stderr, flush=True)
    del warm

    loc = SlamSession(_loc_cfg(), laser,
                      mode="localization", streaming=True,
                      drain_every=min(args.drain, 16))
    if os.environ.get("BENCH_STATS") == "1":
        loc.stats.enabled = True
    t_de = time.time()
    loc.deserialize(snap, MatchType.LOCALIZE_AT_POSE,
                    initial_pose=data2[0][1])
    print(f"# config4: deserialize {loc.mapper.solver.n_nodes} nodes "
          f"in {time.time()-t_de:.1f}s", file=sys.stderr, flush=True)
    # prime: the FIRST scan is the one-time relocalization seed
    # (ProcessAgainstNodesNearBy against the full prior + session
    # first-touch). Round 3 measured 7.4 s at 100k (dominated by the
    # per-call vertex-list rebuild in FindNearByVertices) and excluded
    # it; round 4 serves the radius query from the incremental query
    # structure and INCLUDES the prime in the clock (VERDICT r3 #5).
    t0 = time.time()
    s0, tp0 = data2[0]
    loc.process_scan(s0.ranges, s0.odom_pose, time=0.0)
    t_prime = time.time() - t0
    print(f"# config4: relocalization prime {t_prime:.1f}s",
          file=sys.stderr, flush=True)
    lat, err = [], []
    t_prev = t0
    for i, (scan, tp) in enumerate(data2[1:], start=1):
        out = loc.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        t_now = time.time()
        if out is not None:
            lat.append(t_now - t_prev)
            err.append(np.hypot(*(out[0][:2] - tp[:2])))
        t_prev = t_now
        if t_now - t0 > args.budget:
            break
    wall = time.time() - t0
    lat_a = np.asarray(lat)
    big = np.argsort(lat_a)[-5:][::-1] if len(lat_a) else []
    print("# config4 biggest latencies: "
          + ", ".join(f"scan {i}: {lat_a[i]:.2f}s" for i in big),
          file=sys.stderr)
    # headline: NO exclusions (VERDICT r2 weak #7); the stall-filtered
    # number (>5 s compile stalls subtracted) is reported alongside
    sps = float(len(lat_a) / wall) if wall > 0 else 0.0
    stall = float(lat_a[lat_a >= 5.0].sum()) if len(lat_a) else 0.0
    sps_filtered = float(len(lat_a) / max(wall - stall, 1e-9))
    rmse = float(np.sqrt(np.mean(np.square(err)))) if err else None
    e = np.asarray(err) if err else np.zeros(1)
    print(f"# config4 localization err p50={np.percentile(e,50):.3f} "
          f"p95={np.percentile(e,95):.3f} max={e.max():.3f} "
          f"RMSE={rmse if rmse is None else round(rmse,3)}",
          file=sys.stderr)
    # the error floor here is the PRIOR MAP's own frame error in the
    # aisle-ambiguous warehouse (p50 ~0.22 m vs ground truth) — the
    # localizer tracks the map it was given, not ground truth; the bound
    # guards against divergence, not map error
    assert rmse is None or rmse < 0.35, f"localization drift: {rmse}"
    # no multi-meter excursions (round-2's wrong-row closures): the
    # extended gates must keep the worst online error under a row pitch
    assert float(e.max()) < 2.0, f"excursion: max err {e.max():.2f} m"
    if os.environ.get("BENCH_STATS") == "1":
        for k, v in loc.stats.summary().items():
            print(f"# stage {k}: {v}", file=sys.stderr)
            print(f"#   samples {loc.stats.samples[k][:40]}",
                  file=sys.stderr)
    art = {
        "metric": "localization_scans_per_sec",
        **_load_info(),
        "prior_nodes": int(loc.mapper.solver.n_nodes),
        "scans_localized": int(len(lat_a)),
        "prime_s": round(t_prime, 2),
        "prime_included_in_clock": True,
        "value_no_exclusions": round(sps, 1),
        "value_stall_filtered": round(sps_filtered, 1),
        "wall_s": round(wall, 1), "stalls_excluded_s": round(stall, 1),
        "unit": "scans/s",
        "err_p50_m": round(float(np.percentile(e, 50)), 3),
        "err_p95_m": round(float(np.percentile(e, 95)), 3),
        "err_max_m": round(float(e.max()), 3),
        "rmse_m": None if rmse is None else round(rmse, 3),
        "pipeline": "streaming_f32_chain_rasters",
        "note": "online pose error vs ground truth during elastic "
                "localization; gates: coarse var<0.16, fine var<0.09, "
                "jump<1.0 m (round-3 self-similarity defenses); "
                "windowed elastic solve radius 20 m; loop attempt "
                "cadence 16 scans; the one-time relocalization "
                "prime is INCLUDED in the clock (prime_s)",
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CONFIG4.json"), "w") as f:
        json.dump(art, f, indent=1)
    _emit("localization_scans_per_sec", sps, "scans/s", 50.0)
    return 0


def cmd_config5(args) -> int:
    """Multi-session merge with auto-alignment + sharded final solve over
    a device mesh (BASELINE config 5)."""
    _maybe_cpu()
    import tempfile

    import jax

    from slam_toolbox_tpu.api import SlamSession
    from slam_toolbox_tpu.api.merge import MapMerger
    from slam_toolbox_tpu.io.dataset import LidarSimulator

    laser = _laser(args.beam_res)
    world, aisles, length, pitch = _warehouse()
    sessions = args.sessions
    tmp = tempfile.mkdtemp()
    paths = []
    t0 = time.time()
    # each session maps a band of aisles (overlapping one aisle)
    per = max(2, aisles // sessions + 1)
    for s in range(sessions):
        a0 = min(s * (per - 1), aisles - per)
        wps = _serpentine(per, length, pitch) + np.array([a0 * pitch, 0.0])
        sim = LidarSimulator(world, laser, range_noise=0.01,
                             odom_noise=(0.012, 0.005), seed=31 + s)
        data = sim.simulate(wps, step=0.3)
        sess = SlamSession(_cfg(), laser, streaming=True,
                           drain_every=args.drain)
        for i, (scan, tp) in enumerate(data):
            sess.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        p = os.path.join(tmp, f"session{s}.npz")
        sess.serialize(p)
        paths.append(p)
        print(f"# config5 session {s}: {sess.mapper.solver.n_nodes} nodes",
              file=sys.stderr, flush=True)
    merger = MapMerger()
    for p in paths:
        merger.add_submap(p)
    t_merge = time.time()
    aligned = 0
    for s in range(1, sessions):
        r = merger.auto_align(0, s)
        aligned += r is not None
    grid = merger.merge(resolution=0.05)
    dt = time.time() - t_merge
    total_nodes = sum(len(s) for s in merger.submaps)
    print(f"# config5 merged {total_nodes} nodes from {sessions} sessions "
          f"({aligned} auto-aligned) on {jax.device_count()} devices, "
          f"map {grid.cells.shape}, merge {dt:.1f}s, "
          f"total {time.time()-t0:.1f}s", file=sys.stderr)
    _emit("merge_nodes_per_sec", total_nodes / dt, "nodes/s", None)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("config2", cmd_config2), ("config3", cmd_config3),
                     ("config4", cmd_config4), ("config5", cmd_config5)):
        p = sub.add_parser(name)
        p.set_defaults(fn=fn)
        p.add_argument("--full", action="store_true")
        p.add_argument("--laps", type=int, default=4)
        p.add_argument("--drain", type=int, default=96)
        p.add_argument("--beam-res", dest="beam_res", type=float,
                       default=1.0 / 3,
                       help="beam angular resolution in degrees")
        p.add_argument("--sessions", type=int, default=3)
        p.add_argument("--loc-repeat", dest="loc_repeat", type=int,
                       default=1,
                       help="tile the closed localization circuit this "
                            "many times (config4 steady-state length)")
        p.add_argument("--prior-nodes", dest="prior_nodes", type=int,
                       default=0, help="config4: synthesize an N-node "
                       "prior directly (BASELINE scale)")
        p.add_argument("--budget", type=float, default=float(
            os.environ.get("BENCH_BUDGET_S", "600")))
    args = ap.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
