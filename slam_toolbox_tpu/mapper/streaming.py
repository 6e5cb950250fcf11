"""Streaming (device-resident) sequential-match pipeline.

The classic Mapper.process round-trips the tunnel per scan (dispatch,
completion wait, result fetch: ~50 ms floor regardless of kernel speed).
This pipeline keeps the sequential dependency chain ON DEVICE — the
running-scan window (local points + FVP structures + poses), the last
odometry/correction, and a ring of packed match results — so scans are
dispatched back-to-back with NO per-scan sync. The host drains the result
ring every `drain_every` scans (one fetch amortized over the batch) and
replays the standard graph bookkeeping (edges, running buffer, loop
closure) with the fetched poses; after each drain the device state is
rebuilt from the host's authoritative running buffer, so reference
semantics hold exactly at drain boundaries and device-side eviction only
has to approximate them in between (same rule, device-computed poses).

No reference counterpart — slam_toolbox is synchronous per scan; this is
the TPU-native latency-hiding design (BASELINE.json north star).
"""
from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from slam_toolbox_tpu.core import geometry
from slam_toolbox_tpu.kernels import rasterize as rz
from slam_toolbox_tpu.kernels.match import _score_impl, _raster_quant_impl

RESULT_CAP = 64


def _unpack_scan(pack):
    """Decode the single per-scan upload buffer (B, 8) f32:
    [local_xy, fvp_anchor_xy, fvp_current_xy, next_delim, flags]
    with flags bit0 = finite, bit1 = delimiter-slot valid."""
    local_pts = pack[:, 0:2]
    anchor = pack[:, 2:4]
    current = pack[:, 4:6]
    nxt = pack[:, 6].astype(jnp.int32)
    flags = pack[:, 7].astype(jnp.int32)
    finite = (flags & 1) > 0
    dvalid = (flags & 2) > 0
    return local_pts, anchor, current, nxt, finite, dvalid


def _stream_raster_impl(
    state, odom,
    offset_pose, scale, sigma_cells, half_span,
    grid_size: int, half_kernel: int, acc_r: int, parity: bool,
):
    """Program A: prior propagation + device FVP + raster (the new scan's
    own data is only needed by program B). Returns
    (grid_flat, pgrid, center_off, prior_corrected)."""
    prior = _transform_between(
        state["last_odom"], state["last_corrected"], odom
    )
    center = _compose(prior, offset_pose)
    off = center[:2] - half_span
    center_off = jnp.concatenate([center, off])

    # world points of ring scans
    poses = state["ring_pose"]            # (K,3)
    c, s = jnp.cos(poses[:, 2]), jnp.sin(poses[:, 2])
    rl = state["ring_local"]              # (K,B,2)
    wx = poses[:, 0:1] + c[:, None] * rl[:, :, 0] - s[:, None] * rl[:, :, 1]
    wy = poses[:, 1:2] + s[:, None] * rl[:, :, 0] + c[:, None] * rl[:, :, 1]
    pts = jnp.stack([wx, wy], axis=-1)    # (K,B,2)

    # FindValidPoints on device: viewpoint in each ring scan's local frame
    vp = center[:2]
    dvx = vp[0] - poses[:, 0]
    dvy = vp[1] - poses[:, 1]
    vxl = c * dvx + s * dvy               # (K,)
    vyl = -s * dvx + c * dvy
    anchor = state["ring_anchor"]         # (K,B,2)
    cur = state["ring_current"]           # (K,B,2)
    a = vyl[:, None] - anchor[:, :, 1]
    b = anchor[:, :, 0] - vxl[:, None]
    cc = (
        anchor[:, :, 1] * vxl[:, None] - anchor[:, :, 0] * vyl[:, None]
    )
    ss = cur[:, :, 0] * a + cur[:, :, 1] * b + cc  # (K,B) per delim slot
    keep_run = (ss >= 0.0) & state["ring_dvalid"]
    nxt = state["ring_next"]              # (K,B)
    has = nxt >= 0
    keep = jnp.take_along_axis(
        keep_run, jnp.maximum(nxt, 0), axis=1
    )
    valid = (
        has & keep & state["ring_finite"]
        & state["ring_slot_valid"][:, None]
    )

    K, B = rl.shape[0], rl.shape[1]
    flat_pts = pts.reshape(K * B, 2)
    flat_valid = valid.reshape(K * B)
    grid_flat, pgrid = _raster_quant_impl(
        flat_pts, flat_valid, off, scale, sigma_cells,
        grid_size, half_kernel, acc_r, parity,
    )
    return grid_flat, pgrid, center_off, prior


def _stream_update_impl(
    grid_flat, pgrid, center_off, prior,
    state, pack, odom,
    offset_pose,
    run_buffer_size, run_max_distance,
    score_kwargs: dict,
):
    """Program B: score + pose update + ring push/evict + result append."""
    local_pts, anchor, current, nxt, finite, dvalid = _unpack_scan(pack)
    packed = _score_impl(
        grid_flat, pgrid, center_off, local_pts, finite, **score_kwargs
    )
    is_first = state["count"] == 0
    center = center_off[:3]
    mean = jnp.where(is_first, center, packed[1:4])
    response = jnp.where(is_first, 0.0, packed[0])
    cov = jnp.where(
        is_first, jnp.eye(3).reshape(-1), packed[4:13]
    )
    corrected = _corrected_at(mean, offset_pose)

    out13 = jnp.concatenate([response[None], mean, cov])

    # push into ring
    K = state["ring_local"].shape[0]
    idx = (state["head"] + state["count"]) % K
    new_state = dict(state)
    new_state["ring_local"] = state["ring_local"].at[idx].set(local_pts)
    new_state["ring_anchor"] = state["ring_anchor"].at[idx].set(anchor)
    new_state["ring_current"] = state["ring_current"].at[idx].set(current)
    new_state["ring_dvalid"] = state["ring_dvalid"].at[idx].set(dvalid)
    new_state["ring_next"] = state["ring_next"].at[idx].set(nxt)
    new_state["ring_finite"] = state["ring_finite"].at[idx].set(finite)
    new_state["ring_pose"] = state["ring_pose"].at[idx].set(mean)
    new_state["ring_slot_valid"] = (
        state["ring_slot_valid"].at[idx].set(True)
    )
    count = state["count"] + 1
    head = state["head"]

    # eviction: by count and front-to-back distance (Mapper.cpp:182-204)
    def cond(hc):
        h, ct = hc
        back = new_state["ring_pose"][(h + ct - 1) % K]
        front = new_state["ring_pose"][h]
        d = front[:2] - back[:2]
        too_far = (d[0] ** 2 + d[1] ** 2) > run_max_distance**2 - 1e-6
        return (ct > 1) & ((ct > run_buffer_size) | too_far)

    def body(hc):
        h, ct = hc
        return (h + 1) % K, ct - 1

    head, count = jax.lax.while_loop(cond, body, (head, count))
    new_state["head"] = head
    new_state["count"] = count
    new_state["last_odom"] = odom
    new_state["last_corrected"] = corrected

    ridx = state["n_results"] % RESULT_CAP
    new_state["results"] = state["results"].at[ridx].set(out13)
    new_state["n_results"] = state["n_results"] + 1
    return new_state


def _compose(a, b):
    ca, sa = jnp.cos(a[2]), jnp.sin(a[2])
    return jnp.stack([
        a[0] + ca * b[0] - sa * b[1],
        a[1] + sa * b[0] + ca * b[1],
        jnp.arctan2(jnp.sin(a[2] + b[2]), jnp.cos(a[2] + b[2])),
    ])


def _transform_between(p1, p2, p):
    dh = p2[2] - p1[2]
    c, s = jnp.cos(dh), jnp.sin(dh)
    tx = p2[0] - (c * p1[0] - s * p1[1])
    ty = p2[1] - (s * p1[0] + c * p1[1])
    return jnp.stack([
        tx + c * p[0] - s * p[1],
        ty + s * p[0] + c * p[1],
        jnp.arctan2(jnp.sin(p[2] + dh), jnp.cos(p[2] + dh)),
    ])


def _corrected_at(sensor_pose, offset_pose):
    ox, oy, oh = offset_pose[0], offset_pose[1], offset_pose[2]
    length = jnp.sqrt(ox * ox + oy * oy)
    alpha = jnp.arctan2(oy, ox)
    hs = jnp.arctan2(jnp.sin(sensor_pose[2]), jnp.cos(sensor_pose[2]))
    wx = length * jnp.cos(hs + alpha - oh)
    wy = length * jnp.sin(hs + alpha - oh)
    h = hs - oh
    return jnp.stack([
        sensor_pose[0] - wx, sensor_pose[1] - wy,
        jnp.arctan2(jnp.sin(h), jnp.cos(h)),
    ])


class StreamingPipeline:
    """Drives a Mapper through the device-resident pipeline."""

    def __init__(self, mapper, laser, drain_every: int = 8):
        self.mapper = mapper
        self.laser = laser
        self.drain_every = int(drain_every)
        if not mapper.initialized:
            mapper.initialize(laser.range_threshold)
        m = mapper.sequential_matcher
        self.matcher = m
        self.K = int(mapper.config.scan_buffer_size)
        self.B = laser.n_beams

        score_kwargs = dict(
            x_off_c=jnp.asarray(m._xy_coarse, jnp.float32),
            y_off_c=jnp.asarray(m._xy_coarse, jnp.float32),
            x_off_f=jnp.asarray(m._xy_fine, jnp.float32),
            y_off_f=jnp.asarray(m._xy_fine, jnp.float32),
            scale=np.float32(m.scale),
            coarse_angle_offset=np.float32(m.coarse_angle_offset),
            coarse_angle_res=np.float32(m.coarse_angle_resolution),
            fine_angle_offset=np.float32(m._fine_angle_offset),
            fine_angle_res=np.float32(m._fine_angle_res),
            penalize=np.bool_(True),
            dist_var_penalty=m.penalty_params[0],
            ang_var_penalty=m.penalty_params[1],
            min_dist_pen=m.penalty_params[2],
            min_ang_pen=m.penalty_params[3],
            grid_size=m.G, na_coarse=m._na_coarse, na_fine=m._na_fine,
            refine=True, acc_r=m._acc_r,
        )
        offset_pose = jnp.asarray(laser.offset_pose, jnp.float32)
        self._prog_a = jax.jit(functools.partial(
            _stream_raster_impl,
            offset_pose=offset_pose,
            scale=np.float32(m.scale),
            sigma_cells=np.float32(m.sigma_cells),
            half_span=np.float32(0.5 * (m.G - 1) * m.resolution),
            grid_size=m.G, half_kernel=m.half_kernel,
            acc_r=m._acc_r, parity=m.use_pallas,
        ))
        self._prog_b = jax.jit(functools.partial(
            _stream_update_impl,
            offset_pose=offset_pose,
            run_buffer_size=np.int32(self.K),
            run_max_distance=np.float32(
                mapper.config.scan_buffer_maximum_scan_distance
            ),
            score_kwargs=score_kwargs,
        ))

        self.state = None
        self.pending: List = []
        self._last_gate_scan = None
        self._dispatched_since_refresh = 0

    # -- state <-> host sync -----------------------------------------------
    def _scan_stream_arrays(self, scan):
        """Single packed (B, 8) f32 upload buffer per scan (one h2d
        transfer instead of seven): [local_xy, anchor_xy, current_xy,
        next_delim, flags(bit0 finite, bit1 delim-valid)]."""
        cached = getattr(scan, "_stream_arrays", None)
        if cached is not None:
            return cached
        local = np.nan_to_num(
            scan.local_points.astype(np.float32), nan=0.0
        )
        finite = np.isfinite(scan.ranges)
        delim_idx, anchors, next_delim = rz.find_valid_points_structure(
            scan.local_points
        )
        B = self.B
        pack = np.zeros((B, 8), np.float32)
        pack[:, 0:2] = local
        D = len(delim_idx)
        if D:
            pack[:D, 2:4] = anchors
            pack[:D, 4:6] = local[delim_idx]
        pack[:, 6] = next_delim.astype(np.float32)
        flags = finite.astype(np.int32)
        if D:
            flags[:D] |= 2
        pack[:, 7] = flags.astype(np.float32)
        try:
            scan._stream_arrays = pack
        except AttributeError:
            pass
        return pack

    def refresh_state(self) -> None:
        """(Re)build device state from the host's authoritative running
        buffer + last scan."""
        sm = self.mapper.sensor_manager
        running = sm.get_running_scans(self.laser.name)
        last = sm.get_last_scan(self.laser.name)
        K, B = self.K + 2, self.B  # +2 slack for between-drain growth
        st = {
            "ring_local": np.zeros((K, B, 2), np.float32),
            "ring_anchor": np.zeros((K, B, 2), np.float32),
            "ring_current": np.zeros((K, B, 2), np.float32),
            "ring_dvalid": np.zeros((K, B), bool),
            "ring_next": np.full((K, B), -1, np.int32),
            "ring_finite": np.zeros((K, B), bool),
            "ring_pose": np.zeros((K, 3), np.float32),
            "ring_slot_valid": np.zeros(K, bool),
            "head": np.int32(0),
            "count": np.int32(len(running)),
            "last_odom": np.zeros(3, np.float32),
            "last_corrected": np.zeros(3, np.float32),
            "results": np.zeros((RESULT_CAP, 13), np.float32),
            "n_results": np.int32(0),
        }
        for i, s in enumerate(running[-K:]):
            pack = self._scan_stream_arrays(s)
            st["ring_local"][i] = pack[:, 0:2]
            st["ring_anchor"][i] = pack[:, 2:4]
            st["ring_current"][i] = pack[:, 4:6]
            st["ring_next"][i] = pack[:, 6].astype(np.int32)
            flags = pack[:, 7].astype(np.int32)
            st["ring_finite"][i] = (flags & 1) > 0
            st["ring_dvalid"][i] = (flags & 2) > 0
            st["ring_pose"][i] = s.sensor_pose
            st["ring_slot_valid"][i] = True
        if last is not None:
            st["last_odom"] = last.odom_pose.astype(np.float32)
            st["last_corrected"] = last.corrected_pose.astype(np.float32)
        self.state = {k: jnp.asarray(v) for k, v in st.items()}
        self._dispatched_since_refresh = 0

    # -- ingestion ----------------------------------------------------------
    def process_scan(self, scan) -> bool:
        """Gate + dispatch; bookkeeping happens at drain."""
        if not scan.laser.validate(scan.ranges):
            return False
        last_ref = self._last_gate_scan or (
            self.mapper.sensor_manager.get_last_scan(self.laser.name)
        )
        if not self.mapper.has_moved_enough(scan, last_ref):
            return False
        if self.state is None:
            self.refresh_state()

        pack = jnp.asarray(self._scan_stream_arrays(scan))
        odom = jnp.asarray(scan.odom_pose, jnp.float32)
        grid_flat, pgrid, center_off, prior = self._prog_a(
            self.state, odom
        )
        self.state = self._prog_b(
            grid_flat, pgrid, center_off, prior,
            self.state, pack, odom,
        )
        self.pending.append(scan)
        self._last_gate_scan = scan
        self._dispatched_since_refresh += 1
        # drain before the device result ring can wrap
        if (
            len(self.pending) >= self.drain_every
            or self._dispatched_since_refresh >= RESULT_CAP - 1
        ):
            self.drain()
        return True

    def drain(self) -> None:
        """Fetch pending results and replay standard graph bookkeeping.
        If a loop closure fires mid-batch, the remaining pending scans'
        device results are stale (computed against pre-closure poses) —
        they are re-processed through the classic synchronous path."""
        if not self.pending:
            return
        n = len(self.pending)
        results = self.state["results"]
        results.block_until_ready()
        res_np = np.asarray(results, np.float64)
        start = self._dispatched_since_refresh - n
        stale_from: Optional[int] = None
        poses_moved = False
        any_closed = False
        for i, scan in enumerate(self.pending):
            packed = res_np[(start + i) % RESULT_CAP]
            response = packed[0]
            mean = packed[1:4]
            cov = packed[4:13].reshape(3, 3)
            sm = self.mapper.sensor_manager
            last = sm.get_last_scan(scan.laser.name)
            if last is not None:
                scan.set_corrected_pose(np.asarray(
                    geometry.transform_pose_between(
                        last.odom_pose, last.corrected_pose,
                        scan.odom_pose,
                    )
                ))
            if last is not None and response > 0.0:
                scan.set_sensor_pose(mean)
            else:
                cov = np.eye(3)
            pose_before = scan.corrected_pose.copy()
            closed = self.mapper.finish_scan(
                scan, cov, try_loops=(i == n - 1)
            )
            any_closed = any_closed or closed
            if np.any(np.abs(scan.corrected_pose - pose_before) > 1e-7):
                poses_moved = True  # near-chain fusion moved this scan
            if closed and i + 1 < n:
                stale_from = i + 1
                break
        if stale_from is not None:
            for scan in self.pending[stale_from:]:
                self.mapper.process(scan)
        self.pending = []
        self._last_gate_scan = None
        # the device ring evolved with identical updates (same rule, same
        # fetched poses), so a resync is only needed when bookkeeping
        # moved poses (chain fusion, loop closure) — the common corridor
        # case skips the full state re-upload
        if poses_moved or any_closed or stale_from is not None:
            self.refresh_state()
