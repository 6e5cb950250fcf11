"""Streaming (device-resident) sequential-match pipeline.

The classic Mapper.process round-trips the tunnel per scan (dispatch,
completion wait, result fetch: ~50 ms floor regardless of kernel speed).
This pipeline keeps the sequential dependency chain ON DEVICE — the
running-scan window (local points + FVP structures + poses), the last
odometry/correction, and a ring of packed match results — and processes a
whole batch of scans as ONE jitted lax.scan program (one upload, one
dispatch, one result fetch per `drain_every` scans; the tunnel's
per-program overhead otherwise dominates). At each drain the host replays
the standard graph bookkeeping (edges, running buffer, loop closure) with
the fetched poses; the device state is rebuilt from the host's
authoritative running buffer whenever bookkeeping moved poses, so
reference semantics hold exactly at drain boundaries and device-side
eviction only has to approximate them in between (same rule,
device-computed poses).

No reference counterpart — slam_toolbox is synchronous per scan; this is
the TPU-native latency-hiding design (BASELINE.json north star).
"""
from __future__ import annotations

import math
import weakref
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from slam_toolbox_tpu.core import geometry
from slam_toolbox_tpu.kernels import rasterize as rz
from slam_toolbox_tpu.kernels.match import _score_impl, _raster_quant_impl

RESULT_CAP = 256
# async upload chunk size (scans per h2d transfer): small chunks overlap
# accumulation better, big chunks pay fewer serialized tunnel round trips
import os as _os

UPLOAD_CHUNK = int(_os.environ.get("SLAM_UPLOAD_CHUNK", "16"))
# pipelined drains (double-buffering): drain(k) dispatches batch k's
# device program FIRST and then runs batch k-1's host bookkeeping while
# batch k executes — the batch program's device time (~2.3 ms/scan) hides
# behind graph bookkeeping + the next accumulation instead of serializing
# into drain_fetch. Set SLAM_STREAM_PIPELINE=0 for the serial path.
PIPELINED = _os.environ.get("SLAM_STREAM_PIPELINE", "1") != "0"
# speculative near-chain matching (rides the batch fetch); 0 disables for
# A/B timing — misses then go through the per-drain redispatch path
SPECULATE = _os.environ.get("SLAM_SPEC", "1") != "0"
# adaptive drain ordering: when a deferred loop-closure verify (or a
# pending resync) exists at drain time, its closure will move poses with
# high probability — the pipelined order would then re-run BOTH in-flight
# batches from the refreshed state (measured 3x batch device time per
# drain on closure-heavy loops, drain_fetch 1010 ms vs 450 ms of batch
# time). Settle-first serial ordering dispatches each batch exactly once
# from post-closure state; corridor drains (no deferred closure) keep the
# pipelined overlap. SLAM_ADAPTIVE=0 disables for A/B.
ADAPTIVE = _os.environ.get("SLAM_ADAPTIVE", "1") != "0"
# eager pool-seeding cap for deserialized priors (scans); larger priors
# seed lazily at the chain-dispatch sites (~283 MB device residency max
# at the default; BASELINE config 4's 50k-100k-node priors stay lazy)
POOL_SEED_CAP = int(_os.environ.get("SLAM_POOL_SEED_CAP", "8192"))
# speculative loop verify: predict the newest scan's candidate chains at
# dispatch time and run the fused verify WITH the batch program (its
# ~100-120 ms execution otherwise sits on the settle-first critical
# path); the commit validates chain identity + pose stability and
# redispatches on mismatch. SLAM_SPEC_LOOP=0 disables for A/B.
SPEC_LOOP = _os.environ.get("SLAM_SPEC_LOOP", "1") != "0"
# staleness-gated resync (round 5): after bookkeeping moves host poses
# (loop closure / chain fusion), the device ring is rebuilt ONLY when a
# ring-mirrored scan's pose actually diverged from what the device
# believes by more than this endpoint-level bound (meters; heading
# counts at the 10 m max-beam lever arm). Late-run closure corrections
# are sub-millimeter, and unconditionally resyncing forced the
# settle-first drain ordering — which exposes the whole ~600 ms batch
# program on the critical path (drain_fetch ~520 ms measured). 0.003 m
# is sub-cell at the 0.01 m correlation resolution, so skipped rebuilds
# perturb match responses by at most an occasional one-cell flip (same
# family as the documented f32-vs-f64 envelope). SLAM_RESYNC_EPS=0
# restores the unconditional rebuild.
RESYNC_EPS = float(_os.environ.get("SLAM_RESYNC_EPS", "0.003"))
# early-verify drain ordering (round 4): finish the newest scan's
# bookkeeping first and dispatch the deferred loop verify BEFORE the
# rest of the batch's bookkeeping, hiding the verify's device time
# behind host work instead of the settle-first critical path.
# SLAM_EARLY_VERIFY=0 restores the tail-dispatch order for A/B.
EARLY_VERIFY = _os.environ.get("SLAM_EARLY_VERIFY", "1") != "0"


class _PendingDrain:
    """One dispatched-but-uncommitted batch (pipelined drains)."""

    __slots__ = ("scans", "packs", "odoms", "start", "results",
                 "spec", "pred_chains", "spec_offsets",
                 "spec_loop", "pred_loop", "spec_loop_poses")

    def __init__(self, scans, packs, odoms, start, results):
        self.scans = scans
        self.packs = packs        # (N, B, 8) device array (for redispatch)
        self.odoms = odoms        # (N, 3) device array
        self.start = start        # first result-ring row of this batch
        self.results = results    # the state's result ring after dispatch
        self.spec = None          # in-flight speculative chain-match echo
        self.pred_chains = None
        self.spec_offsets = {}
        self.spec_loop = None     # in-flight speculative loop verify rows
        self.pred_loop = None     # the predicted candidate chains
        self.spec_loop_poses = None


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


def scan_pack(scan) -> np.ndarray:
    """Single packed (B, 8) f32 upload buffer per scan (one h2d transfer
    instead of seven): [local_xy, anchor_xy, current_xy, next_delim,
    flags(bit0 finite, bit1 delim-valid)]. Cached on the scan (the
    contents are sensor-frame, pose-independent)."""
    cached = getattr(scan, "_stream_arrays", None)
    if cached is not None:
        return cached
    from slam_toolbox_tpu import native

    pack = native.scan_pack(scan.local_points, scan.ranges)
    if pack is None:
        finite = np.isfinite(scan.ranges)
        delim_idx, anchors, next_delim = rz.find_valid_points_structure(
            scan.local_points
        )
        B = len(scan.ranges)
        pack = np.zeros((B, 8), np.float32)
        # f64->f32 assignment preserves NaN; zero exactly the non-finite
        # beams (same values as the old nan_to_num copy at half the
        # passes)
        pack[:, 0:2] = scan.local_points
        if not finite.all():
            pack[~finite, 0:2] = 0.0
        D = len(delim_idx)
        if D:
            pack[:D, 2:4] = anchors
            pack[:D, 4:6] = pack[delim_idx, 0:2]
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

    # the ring size is the array's static shape (pipelined drains size it
    # max(RESULT_CAP, 2*drain_every) so two in-flight batches never alias)
    ridx = state["n_results"] % state["results"].shape[0]
    new_state["results"] = state["results"].at[ridx].set(out13)
    new_state["n_results"] = state["n_results"] + 1
    return new_state


def _stream_batch_impl(
    state, packs, odoms, n_valid,
    offset_pose, scale, sigma_cells, half_span,
    run_buffer_size, run_max_distance,
    score_args: dict,
    grid_size: int, half_kernel: int, acc_r: int, parity: bool,
    na_coarse: int, na_fine: int,
):
    """One jitted program for a whole drain batch: lax.scan of
    (raster -> score -> state update) over N scans. Replaces 2N separate
    dispatches with one upload + one dispatch + one fetch per drain — the
    tunnel's per-program overhead (~4-6 ms) dominates at these kernel
    speeds. Steps with index >= n_valid leave the state untouched (the
    flush() tail pads the batch)."""
    score_kwargs = dict(
        score_args,
        grid_size=grid_size, na_coarse=na_coarse, na_fine=na_fine,
        acc_r=acc_r, refine=True,
    )

    def body(i, st):
        pack = packs[i]
        odom = odoms[i]
        grid_flat, pgrid, center_off, prior = _stream_raster_impl(
            st, odom, offset_pose, scale, sigma_cells, half_span,
            grid_size, half_kernel, acc_r, parity,
        )
        return _stream_update_impl(
            grid_flat, pgrid, center_off, prior, st, pack, odom,
            offset_pose, run_buffer_size, run_max_distance, score_kwargs,
        )

    # dynamic trip count: a partial flush (pending < drain bucket) runs
    # exactly n_valid iterations instead of executing masked padding
    # steps (at drain 192 a 61-scan tail otherwise wastes 131 full
    # raster+score iterations, ~0.3 s)
    return jax.lax.fori_loop(0, n_valid, body, state)


# module-level jit: every pipeline with the same matcher geometry and
# drain bucket shares one compiled executable across sessions
_stream_batch_jit = jax.jit(
    _stream_batch_impl,
    static_argnames=("grid_size", "half_kernel", "acc_r", "parity",
                     "na_coarse", "na_fine"),
)


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


class PackPool:
    """Device-resident pool of per-scan pack buffers.

    The pipeline uploads every scan's (B, 8) pack once for the batch
    program; retaining those rows here lets later consumers (loop-closure
    verification, chain matching) gather whole chains by slot index
    instead of re-uploading ~34 KB per chain scan through the tunnel on
    every loop event. Row 0 is reserved as a zero row (the pad target),
    so valid slots start at 1. Appends stay contiguous (one
    dynamic_update_slice per batch); removed scans release() their slot
    and a whole-pool compaction (single device row-gather) reclaims the
    space when freed rows would otherwise force a growth — so lifelong /
    localization sessions hold ~2x the LIVE scan count, not the
    all-time count.
    """

    def __init__(self, n_beams: int, cap: int = 2048):
        self.B = n_beams
        self.cap = cap
        self.n = 1  # row 0 = zeros
        self.buf = jnp.zeros((cap, n_beams, 8), jnp.float32)
        self._owners: Dict[int, object] = {}   # slot -> weakref(scan)
        self._freed = 0

    def release(self, scan) -> None:
        """Mark a removed scan's slot reusable (O(1); the row is
        reclaimed at the next compaction)."""
        slot = getattr(scan, "_pool_slot", None)
        if slot is None:
            return
        scan._pool_slot = None
        if self._owners.pop(slot, None) is not None:
            self._freed += 1

    def _compact(self) -> None:
        """Gather live rows to the front of the pool (ONE device row
        gather — rows are 34 KB contiguous slices, so this is
        bandwidth-bound, not the scalar-gather pathology) and renumber
        the owners' slots."""
        live = []
        for slot in sorted(self._owners):
            s = self._owners[slot]()
            if s is not None:
                live.append((slot, s))
        idx = np.zeros(self.cap, np.int32)   # row 0 stays the zero row
        new_owners = {}
        for j, (slot, s) in enumerate(live, start=1):
            idx[j] = slot
            s._pool_slot = j
            new_owners[j] = weakref.ref(s)
        self.buf = jnp.take(self.buf, jnp.asarray(idx), axis=0)
        self._owners = new_owners
        self.n = 1 + len(live)
        self._freed = 0

    def append_batch(self, packs, scans) -> None:
        """packs: (N, B, 8) device array whose first len(scans) rows are
        the scans' packs (pad rows beyond that are harmless — they are
        overwritten by the next append)."""
        n = len(scans)
        if n == 0:
            return
        if (self.n + packs.shape[0] > self.cap
                and self._freed >= self.cap // 2):
            self._compact()
        while self.n + packs.shape[0] > self.cap:
            self.cap *= 2
            self.buf = jax.lax.dynamic_update_slice(
                jnp.zeros((self.cap, self.B, 8), jnp.float32),
                self.buf, (0, 0, 0),
            )
        self.buf = jax.lax.dynamic_update_slice(
            self.buf, packs, (self.n, 0, 0)
        )
        for i, s in enumerate(scans):
            try:
                s._pool_slot = self.n + i
                self._owners[self.n + i] = weakref.ref(s)
            except (AttributeError, TypeError):
                pass
        self.n += n

    def add_scans(self, scans) -> None:
        """Bulk host-pack + upload (used to seed the pool with a prior
        graph's scans at pipeline init: ~34 KB/scan at ~1 GB/s, so even a
        10^3-node prior costs ~35 ms once — vs re-uploading chain scans
        on every loop-closure/near-chain event)."""
        todo = [s for s in scans
                if getattr(s, "_pool_slot", None) is None
                and len(s.ranges) == self.B]
        if not todo:
            return
        batch = jax.device_put(np.stack([scan_pack(s) for s in todo]))
        self.append_batch(batch, todo)

    def gather(self, idx) -> jax.Array:
        """(...,) int32 slot indices -> (..., B, 8) packs (device)."""
        return jnp.take(self.buf, jnp.asarray(idx), axis=0)


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

        self._score_args = dict(m._score_args, penalize=np.bool_(True))
        self._batch_args = dict(
            offset_pose=jnp.asarray(laser.offset_pose, jnp.float32),
            scale=np.float32(m.scale),
            sigma_cells=np.float32(m.sigma_cells),
            half_span=np.float32(0.5 * (m.G - 1) * m.resolution),
            run_buffer_size=np.int32(self.K),
            run_max_distance=np.float32(
                mapper.config.scan_buffer_maximum_scan_distance
            ),
        )
        self._batch_static = dict(
            grid_size=m.G, half_kernel=m.half_kernel,
            acc_r=m._acc_r, parity=m.use_pallas,
            na_coarse=m._na_coarse, na_fine=m._na_fine,
        )

        self.state = None
        self.pending: List = []
        self._last_gate_scan = None
        self._dispatched_since_refresh = 0
        # optional per-scan hook run after each scan's bookkeeping in the
        # drain (localization mode appends to the elastic buffer here);
        # returns True if it changed the graph/running buffer so the
        # device state must resync
        self.post_finish = None
        self._pending_dev = []   # uploaded 16-scan chunk arrays
        self._chunk_np = []      # host packs awaiting the next chunk
        # deferred loop closure: the commit dispatches the fused verify
        # program and returns without waiting; the NEXT commit (or a
        # terminal settle()) fetches the rows and applies the closure
        # BEFORE any later bookkeeping, so the verify's device time hides
        # behind the next batch's accumulation with identical results.
        self._deferred_loop = None
        self.pipelined = PIPELINED
        # with two batches in flight the result ring must hold both spans
        self.result_cap = max(RESULT_CAP, 2 * self.drain_every)
        # the dispatched-but-uncommitted batch (pipelined mode)
        self._pending_drain = None
        # host poses moved relative to the device state: the next consumer
        # of device results must refresh_state() (+ redispatch in-flight
        # batches) first
        self._needs_resync = False
        # bumped by refresh_state: lets drain() detect that the device
        # chain its freshly dispatched batch rode was rebuilt mid-commit
        self._state_epoch = 0
        # adaptive-drain hysteresis: True while loop events keep finding
        # candidate chains (closures likely -> settle-first ordering);
        # cleared when a loop event comes up empty
        self._loop_hot = False
        # True while closures move ring poses beyond RESYNC_EPS (drives
        # the settle-first hysteresis; starts conservative)
        self._closure_hot = True
        self._t_drain_end = None  # accum-window stage timing
        self.pack_pool = PackPool(self.B)
        mapper._pack_pool = self.pack_pool  # loop verify gathers from it
        # seed with any pre-existing scans (deserialized prior graphs):
        # localization's near-chain / loop-verify work references them
        # constantly. Big priors (BASELINE config 4: 50k-100k nodes) are
        # seeded LAZILY instead — eager seeding would upload ~34 KB/scan
        # (1.7 GB at 50k) through the tunnel at init; the dispatch sites
        # (kernels/loop_verify) add the scans a chain actually touches,
        # so device residency grows with the visited area only.
        if mapper.sensor_manager is not None:
            prior = mapper.all_processed_scans()
            if len(prior) <= POOL_SEED_CAP:
                self.pack_pool.add_scans(prior)

    def warm(self) -> None:
        """Compile the batch program without touching pipeline state (a
        zeros-state dry run; the jitted callable's cache is per-instance,
        so warming must go through THIS pipeline's _prog_batch)."""
        K, B = self.K + 2, self.B
        st = {
            "ring_local": jnp.zeros((K, B, 2), jnp.float32),
            "ring_anchor": jnp.zeros((K, B, 2), jnp.float32),
            "ring_current": jnp.zeros((K, B, 2), jnp.float32),
            "ring_dvalid": jnp.zeros((K, B), bool),
            "ring_next": jnp.full((K, B), -1, jnp.int32),
            "ring_finite": jnp.zeros((K, B), bool),
            "ring_pose": jnp.zeros((K, 3), jnp.float32),
            "ring_slot_valid": jnp.zeros(K, bool),
            "head": jnp.int32(0),
            "count": jnp.int32(0),
            "last_odom": jnp.zeros(3, jnp.float32),
            "last_corrected": jnp.zeros(3, jnp.float32),
            "results": jnp.zeros((self.result_cap, 13), jnp.float32),
            "n_results": jnp.int32(0),
        }
        out = self._run_batch(
            st,
            jnp.zeros((self.drain_every, B, 8), jnp.float32),
            jnp.zeros((self.drain_every, 3), jnp.float32),
            jnp.int32(0),
        )
        out["results"].block_until_ready()

    # -- state <-> host sync -----------------------------------------------
    def _scan_stream_arrays(self, scan):
        return scan_pack(scan)

    def refresh_state(self) -> None:
        """(Re)build device state from the host's authoritative running
        buffer + last scan."""
        from slam_toolbox_tpu.utils.metrics import stage_timer

        with stage_timer(self.mapper.stats, "refresh_state"):
            self._refresh_state_impl()

    def _refresh_state_impl(self) -> None:
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
            "results": np.zeros((self.result_cap, 13), np.float32),
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
            s._dev_pose = np.array(s.sensor_pose)
        if last is not None:
            st["last_odom"] = last.odom_pose.astype(np.float32)
            st["last_corrected"] = last.corrected_pose.astype(np.float32)
        self.state = {k: jnp.asarray(v) for k, v in st.items()}
        self._dispatched_since_refresh = 0
        self._state_epoch += 1

    # -- ingestion ----------------------------------------------------------
    def process_scan(self, scan) -> bool:
        """Gate + accumulate; the whole batch is dispatched as ONE device
        program at drain (see _stream_batch_impl)."""
        if not scan.laser.validate(scan.ranges):
            return False
        last_ref = self._last_gate_scan or (
            self.mapper.sensor_manager.get_last_scan(self.laser.name)
        )
        if not self.mapper.has_moved_enough(scan, last_ref):
            return False
        if self.state is None:
            self.refresh_state()

        self.pending.append(scan)
        # async chunked upload: streams during accumulation
        self._chunk_np.append(self._scan_stream_arrays(scan))
        if len(self._chunk_np) >= UPLOAD_CHUNK:
            from slam_toolbox_tpu.utils.metrics import stage_timer

            with stage_timer(self.mapper.stats, "chunk_upload"):
                self._pending_dev.append(
                    jax.device_put(np.stack(self._chunk_np))
                )
            self._chunk_np = []
        self._last_gate_scan = scan
        # the ring only needs to hold results not yet consumed — the
        # pending batch plus (pipelined) the previous in-flight batch;
        # result_cap is sized for both, consumed slots are overwritten
        # (the fetch indexes modulo result_cap)
        if len(self.pending) >= min(self.drain_every, self.result_cap // 2):
            self.drain()
        return True

    def _dispatch_batch(self, scans) -> None:
        """Concatenate the batch on device + run the batch program (pad to
        the drain_every bucket so one executable covers every drain;
        partial flushes run only n_valid iterations — dynamic fori trip).
        Packs are uploaded asynchronously in 16-scan chunks as scans
        arrive (device_put returns immediately, the ~550 KB transfers
        stream while the host accumulates; measured ~1 GB/s, so a whole
        3.3 MB batch costs ~4 ms — chunking mainly avoids a serialized
        per-scan transfer cadence)."""
        N = max(self.drain_every, len(scans))
        B = self.B
        n = len(scans)
        odoms = np.zeros((N, 3), np.float32)
        for i, s in enumerate(scans):
            odoms[i] = s.odom_pose
        covered = sum(int(c.shape[0]) for c in self._pending_dev)
        parts = list(self._pending_dev)
        if covered + len(self._chunk_np) == n:
            if self._chunk_np:
                parts.append(jax.device_put(np.stack(self._chunk_np)))
        else:  # resync fallback (e.g. fresh state mid-batch)
            parts = [jax.device_put(
                np.stack([self._scan_stream_arrays(s) for s in scans])
            )]
        if N > n:
            parts.append(jnp.zeros((N - n, B, 8), jnp.float32))
        packs = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        self.pack_pool.append_batch(packs, scans)
        odoms_dev = jnp.asarray(odoms)
        self.state = self._run_batch(
            self.state, packs, odoms_dev, jnp.int32(n),
        )
        self._pending_dev = []
        self._chunk_np = []
        self._dispatched_since_refresh += n
        return packs, odoms_dev

    def _run_batch(self, state, packs, odoms, n_valid):
        return _stream_batch_jit(
            state, packs, odoms, n_valid,
            score_args=self._score_args,
            **self._batch_args, **self._batch_static,
        )

    def settle(self) -> None:
        """Terminal completion: commit every dispatched-but-uncommitted
        batch and any deferred loop closure, then resync the device state
        if host bookkeeping moved poses. After settle() all drained scans
        carry their final poses (flush / graph accessors rely on this);
        scans still accumulating in `pending` are untouched (drain()
        dispatches those)."""
        while (self._pending_drain is not None
               or self._deferred_loop is not None):
            self._commit()
        # rate-limited cadences (loop_attempt_interval_scans > 0) may
        # leave the tail scans without a closure attempt — the final
        # map then misses its last loop edges (measured ATE 0.029 ->
        # 0.077 when the last partial drain fell under the interval).
        # A terminal attempt on the newest scan restores the reference
        # flush semantics (the classic path attempts every scan).
        cfg = self.mapper.config
        if (getattr(cfg, "loop_attempt_interval_scans", 0) > 0
                and getattr(self, "_scans_since_loop", 0) > 0
                and cfg.use_scan_matching and cfg.do_loop_closing):
            last = self.mapper.sensor_manager.get_last_scan(
                self.laser.name
            )
            if last is not None:
                handle = self.mapper.graph.try_close_loop_begin(
                    last, self.laser.name
                )
                closed = (handle if isinstance(handle, bool)
                          else self.mapper.graph.try_close_loop_finish(
                              handle))
                self._scans_since_loop = 0
                if closed:
                    self._needs_resync = True
        if self._needs_resync:
            self.refresh_state()
            self._needs_resync = False

    def drain(self) -> None:
        """Dispatch the pending batch as one device program. Pipelined
        (default): the dispatch happens FIRST, then the PREVIOUS batch's
        host bookkeeping runs while this batch executes on device — its
        own bookkeeping runs at the next drain (or settle()). When the
        previous commit moved poses (loop closure, chain fusion touching
        the running window, buffer eviction) the in-flight batch is
        re-run from the refreshed state before its results are read, so
        drained poses are identical to the serial path. Serial mode
        (SLAM_STREAM_PIPELINE=0) fetches and commits inline. With
        drain_every=1 the commit sequence is exactly the classic per-scan
        path (tested equivalence)."""
        if not self.pipelined:
            # pure serial (SLAM_STREAM_PIPELINE=0, A/B): settle + inline
            # dispatch/fetch/commit
            self.settle()
            if not self.pending:
                return
            scans = self.pending
            self.pending = []
            self._drain_serial(scans)
            return
        if not self.pending:
            return
        from slam_toolbox_tpu.utils.metrics import stage_timer

        stats0 = self.mapper.stats
        if stats0.enabled and self._t_drain_end is not None:
            import time as _time

            stats0.add(
                "accum_window", _time.perf_counter() - self._t_drain_end
            )

        scans = self.pending
        n = len(scans)
        self.pending = []
        # adaptive ordering: while loop events keep producing candidate
        # chains (= closures likely move poses), commit + settle BEFORE
        # dispatching so every batch runs exactly once from post-closure
        # state. The dispatch-first order below would re-run every
        # in-flight batch after each closure (measured 3x batch device
        # time per drain: drain_fetch 984 ms vs 419 ms of batch time,
        # scripts/exp_drain_decomp2.py / exp_pipe_ab.py).
        # with the staleness-gated resync active, closure-heavy phases
        # force settle-first only while closures are ACTUALLY moving
        # ring poses beyond eps (_closure_hot): early-mapping closures
        # with cm-scale corrections keep the round-4 ordering (a
        # dispatch-first closure re-runs the in-flight batches — the
        # measured 3x-device-time pathology), while steady-state
        # sub-millimeter closures keep the dispatch-first overlap. With
        # the gate off (SLAM_RESYNC_EPS=0) every closure counts as hot.
        closure_hot = RESYNC_EPS == 0.0 or getattr(
            self, "_closure_hot", True
        )
        # can the commit we are about to run even ATTEMPT a closure?
        # With loop_attempt_interval_scans rate-limiting, attempt-free
        # commits cannot move poses beyond the eps-gated fusion case,
        # so they keep the dispatch-first overlap regardless of the
        # closure hysteresis (same arithmetic as _bookkeep's
        # attempt_loop gate, evaluated for the pending batch)
        cfg_m = self.mapper.config
        pd_prev = self._pending_drain
        attempt_next = (
            pd_prev is not None
            and cfg_m.use_scan_matching and cfg_m.do_loop_closing
            and (getattr(self, "_scans_since_loop", 0)
                 + len(pd_prev.scans))
            >= getattr(cfg_m, "loop_attempt_interval_scans", 0)
        )
        settle_first = ADAPTIVE and (
            self._needs_resync
            or ((self._deferred_loop is not None
                 or (self._loop_hot and attempt_next))
                and closure_hot)
        )
        if settle_first:
            with stage_timer(self.mapper.stats, "commit_total"):
                self._commit()  # previous batch: fetch+bookkeep+verify
            self._settle_deferred()  # wait the verify it just dispatched
            if self._needs_resync:
                self.refresh_state()
                self._needs_resync = False
        with stage_timer(self.mapper.stats, "batch_dispatch"):
            packs, odoms = self._dispatch_batch(scans)
        pd = _PendingDrain(
            scans, packs, odoms,
            start=self._dispatched_since_refresh - n,
            results=self.state["results"],
        )
        # gate the next accumulation against the newest DISPATCHED scan
        # (its host bookkeeping hasn't run yet, so sm.last_scan is stale)
        self._last_gate_scan = scans[-1]
        if not settle_first:
            epoch0 = self._state_epoch
            with stage_timer(self.mapper.stats, "commit_total"):
                self._commit()  # previous batch's bookkeeping; overlaps
            if self._needs_resync:
                self.refresh_state()
                self._needs_resync = False
            if self._state_epoch != epoch0:
                # the device chain this batch rode was rebuilt mid-commit:
                # re-run it from the authoritative state
                self.state = self._run_batch(
                    self.state, pd.packs, pd.odoms, jnp.int32(n)
                )
                pd.start = self._dispatched_since_refresh
                self._dispatched_since_refresh += n
                pd.results = self.state["results"]
        self._dispatch_spec(pd)
        tgt = pd.spec if pd.spec is not None else pd.results
        if hasattr(tgt, "copy_to_host_async"):
            tgt.copy_to_host_async()
        self._pending_drain = pd
        if stats0.enabled:
            import time as _time

            self._t_drain_end = _time.perf_counter()

    def _dispatch_spec(self, pd) -> None:
        """Speculative near-chain dispatch: predict each scan's chains
        from odometry-propagated poses (graph.predict_near_chains) and
        run the whole batch's chain matches back-to-back with the batch
        program — their rows ride the SAME fetch (echo program). The
        commit validates membership per scan and redispatches on
        mismatch, so results are bit-identical either way (~88% per-scan
        hit rate measured on the warehouse localization config)."""
        if (len(pd.scans) <= 1 or not SPECULATE
                or not self.mapper.config.use_scan_matching):
            return
        anchor = self.mapper.sensor_manager.get_last_scan(
            pd.scans[0].laser.name
        )
        if anchor is None:
            return
        from slam_toolbox_tpu.kernels import loop_verify as lv

        pred_chains = self.mapper.graph.predict_near_chains(
            pd.scans, anchor
        )
        stats = self.mapper.stats
        stats.count(
            "spec_pred_unavailable",
            sum(1 for c in pred_chains if c is None),
        )
        spairs = []
        spec_offsets = {}
        cap = self.result_cap
        for i, chains in enumerate(pred_chains):
            if not chains:
                continue
            spec_offsets[i] = (len(spairs), len(chains))
            spairs.extend(
                (pd.scans[i], (pd.start + i) % cap, c) for c in chains
            )
        if spairs:
            stats.count("spec_pairs", len(spairs))
            pd.spec = lv.dispatch_chain_matches_spec(
                self.matcher, spairs, self.pack_pool, pd.results
            )
            if pd.spec is not None:
                pd.pred_chains = pred_chains
                pd.spec_offsets = spec_offsets
            else:
                stats.count("spec_dispatch_abort")
        # speculative loop verify for the batch's newest scan: rides the
        # same device stream, its rows are ready by the next commit's
        # settle so the settle-first ordering pays only the solve
        interval = getattr(
            self.mapper.config, "loop_attempt_interval_scans", 0
        )
        will_attempt = (
            getattr(self, "_scans_since_loop", 0) + len(pd.scans)
            >= interval
        )
        # mapping mode with early-verify ordering skips the speculative
        # loop verify entirely: the verify's device execution hides
        # behind the commit's remaining bookkeeping instead, and the
        # speculation's ~100 ms rode the batch program's (exposed) fetch
        # path while missing ~70% on revisit-heavy maps (round-4 A/B:
        # 236 -> 253 scans/s, scripts/exp_reorder_ab.py). Localization
        # (post_finish set) keeps it — early-verify is gated off there.
        spec_loop_on = SPEC_LOOP and not (
            EARLY_VERIFY and self.post_finish is None
        )
        if (spec_loop_on and will_attempt
                and self.mapper.config.do_loop_closing
                and any(c is not None for c in pred_chains)):
            pred_loop = self.mapper.graph.predict_loop_chains(
                pd.scans, anchor, pd.scans[-1].laser.name,
                pred_chains=pred_chains,
            )
            if pred_loop:
                out = lv.dispatch_loop_verify_spec(
                    self.mapper.loop_matcher, self.matcher,
                    pd.scans[-1],
                    (pd.start + len(pd.scans) - 1) % cap,
                    pred_loop, self.mapper.config,
                    self.pack_pool, pd.results,
                )
                if out is not None:
                    pd.spec_loop, pd.spec_loop_poses = out
                    pd.pred_loop = pred_loop
                    if hasattr(pd.spec_loop, "copy_to_host_async"):
                        pd.spec_loop.copy_to_host_async()
                    stats.count("spec_loop_dispatched")

    def _settle_deferred(self) -> bool:
        """Finish the deferred loop closure dispatched by the previous
        commit. A closure flags _needs_resync (the flag survives a fetch
        exception, so a transient tunnel error cannot strand the device
        ring stale relative to host poses)."""
        if self._deferred_loop is None:
            return False
        from slam_toolbox_tpu.utils.metrics import stage_timer

        handle = self._deferred_loop
        self._deferred_loop = None
        any_closed = False
        try:
            with stage_timer(self.mapper.stats, "loop_closure_settle"):
                any_closed = self.mapper.graph.try_close_loop_finish(
                    handle
                )
        finally:
            if any_closed:
                hot = (RESYNC_EPS == 0.0
                       or self._ring_staleness() > RESYNC_EPS)
                # drives the settle-first hysteresis: closures that move
                # ring poses beyond eps keep the conservative ordering
                self._closure_hot = hot
                if hot:
                    self._needs_resync = True
        return any_closed

    def _commit(self) -> None:
        """Host bookkeeping for the oldest in-flight batch: settle the
        previous commit's deferred loop closure, re-run the batch if that
        closure (or an earlier flagged change) moved host poses after the
        batch's program ran, then fetch its results and replay the
        standard graph bookkeeping."""
        self._settle_deferred()
        pd = self._pending_drain
        self._pending_drain = None
        if pd is None:
            if self._needs_resync and self.state is not None:
                self.refresh_state()
                self._needs_resync = False
            return
        from slam_toolbox_tpu.utils.metrics import stage_timer

        n = len(pd.scans)
        if self._needs_resync:
            self.refresh_state()
            self._needs_resync = False
            self.state = self._run_batch(
                self.state, pd.packs, pd.odoms, jnp.int32(n)
            )
            pd.start = 0
            self._dispatched_since_refresh = n
            pd.results = self.state["results"]
            pd.spec = None
            pd.pred_chains = None
            pd.spec_offsets = {}
            pd.spec_loop = None
            pd.pred_loop = None
        cap = self.result_cap
        # watchdog (utils/lifecycle.Watchdog, set by SlamSession
        # .enable_watchdog): the drain fetch is the call that wedges when
        # the tunnel dies — section it so health() can report the stall
        import contextlib

        wd = getattr(self, "watchdog", None)
        wd_sec = (wd.section("drain_fetch") if wd is not None
                  else contextlib.nullcontext())
        with stage_timer(self.mapper.stats, "drain_fetch"), wd_sec:
            if pd.spec is not None:
                pd.spec.block_until_ready()
                comb = np.asarray(pd.spec, np.float64)
                res_np = comb[:cap]
                spec_np = comb[cap:]
            else:
                pd.results.block_until_ready()
                res_np = np.asarray(pd.results, np.float64)
                spec_np = None
        with stage_timer(self.mapper.stats, "commit_bookkeep"):
            spec_loop = (
                (pd.pred_loop, pd.spec_loop, pd.spec_loop_poses)
                if pd.spec_loop is not None else None
            )
            moved_uids, any_closed, buffer_changed = self._bookkeep(
                pd.scans, pd.start, res_np, spec_np,
                pd.pred_chains, pd.spec_offsets, spec_loop,
            )
        self._flag_resync(pd.scans, moved_uids, any_closed, buffer_changed)

    def _flag_resync(self, scans, moved_uids, any_closed, buffer_changed):
        """Decide whether host bookkeeping diverged from the device ring.
        Buffer edits always do (ring membership changed). Pose moves
        (loop closures, chain fusion) only matter when a ring-mirrored
        scan (running window or the propagation anchor) ACTUALLY moved —
        and, with SLAM_RESYNC_EPS > 0, moved beyond the staleness bound:
        late-run closure corrections are sub-millimeter, and a rebuild
        forces the settle-first drain ordering that exposes the whole
        batch program's device time (round-5; see RESYNC_EPS above)."""
        if buffer_changed:
            self._needs_resync = True
            return
        if not (any_closed or moved_uids):
            return
        if RESYNC_EPS > 0.0:
            stale = self._ring_staleness() > RESYNC_EPS
            if any_closed:
                self._closure_hot = stale
            if stale:
                self._needs_resync = True
            return
        if any_closed:
            self._needs_resync = True
            return
        sm = self.mapper.sensor_manager
        name = scans[-1].laser.name
        last = sm.get_last_scan(name)
        if last is not None and last.unique_id in moved_uids:
            self._needs_resync = True
            return
        running = {
            s.unique_id for s in sm.get_running_scans(name)
        }
        if moved_uids & running:
            self._needs_resync = True

    def _ring_staleness(self) -> float:
        """Max endpoint-level divergence between the host's current
        sensor poses and what the device ring believes, over the
        ring-mirrored scans (running window + last): position delta plus
        heading delta at the 10 m max-beam lever arm. Scans with no
        recorded device pose count as infinitely stale."""
        sm = self.mapper.sensor_manager
        name = self.laser.name
        last = sm.get_last_scan(name)
        worst = 0.0
        check = list(sm.get_running_scans(name))[-(self.K + 2):]
        if last is not None and last not in check:
            check.append(last)
        for s in check:
            dev = getattr(s, "_dev_pose", None)
            if dev is None:
                return float("inf")
            cur = s.sensor_pose
            d = math.hypot(cur[0] - dev[0], cur[1] - dev[1])
            dth = abs(math.atan2(math.sin(cur[2] - dev[2]),
                                 math.cos(cur[2] - dev[2])))
            worst = max(worst, d + 10.0 * dth)
        return worst

    def _drain_serial(self, scans) -> None:
        """Serial drain (SLAM_STREAM_PIPELINE=0): dispatch, fetch, and
        commit inline — the round-1 behavior, kept for A/B timing."""
        from slam_toolbox_tpu.kernels import loop_verify as lv
        from slam_toolbox_tpu.utils.metrics import stage_timer

        stats = self.mapper.stats
        n = len(scans)
        matching = self.mapper.config.use_scan_matching
        anchor = self.mapper.sensor_manager.get_last_scan(
            scans[0].laser.name
        )
        self._dispatch_batch(scans)
        results = self.state["results"]
        start = self._dispatched_since_refresh - n
        self._last_gate_scan = None
        cap = self.result_cap
        spec = None
        pred_chains = None
        spec_offsets = {}
        if n > 1 and matching and anchor is not None:
            pred_chains = self.mapper.graph.predict_near_chains(
                scans, anchor
            )
            spairs = []
            for i, chains in enumerate(pred_chains):
                if not chains:
                    continue
                spec_offsets[i] = (len(spairs), len(chains))
                spairs.extend(
                    (scans[i], (start + i) % cap, c) for c in chains
                )
            if spairs:
                spec = lv.dispatch_chain_matches_spec(
                    self.matcher, spairs, self.pack_pool, results
                )
        # request the device->host transfer NOW: it starts the moment the
        # program finishes instead of on the host's np.asarray round trip
        # (~25 ms tunnel RTT per drain saved)
        tgt = spec if spec is not None else results
        if hasattr(tgt, "copy_to_host_async"):
            tgt.copy_to_host_async()
        with stage_timer(stats, "drain_fetch"):
            if spec is not None:
                spec.block_until_ready()
                comb = np.asarray(spec, np.float64)
                res_np = comb[:cap]
                spec_np = comb[cap:]
            else:
                results.block_until_ready()
                res_np = np.asarray(results, np.float64)
                spec_np = None
        moved_uids, any_closed, buffer_changed = self._bookkeep(
            scans, start, res_np, spec_np, pred_chains, spec_offsets
        )
        # the device ring evolved with identical updates (same rule, same
        # fetched poses), so a resync is only needed when bookkeeping
        # moved poses (chain fusion, loop closure) — the common corridor
        # case skips the full state re-upload. With a deferred loop
        # closure in flight the decision moves to the next settle.
        if moved_uids or any_closed or buffer_changed:
            self._needs_resync = True
        if self._deferred_loop is None and self._needs_resync:
            self.refresh_state()
            self._needs_resync = False

    def _bookkeep(self, scans, start, res_np, spec_np, pred_chains,
                  spec_offsets, spec_loop=None):
        """Replay standard graph bookkeeping for a fetched batch in two
        phases (host links + async near-chain dispatch, then one batched
        wait + link/fuse), with one loop-closure attempt on the newest
        scan. Returns (moved_uids, any_closed, buffer_changed)."""
        from slam_toolbox_tpu.kernels import loop_verify as lv
        from slam_toolbox_tpu.utils.metrics import stage_timer

        stats = self.mapper.stats
        n = len(scans)
        cap = self.result_cap
        matching = self.mapper.config.use_scan_matching
        moved_uids = set()
        any_closed = False
        sm = self.mapper.sensor_manager
        graph = self.mapper.graph

        def set_poses(i, scan):
            packed = res_np[(start + i) % cap]
            response = packed[0]
            mean = packed[1:4]
            cov = packed[4:13].reshape(3, 3)
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
            # what the device ring believes this scan's sensor pose is
            # (the staleness-gated resync compares against it)
            scan._dev_pose = np.array(scan.sensor_pose)
            return cov

        buffer_changed = False
        if n == 1:
            # single-scan drain: exactly the classic per-scan sequence
            scan = scans[0]
            cov = set_poses(0, scan)
            pose_before = scan.corrected_pose.copy()
            any_closed = self.mapper.finish_scan(scan, cov)
            if np.any(np.abs(scan.corrected_pose - pose_before) > 1e-7):
                moved_uids.add(scan.unique_id)
            if self.post_finish is not None:
                buffer_changed = bool(self.post_finish(scan))
        else:
            # phase 1 (per scan): set poses from the fetched ring results,
            # add the vertex + host-side links, and DISPATCH the near-chain
            # matches without waiting — phase 2 pays one completion wait
            # for the whole batch instead of one per scan (the tunnel round
            # trip is ~30-90 ms, the dominant per-scan cost at these kernel
            # speeds). Running-buffer eviction sees the pre-fusion pose
            # here (mm-scale difference at the eviction boundary only) —
            # part of the documented between-drain approximation.
            staged = []
            for i, scan in enumerate(scans):
                cov = set_poses(i, scan)
                sm.add_scan(scan)
                pf = None
                if matching:
                    with stage_timer(stats, "graph_edges"):
                        graph.add_vertex(scan)
                        pf = graph.add_edges_begin(
                            scan, cov, dispatch=False
                        )
                    sm.add_running_scan(scan)
                sm.set_last_scan(scan)
                staged.append((scan, pf))
            # phase 2: validate the speculative rows per scan (chain
            # membership + query response, see predict_near_chains); any
            # missed scan's chains run as ONE fused pool-gather program
            # (scan over (query, chain) pairs) with a single stacked
            # fetch; per-chain dispatch is the fallback when a scan has
            # no pool slot
            from slam_toolbox_tpu.kernels.match import Matcher

            plan = []  # per staged entry: (kind, offset, count)
            miss_pairs = []
            for i, (scan, pf) in enumerate(staged):
                if pf is None or not pf[0]:
                    plan.append(("none", 0, 0))
                    continue
                actual_ids = [
                    tuple(s.unique_id for s in c) for c in pf[0]
                ]
                hit = False
                if spec_np is not None and i in spec_offsets:
                    off, cnt = spec_offsets[i]
                    pred_ids = [
                        tuple(s.unique_id for s in c)
                        for c in pred_chains[i]
                    ]
                    hit = (
                        pred_ids == actual_ids
                        and res_np[(start + i) % cap][0] > 0.0
                    )
                if hit:
                    plan.append(("spec", off, cnt))
                    stats.count("spec_chain_hit")
                else:
                    plan.append(("miss", len(miss_pairs), len(pf[0])))
                    miss_pairs.extend((scan, c) for c in pf[0])
                    if spec_np is not None:
                        stats.count("spec_chain_miss")
            fetched_miss = []
            if miss_pairs:
                with stage_timer(stats, "near_chain_match"):
                    rows = lv.dispatch_chain_matches(
                        self.matcher, miss_pairs, self.pack_pool
                    )
                    if rows is not None:
                        stacked = (rows[0] if len(rows) == 1
                                   else jnp.concatenate(rows, axis=0))
                    else:  # fallback: per-chain two-program dispatch
                        packs = []
                        for q, chain in miss_pairs:
                            packs.extend(
                                self.matcher.dispatch_scans_batch(
                                    q, [chain], penalize=False,
                                    refine=True,
                                )
                            )
                        stacked = jnp.stack(packs)
                    stacked.block_until_ready()
                    fetched_miss = Matcher.results_from_packed(
                        np.asarray(stacked)
                    )
            spec_results = (
                Matcher.results_from_packed(spec_np)
                if spec_np is not None and len(spec_np) else []
            )
            # loop closure once per batch on the newest scan (candidate
            # chains persist across consecutive scans, so closures fire a
            # few scans later at most). Single-sensor case: dispatch the
            # fused verify and DEFER the fetch to the next commit/settle
            # so its device time overlaps later accumulation.
            # loop_attempt_interval_scans > 0 additionally rate-limits
            # attempts (localization at tiny drains re-anchors every few
            # scans otherwise — each event costs a sweep + verify, and
            # inter-anchor odometry drift is cm-scale)
            self._scans_since_loop = getattr(
                self, "_scans_since_loop", 0
            ) + n
            interval = getattr(
                self.mapper.config, "loop_attempt_interval_scans", 0
            )
            attempt_loop = (
                matching and self.mapper.config.do_loop_closing
                and self._scans_since_loop >= interval
            )
            if attempt_loop:
                self._scans_since_loop = 0
            names = sm.sensor_names() if attempt_loop else []

            def finish_one(i):
                scan, pf = staged[i]
                kind, off, cnt = plan[i]
                pose_before = scan.corrected_pose.copy()
                res_i = None
                if pf is not None:
                    if kind == "spec":
                        res_i = spec_results[off:off + cnt]
                    elif kind == "miss":
                        res_i = fetched_miss[off:off + cnt]
                    else:
                        res_i = []
                with stage_timer(stats, "graph_edges"):
                    graph.add_edges_finish(scan, pf, results=res_i)
                if np.any(np.abs(scan.corrected_pose - pose_before) > 1e-7):
                    # near-chain fusion moved this scan
                    moved_uids.add(scan.unique_id)
                if self.post_finish is not None:
                    return bool(self.post_finish(scan))
                return False

            def begin_loop():
                # speculative verify rows are usable only when the
                # center they rode (the newest scan's ring row) is
                # BIT-EXACTLY its current f32 sensor pose: a fusion
                # move below the f64 bookkeeping threshold can still
                # flip an f32 ulp, so compare the f32 values directly
                # rather than gating on moved_uids
                last_scan = scans[-1]
                spec = None
                last_row = res_np[(start + n - 1) % cap]
                if (spec_loop is not None
                        and last_row[0] > 0.0
                        and np.array_equal(
                            np.asarray(last_scan.sensor_pose,
                                       np.float32),
                            last_row[1:4].astype(np.float32))):
                    pred_loop, rows, snap = spec_loop
                    spec = (pred_loop, rows, snap)
                with stage_timer(stats, "loop_closure"):
                    handle = graph.try_close_loop_begin(
                        last_scan, names[0], spec=spec
                    )
                # adaptive hysteresis: candidate chains present ->
                # closures likely -> settle-first ordering next drain
                self._loop_hot = bool(handle) or not isinstance(
                    handle, bool
                )
                return handle

            # early-verify ordering (mapping mode): finish the NEWEST
            # scan first, dispatch the deferred loop verify, then finish
            # the rest — the verify's device execution (~50-100 ms)
            # overlaps the remaining host bookkeeping instead of sitting
            # on the settle-first critical path after it. The sweep sees
            # batch-mates at their pre-fusion (phase-1) poses, the same
            # mm-scale boundary approximation the batch path already
            # documents; gated off in localization/lifelong
            # (post_finish) where mid-batch buffer eviction could remove
            # a swept chain member before the deferred phase 2 runs.
            early_verify = (
                EARLY_VERIFY and attempt_loop and len(names) == 1
                and self.post_finish is None and n > 1
            )
            handle = None
            if early_verify:
                buffer_changed |= finish_one(n - 1)
                handle = begin_loop()
                for i in range(n - 1):
                    buffer_changed |= finish_one(i)
            else:
                for i in range(n):
                    buffer_changed |= finish_one(i)
                if attempt_loop and len(names) == 1:
                    handle = begin_loop()
            if handle is not None:
                if isinstance(handle, bool):
                    any_closed |= handle
                else:
                    self._deferred_loop = handle
            elif attempt_loop and len(names) > 1:
                with stage_timer(stats, "loop_closure"):
                    hot = False
                    for name in names:
                        if graph.try_close_loop(scans[-1], name):
                            any_closed = True
                            hot = True
                    self._loop_hot = hot
        return moved_uids, any_closed, buffer_changed
