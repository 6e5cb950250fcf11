"""Fused loop-closure verification: coarse candidate match, response/
variance gates, and the fine verification for EVERY candidate chain of a
loop event run as ONE device program (a lax.scan over chains; one
dispatch + one fetch per event).

The staged path (TryCloseLoop, Mapper.cpp:1500-1561) pays two tunnel
round trips per loop event — coarse batch, host gates, fine batch — plus
a second host-side chain raster prep. Here the chain's world points and
FindValidPoints visibility are computed ON DEVICE from the per-scan pack
buffers (the same (B, 8) layout the streaming pipeline uploads), the
coarse pass runs at the loop matcher's geometry, the gates
(Mapper.cpp:1523-1525) evaluate on device, and the fine pass re-rasters
at the sequential matcher's geometry centered at the coarse pose —
exactly the temporary-scan seeding of Mapper.cpp:1527-1535. Gate
semantics are bit-identical to the host compare (no f32 value separates
the f32-rounded threshold from its f64 original for strict >/<).

Host logic (first passing chain closes; response-expansion fallback for
zero-response fine results) is unchanged in graph/pose_graph.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from slam_toolbox_tpu.kernels.match import _score_impl, _raster_quant_impl

# bucket floors balance executables against padding: every (NC, Cb) pair
# is its own executable and remote compiles cost minutes late in a tunnel
# session, but padded chain slots cost real raster work per step. Near
# chains measure 10-16 scans in practice (warehouse/apartment worlds), so
# a 16 floor carries the common case at ~1/4 the raster cost of the old
# 64 floor; longer chains (loop candidates) jump to 64.
CHAIN_BUCKETS = (16, 64, 128)


def chain_bucket(n: int) -> int:
    for b in CHAIN_BUCKETS:
        if n <= b:
            return b
    return ((n + 127) // 128) * 128


def _chain_raster(
    packs, poses, cvalid, viewpoint_xy, offset,
    scale, sigma_cells, grid_size, half_kernel, acc_r, parity,
):
    """World points + device FindValidPoints + raster for a padded chain
    of scans — the streaming ring raster generalized to explicit pose
    arrays (mapper/streaming.py:_stream_raster_impl)."""
    local = packs[:, :, 0:2]
    anchor = packs[:, :, 2:4]
    cur = packs[:, :, 4:6]
    nxt = packs[:, :, 6].astype(jnp.int32)
    flags = packs[:, :, 7].astype(jnp.int32)
    finite = (flags & 1) > 0
    dvalid = (flags & 2) > 0

    c, s = jnp.cos(poses[:, 2]), jnp.sin(poses[:, 2])
    wx = poses[:, 0:1] + c[:, None] * local[:, :, 0] - s[:, None] * local[:, :, 1]
    wy = poses[:, 1:2] + s[:, None] * local[:, :, 0] + c[:, None] * local[:, :, 1]
    pts = jnp.stack([wx, wy], axis=-1)

    dvx = viewpoint_xy[0] - poses[:, 0]
    dvy = viewpoint_xy[1] - poses[:, 1]
    vxl = c * dvx + s * dvy
    vyl = -s * dvx + c * dvy
    a = vyl[:, None] - anchor[:, :, 1]
    b = anchor[:, :, 0] - vxl[:, None]
    cc = anchor[:, :, 1] * vxl[:, None] - anchor[:, :, 0] * vyl[:, None]
    ss = cur[:, :, 0] * a + cur[:, :, 1] * b + cc
    keep_run = (ss >= 0.0) & dvalid
    keep = jnp.take_along_axis(keep_run, jnp.maximum(nxt, 0), axis=1)
    valid = (nxt >= 0) & keep & finite & cvalid[:, None]

    C, B = local.shape[0], local.shape[1]
    return _raster_quant_impl(
        pts.reshape(C * B, 2), valid.reshape(C * B), offset,
        scale, sigma_cells, grid_size, half_kernel, acc_r, parity,
    )


def _loop_verify_impl(
    packs, poses, cvalid, scan_local, scan_finite, center, gates,
    loop_args: dict, seq_args: dict,
    loop_sigma, seq_sigma, loop_half_span, seq_half_span,
    loop_G: int, loop_hk: int, loop_acc_r: int, loop_parity: bool,
    loop_na_c: int, loop_na_f: int,
    seq_G: int, seq_hk: int, seq_acc_r: int, seq_parity: bool,
    seq_na_c: int, seq_na_f: int,
):
    """Returns (27,): [coarse packed 13 | fine packed 13 | gate]."""
    # coarse at the loop matcher's geometry, viewpoint = current pose
    off_l = center[:2] - loop_half_span
    grid_l, pgrid_l = _chain_raster(
        packs, poses, cvalid, center[:2], off_l,
        loop_args["scale"], loop_sigma, loop_G, loop_hk, loop_acc_r,
        loop_parity,
    )
    packed_c = _score_impl(
        grid_l, pgrid_l, jnp.concatenate([center, off_l]),
        scan_local, scan_finite,
        penalize=jnp.bool_(False),
        grid_size=loop_G, na_coarse=loop_na_c, na_fine=loop_na_f,
        acc_r=loop_acc_r, refine=False, **loop_args,
    )
    # gates (Mapper.cpp:1523-1525): response and x/y variance
    gate = (
        (packed_c[0] > gates[0])
        & (packed_c[4] < gates[1])
        & (packed_c[8] < gates[1])
    )
    # fine at the sequential matcher's geometry, centered at the coarse
    # pose (the reference's temporary scan seeding)
    center2 = packed_c[1:4]
    off_s = center2[:2] - seq_half_span
    grid_s, pgrid_s = _chain_raster(
        packs, poses, cvalid, center2[:2], off_s,
        seq_args["scale"], seq_sigma, seq_G, seq_hk, seq_acc_r,
        seq_parity,
    )
    packed_f = _score_impl(
        grid_s, pgrid_s, jnp.concatenate([center2, off_s]),
        scan_local, scan_finite,
        penalize=jnp.bool_(False),
        grid_size=seq_G, na_coarse=seq_na_c, na_fine=seq_na_f,
        acc_r=seq_acc_r, refine=True, **seq_args,
    )
    return jnp.concatenate(
        [packed_c, packed_f, gate.astype(jnp.float32)[None]]
    )


def _loop_verify_scan_impl(
    packs, poses, cvalid,              # (NC, Cb, B, 8), (NC, Cb, 3), (NC, Cb)
    scan_local, scan_finite, center, gates,
    loop_args: dict, seq_args: dict,
    loop_sigma, seq_sigma, loop_half_span, seq_half_span,
    loop_G: int, loop_hk: int, loop_acc_r: int, loop_parity: bool,
    loop_na_c: int, loop_na_f: int,
    seq_G: int, seq_hk: int, seq_acc_r: int, seq_parity: bool,
    seq_na_c: int, seq_na_f: int,
):
    """All of one loop event's candidate chains verified in ONE program:
    a lax.scan over chains. Two reasons: (a) one dispatch+fetch per event
    instead of per chain; (b) XLA compiles the straight-line verify
    pathologically (~88 ms/chain measured vs 14 ms scan-wrapped at
    length 1, 7 ms amortized — the scan body gets the buffer reuse the
    straight-line schedule misses)."""

    def step(carry, inp):
        pk, ps, cv = inp

        def live(_):
            return _loop_verify_impl(
                pk, ps, cv, scan_local, scan_finite, center, gates,
                loop_args=loop_args, seq_args=seq_args,
                loop_sigma=loop_sigma, seq_sigma=seq_sigma,
                loop_half_span=loop_half_span,
                seq_half_span=seq_half_span,
                loop_G=loop_G, loop_hk=loop_hk, loop_acc_r=loop_acc_r,
                loop_parity=loop_parity, loop_na_c=loop_na_c,
                loop_na_f=loop_na_f,
                seq_G=seq_G, seq_hk=seq_hk, seq_acc_r=seq_acc_r,
                seq_parity=seq_parity, seq_na_c=seq_na_c,
                seq_na_f=seq_na_f,
            )

        # padding chains (no valid member) skip the raster+score
        # entirely: one big NC bucket then costs ~nothing per pad, so
        # the (NC, Cb) executable family can stay tiny (cold remote
        # compiles per bucket were the measured floor of the config-4
        # single-pass run)
        row = jax.lax.cond(
            cv.any(), live,
            lambda _: jnp.zeros((27,), jnp.float32), operand=None,
        )
        return carry, row

    _, rows = jax.lax.scan(step, 0, (packs, poses, cvalid))
    return rows  # (NC, 27)


_loop_verify_jit = jax.jit(
    _loop_verify_scan_impl,
    static_argnames=(
        "loop_G", "loop_hk", "loop_acc_r", "loop_parity",
        "loop_na_c", "loop_na_f",
        "seq_G", "seq_hk", "seq_acc_r", "seq_parity",
        "seq_na_c", "seq_na_f",
    ),
)


def _loop_verify_spec_impl(
    pool, results, qidx, ridx,
    cidx, cvalid, poses,               # (NC, Cb), (NC, Cb), (NC, Cb, 3)
    gates,
    loop_args: dict, seq_args: dict,
    loop_sigma, seq_sigma, loop_half_span, seq_half_span,
    loop_G: int, loop_hk: int, loop_acc_r: int, loop_parity: bool,
    loop_na_c: int, loop_na_f: int,
    seq_G: int, seq_hk: int, seq_acc_r: int, seq_parity: bool,
    seq_na_c: int, seq_na_f: int,
):
    """Speculative variant of _loop_verify_scan_impl, dispatched WITH the
    streaming batch program: the query's local points come from its pack
    pool slot (bit-identical to kernels/match._scan_device_cache: both
    are nan_to_num(f32 local) + isfinite(ranges)), and the verify center
    is read from the batch result ring ON DEVICE (results[ridx, 1:4] is
    the exact post-match sensor pose the host would pass, f32 round-trip
    exact). The host validates at commit time that the predicted chains
    equal the real sweep and that nothing moved the query's pose (chain
    fusion / closure); on mismatch the normal dispatch path re-runs, so
    closure decisions are bit-identical either way."""
    qpack = pool[qidx]
    scan_local = qpack[:, 0:2]
    scan_finite = (qpack[:, 7].astype(jnp.int32) & 1) > 0
    center = results[ridx, 1:4]
    packs = pool[cidx]                 # (NC, Cb, B, 8)

    def step(carry, inp):
        pk, ps, cv = inp

        def live(_):
            return _loop_verify_impl(
                pk, ps, cv, scan_local, scan_finite, center, gates,
                loop_args=loop_args, seq_args=seq_args,
                loop_sigma=loop_sigma, seq_sigma=seq_sigma,
                loop_half_span=loop_half_span,
                seq_half_span=seq_half_span,
                loop_G=loop_G, loop_hk=loop_hk, loop_acc_r=loop_acc_r,
                loop_parity=loop_parity, loop_na_c=loop_na_c,
                loop_na_f=loop_na_f,
                seq_G=seq_G, seq_hk=seq_hk, seq_acc_r=seq_acc_r,
                seq_parity=seq_parity, seq_na_c=seq_na_c,
                seq_na_f=seq_na_f,
            )

        # padding chains (no valid member) skip the raster+score
        # entirely: one big NC bucket then costs ~nothing per pad, so
        # the (NC, Cb) executable family can stay tiny (cold remote
        # compiles per bucket were the measured floor of the config-4
        # single-pass run)
        row = jax.lax.cond(
            cv.any(), live,
            lambda _: jnp.zeros((27,), jnp.float32), operand=None,
        )
        return carry, row

    _, rows = jax.lax.scan(step, 0, (packs, poses, cvalid))
    return rows  # (NC, 27)


_loop_verify_spec_jit = jax.jit(
    _loop_verify_spec_impl,
    static_argnames=(
        "loop_G", "loop_hk", "loop_acc_r", "loop_parity",
        "loop_na_c", "loop_na_f",
        "seq_G", "seq_hk", "seq_acc_r", "seq_parity",
        "seq_na_c", "seq_na_f",
    ),
)


def dispatch_loop_verify_spec(loop_matcher, seq_matcher, scan, ridx,
                              chains, cfg, pool, results):
    """Dispatch the fused verify for PREDICTED chains right after the
    batch+echo programs (see _loop_verify_spec_impl). Returns the
    in-flight (n_chains, 27) device rows or None when a pool slot is
    missing."""
    if pool is None or not chains:
        return None
    if not _ensure_pooled(
        pool, [scan] + [sc for c in chains for sc in c]
    ):
        return None
    gates = jnp.asarray(np.array([
        cfg.loop_match_minimum_response_coarse,
        cfg.loop_match_maximum_variance_coarse,
    ], np.float32))
    NC = chain_count_bucket(len(chains))
    Cb = max(chain_bucket(len(c)) for c in chains)
    idx = np.zeros((NC, Cb), np.int32)   # slot 0 is the zero row
    n_pose = np.zeros((NC, Cb, 3), np.float32)
    n_valid = np.zeros((NC, Cb), bool)
    for ci, chain in enumerate(chains):
        for i, sc in enumerate(chain):
            idx[ci, i] = sc._pool_slot
            n_pose[ci, i] = sc.sensor_pose
            n_valid[ci, i] = True
    rows = _loop_verify_spec_jit(
        pool.buf, results, jnp.int32(scan._pool_slot), jnp.int32(ridx),
        jnp.asarray(idx), jnp.asarray(n_valid), jnp.asarray(n_pose),
        gates,
        loop_args=dict(loop_matcher._score_args),
        seq_args=dict(seq_matcher._score_args),
        loop_sigma=np.float32(loop_matcher.sigma_cells),
        seq_sigma=np.float32(seq_matcher.sigma_cells),
        loop_half_span=np.float32(
            0.5 * (loop_matcher.G - 1) * loop_matcher.resolution),
        seq_half_span=np.float32(
            0.5 * (seq_matcher.G - 1) * seq_matcher.resolution),
        loop_G=loop_matcher.G, loop_hk=loop_matcher.half_kernel,
        loop_acc_r=loop_matcher._acc_r,
        loop_parity=loop_matcher.use_pallas,
        loop_na_c=loop_matcher._na_coarse,
        loop_na_f=loop_matcher._na_fine,
        seq_G=seq_matcher.G, seq_hk=seq_matcher.half_kernel,
        seq_acc_r=seq_matcher._acc_r,
        seq_parity=seq_matcher.use_pallas,
        seq_na_c=seq_matcher._na_coarse,
        seq_na_f=seq_matcher._na_fine,
    )
    # pose snapshot lets the validator prove the chains did not move
    # between dispatch and the real sweep (bit-exact f32 compare)
    return rows[:len(chains)], n_pose


def _chain_match_impl(
    pool, qidx, cidx, cvalid, poses, centers,
    seq_args: dict, seq_sigma, seq_half_span,
    seq_G: int, seq_hk: int, seq_acc_r: int, seq_parity: bool,
    seq_na_c: int, seq_na_f: int,
):
    """All of a drain's near-chain matches in ONE program: a lax.scan
    over (query, chain) pairs. Each step gathers the query's pack and the
    chain's packs from the pool by slot, rasters the chain at the
    sequential matcher's geometry with on-device FindValidPoints, and
    runs the fused refine=True score (LinkNearChains matches unpenalized,
    Mapper.cpp:1653). Replaces two straight-line programs + a host point
    prep + ~34 KB uploads PER CHAIN (measured 378 ms per localization
    drain batch)."""

    def step(c, inp):
        qi, ci, cv, ps, center = inp

        def live(_):
            qpack = pool[qi]
            local = qpack[:, 0:2]
            finite = (qpack[:, 7].astype(jnp.int32) & 1) > 0
            packs = pool[ci]                 # (Cb, B, 8)
            off = center[:2] - seq_half_span
            grid, pgrid = _chain_raster(
                packs, ps, cv, center[:2], off,
                seq_args["scale"], seq_sigma, seq_G, seq_hk, seq_acc_r,
                seq_parity,
            )
            return _score_impl(
                grid, pgrid, jnp.concatenate([center, off]), local,
                finite, penalize=jnp.bool_(False),
                grid_size=seq_G, na_coarse=seq_na_c, na_fine=seq_na_f,
                acc_r=seq_acc_r, refine=True, **seq_args,
            )

        row = jax.lax.cond(
            cv.any(), live,
            lambda _: jnp.zeros((13,), jnp.float32), operand=None,
        )
        return c, row

    _, rows = jax.lax.scan(
        step, 0, (qidx, cidx, cvalid, poses, centers)
    )
    return rows  # (NP, 13)


_chain_match_jit = jax.jit(
    _chain_match_impl,
    static_argnames=("seq_G", "seq_hk", "seq_acc_r", "seq_parity",
                     "seq_na_c", "seq_na_f"),
)


def _chain_match_echo_impl(
    pool, results, qidx, ridx, cidx, cvalid, poses,
    seq_args: dict, seq_sigma, seq_half_span,
    seq_G: int, seq_hk: int, seq_acc_r: int, seq_parity: bool,
    seq_na_c: int, seq_na_f: int,
):
    """Speculative variant of _chain_match_impl, dispatched right after
    the batch program BEFORE its results are fetched: each pair's match
    center is read from the batch result ring ON DEVICE (results[ridx,
    1:4] is the query's post-match sensor-pose mean — the exact value the
    host would pass after set_poses), so the chain matches execute
    back-to-back with the batch program and their rows come back in the
    SAME fetch (the output echoes the result ring, rows appended). The
    host validates predicted chain membership afterwards and falls back
    per scan on mismatch — hit rows are bit-identical to the
    non-speculative path."""

    def step(c, inp):
        qi, ri, ci, cv, ps = inp

        def live(_):
            qpack = pool[qi]
            local = qpack[:, 0:2]
            finite = (qpack[:, 7].astype(jnp.int32) & 1) > 0
            packs = pool[ci]
            center = results[ri, 1:4]
            off = center[:2] - seq_half_span
            grid, pgrid = _chain_raster(
                packs, ps, cv, center[:2], off,
                seq_args["scale"], seq_sigma, seq_G, seq_hk, seq_acc_r,
                seq_parity,
            )
            return _score_impl(
                grid, pgrid, jnp.concatenate([center, off]), local,
                finite, penalize=jnp.bool_(False),
                grid_size=seq_G, na_coarse=seq_na_c, na_fine=seq_na_f,
                acc_r=seq_acc_r, refine=True, **seq_args,
            )

        row = jax.lax.cond(
            cv.any(), live,
            lambda _: jnp.zeros((13,), jnp.float32), operand=None,
        )
        return c, row

    _, rows = jax.lax.scan(step, 0, (qidx, ridx, cidx, cvalid, poses))
    return jnp.concatenate([results, rows], axis=0)


_chain_match_echo_jit = jax.jit(
    _chain_match_echo_impl,
    static_argnames=("seq_G", "seq_hk", "seq_acc_r", "seq_parity",
                     "seq_na_c", "seq_na_f"),
)


def _ensure_pooled(pool, scans) -> bool:
    """Lazily seed pool slots for any of `scans` missing one (big
    deserialized priors skip eager seeding — mapper/streaming.py
    POOL_SEED_CAP); returns False if any scan still has no slot (beam
    mismatch) so the caller can fall back."""
    missing = [s for s in scans if getattr(s, "_pool_slot", None) is None]
    if missing:
        pool.add_scans(missing)
    return all(getattr(s, "_pool_slot", None) is not None for s in scans)


def dispatch_chain_matches_spec(seq_matcher, pairs, pool, results):
    """Speculative dispatch: pairs = [(query_scan, ring_row, chain)];
    `results` is the IN-FLIGHT batch result ring. Returns the device
    (RESULT_CAP + NP, 13) echo array (result ring followed by one row per
    pair, pairs order) or None when a pool slot is missing or the batch
    exceeds one chunk."""
    if pool is None or not pairs or len(pairs) > PAIR_CHUNK:
        return None
    involved = [q for q, _, _ in pairs] + [
        sc for _, _, chain in pairs for sc in chain
    ]
    if not _ensure_pooled(pool, involved):
        return None
    # one NP bucket: padded pairs skip via the lax.cond in the scan
    # body, and every extra (NP, Cb) pair is its own cold remote compile
    NP = PAIR_CHUNK
    Cb = max(chain_bucket(len(c)) for _, _, c in pairs)
    qidx = np.zeros(NP, np.int32)
    ridx = np.zeros(NP, np.int32)
    cidx = np.zeros((NP, Cb), np.int32)   # slot 0 = zero row
    cvalid = np.zeros((NP, Cb), bool)
    poses = np.zeros((NP, Cb, 3), np.float32)
    for p, (q, rrow, chain) in enumerate(pairs):
        qidx[p] = q._pool_slot
        ridx[p] = rrow
        for i, sc in enumerate(chain):
            cidx[p, i] = sc._pool_slot
            cvalid[p, i] = True
            poses[p, i] = sc.sensor_pose
    return _chain_match_echo_jit(
        pool.buf, results, jnp.asarray(qidx), jnp.asarray(ridx),
        jnp.asarray(cidx), jnp.asarray(cvalid), jnp.asarray(poses),
        seq_args=dict(seq_matcher._score_args),
        seq_sigma=np.float32(seq_matcher.sigma_cells),
        seq_half_span=np.float32(
            0.5 * (seq_matcher.G - 1) * seq_matcher.resolution),
        seq_G=seq_matcher.G, seq_hk=seq_matcher.half_kernel,
        seq_acc_r=seq_matcher._acc_r,
        seq_parity=seq_matcher.use_pallas,
        seq_na_c=seq_matcher._na_coarse,
        seq_na_f=seq_matcher._na_fine,
    )


PAIR_CHUNK = 16


def dispatch_chain_matches(seq_matcher, pairs, pool):
    """pairs: list of (query_scan, chain). Returns the in-flight list of
    (NP_chunk, 13) device row arrays (concat order == pairs order), or
    None when any involved scan has no pool slot (caller falls back to
    the per-chain dispatch path)."""
    if pool is None or not pairs:
        return None
    involved = [q for q, _ in pairs] + [
        sc for _, chain in pairs for sc in chain
    ]
    if not _ensure_pooled(pool, involved):
        return None
    out = []
    for k0 in range(0, len(pairs), PAIR_CHUNK):
        chunk = pairs[k0:k0 + PAIR_CHUNK]
        # one NP bucket: padded pairs skip via the lax.cond in the
        # scan body (each extra (NP, Cb) pair was its own multi-minute
        # cold remote compile)
        NP = PAIR_CHUNK
        Cb = max(chain_bucket(len(c)) for _, c in chunk)
        qidx = np.zeros(NP, np.int32)
        cidx = np.zeros((NP, Cb), np.int32)   # slot 0 = zero row
        cvalid = np.zeros((NP, Cb), bool)
        poses = np.zeros((NP, Cb, 3), np.float32)
        centers = np.zeros((NP, 3), np.float32)
        for p, (q, chain) in enumerate(chunk):
            qidx[p] = q._pool_slot
            centers[p] = q.sensor_pose
            for i, sc in enumerate(chain):
                cidx[p, i] = sc._pool_slot
                cvalid[p, i] = True
                poses[p, i] = sc.sensor_pose
        out.append(_chain_match_jit(
            pool.buf, jnp.asarray(qidx), jnp.asarray(cidx),
            jnp.asarray(cvalid), jnp.asarray(poses),
            jnp.asarray(centers),
            seq_args=dict(seq_matcher._score_args),
            seq_sigma=np.float32(seq_matcher.sigma_cells),
            seq_half_span=np.float32(
                0.5 * (seq_matcher.G - 1) * seq_matcher.resolution),
            seq_G=seq_matcher.G, seq_hk=seq_matcher.half_kernel,
            seq_acc_r=seq_matcher._acc_r,
            seq_parity=seq_matcher.use_pallas,
            seq_na_c=seq_matcher._na_coarse,
            seq_na_f=seq_matcher._na_fine,
        )[:len(chunk)])
    return out


def _pack_dev(scan):
    """Per-scan device-resident pack, uploaded once per scan ever (the
    pack is sensor-frame, pose-independent)."""
    dev = getattr(scan, "_pack_dev", None)
    if dev is None:
        from slam_toolbox_tpu.mapper.streaming import scan_pack

        dev = jax.device_put(scan_pack(scan))
        try:
            scan._pack_dev = dev
        except AttributeError:
            pass
    return dev


def chain_count_bucket(n: int) -> int:
    # padded chains cost ~nothing (lax.cond skip in the scan bodies), so
    # two coarse buckets replace the old {2,4,8,8k...} family — each
    # distinct (NC, Cb) pair was a separate cold remote compile
    for b in (8, 32):
        if n <= b:
            return b
    return ((n + 31) // 32) * 32


def dispatch_loop_verify_chunked(loop_matcher, seq_matcher, scan, chains,
                                 cfg, pool=None, chunk: int = 8):
    """Dispatch the fused verify as a SEQUENCE of <=chunk-chain programs
    instead of one big one. The reference's TryCloseLoop stops at the
    first accepted chain and re-sweeps with corrected poses
    (Mapper.cpp:1500-1561) — so on revisit-heavy maps most of a big
    program's rows are discarded whenever a closure fires. Chunks
    execute back-to-back on device (async dispatch); the finish fetches
    them IN ORDER and stops at the first acceptance, skipping the
    remaining chunks' fetches entirely. Gate values and acceptance
    order are identical to the single-program path (each chain's row
    depends only on its own membership + the query center).

    Returns [(dev_rows, chains_slice), ...].
    """
    out = []
    for lo in range(0, len(chains), chunk):
        sl = chains[lo:lo + chunk]
        rows = dispatch_loop_verify(
            loop_matcher, seq_matcher, scan, sl, cfg, pool=pool
        )
        if hasattr(rows, "copy_to_host_async"):
            rows.copy_to_host_async()
        out.append((rows, sl))
    return out


def dispatch_loop_verify(loop_matcher, seq_matcher, scan, chains, cfg,
                         pool=None):
    """Dispatch ONE fused verify program covering every candidate chain
    of this loop event (scan-over-chains, see _loop_verify_scan_impl);
    returns the in-flight (n_chains, 27) packed device rows.

    `pool` is the streaming pipeline's device pack pool (PackPool): when
    every chain scan has a pool slot, chain packs are gathered on device
    by slot index — the per-scan upload path otherwise re-transfers
    ~34 KB per chain scan through the tunnel on every loop event
    (measured ~60 ms of the ~114 ms event cost)."""
    from slam_toolbox_tpu.kernels.match import _scan_device_cache

    center = np.asarray(scan.sensor_pose, np.float32)
    local_dev, finite_dev = _scan_device_cache(scan)
    gates = jnp.asarray(np.array([
        cfg.loop_match_minimum_response_coarse,
        cfg.loop_match_maximum_variance_coarse,
    ], np.float32))
    NC = chain_count_bucket(len(chains))
    Cb = max(chain_bucket(len(c)) for c in chains)
    n_pose = np.zeros((NC, Cb, 3), np.float32)
    n_valid = np.zeros((NC, Cb), bool)
    pooled = pool is not None and _ensure_pooled(
        pool, [sc for c in chains for sc in c]
    )
    for ci, chain in enumerate(chains):
        for i, sc in enumerate(chain):
            n_pose[ci, i] = sc.sensor_pose
            n_valid[ci, i] = True
    if pooled:
        idx = np.zeros((NC, Cb), np.int32)  # slot 0 is the zero row
        for ci, chain in enumerate(chains):
            for i, sc in enumerate(chain):
                idx[ci, i] = sc._pool_slot
        packs = pool.gather(idx)
    else:
        devs = []
        zero = None
        for ci, chain in enumerate(chains):
            for i, sc in enumerate(chain):
                devs.append(_pack_dev(sc))
            if zero is None:
                zero = _zero_pack(loop_matcher, devs[0].shape)
            devs.extend([zero] * (Cb - len(chain)))
        if zero is None:
            zero = jnp.zeros((len(scan.ranges), 8), jnp.float32)
        devs.extend([zero] * ((NC - len(chains)) * Cb))
        packs = jnp.stack(devs).reshape(NC, Cb, *devs[0].shape)
    rows = _loop_verify_jit(
        packs, jnp.asarray(n_pose), jnp.asarray(n_valid),
        local_dev, finite_dev, jnp.asarray(center), gates,
        loop_args=dict(loop_matcher._score_args),
        seq_args=dict(seq_matcher._score_args),
        loop_sigma=np.float32(loop_matcher.sigma_cells),
        seq_sigma=np.float32(seq_matcher.sigma_cells),
        loop_half_span=np.float32(
            0.5 * (loop_matcher.G - 1) * loop_matcher.resolution),
        seq_half_span=np.float32(
            0.5 * (seq_matcher.G - 1) * seq_matcher.resolution),
        loop_G=loop_matcher.G, loop_hk=loop_matcher.half_kernel,
        loop_acc_r=loop_matcher._acc_r,
        loop_parity=loop_matcher.use_pallas,
        loop_na_c=loop_matcher._na_coarse,
        loop_na_f=loop_matcher._na_fine,
        seq_G=seq_matcher.G, seq_hk=seq_matcher.half_kernel,
        seq_acc_r=seq_matcher._acc_r,
        seq_parity=seq_matcher.use_pallas,
        seq_na_c=seq_matcher._na_coarse,
        seq_na_f=seq_matcher._na_fine,
    )
    return rows[:len(chains)]


_ZEROS = {}


def _zero_pack(matcher, shape):
    key = tuple(shape)
    z = _ZEROS.get(key)
    if z is None:
        z = jnp.zeros(shape, jnp.float32)
        _ZEROS[key] = z
    return z
