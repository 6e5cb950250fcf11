"""In-context A/B of the streaming batch program's stages.

Builds a realistic device state + pack batch from the bench workload, then
compiles VARIANTS of _stream_batch_impl with stages stubbed out (raster /
score / fine pass / state update) and times each over the same 96-scan
batch in ONE process — standalone kernel timings and in-program timings
disagree (XLA fuses differently in context), so this is the only
trustworthy comparison.

Run: python scripts/exp_batch_stages.py > /tmp/exp_stages.txt 2>&1
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from slam_toolbox_tpu.api import SlamSession
from slam_toolbox_tpu.mapper import streaming as st
from slam_toolbox_tpu.kernels.match import _score_impl, _raster_quant_impl

DRAIN = 96


def build_inputs():
    cfg, laser, data = bench.make_workload()
    sess = SlamSession(cfg, laser, streaming=True, drain_every=DRAIN)
    # feed enough scans to populate the ring + capture a full batch of packs
    packs, odoms = [], []
    for i, (scan, tp) in enumerate(data):
        out = sess.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        pipe = sess._pipe
        if pipe is not None and out is not None and len(packs) < DRAIN:
            packs.append(st.scan_pack(pipe.pending[-1])
                         if pipe.pending else None)
            odoms.append(np.asarray(scan.odom_pose, np.float32))
        if pipe is not None and pipe._dispatched_since_refresh >= DRAIN:
            break
    pipe = sess._pipe
    state = {k: np.asarray(v) for k, v in pipe.state.items()}
    packs = [p for p in packs if p is not None][:DRAIN]
    while len(packs) < DRAIN:
        packs.append(packs[-1])
        odoms.append(odoms[-1])
    packs = np.stack(packs)
    odoms = np.stack(odoms[:DRAIN])
    return pipe, state, packs, odoms


def timed(fn, state_dev, packs_dev, odoms_dev, n, reps=4):
    # warm/compile
    out = fn(state_dev, packs_dev, odoms_dev, n)
    out["results"].block_until_ready()
    ts = []
    cur = state_dev
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(cur, packs_dev, odoms_dev, n)
        out["results"].block_until_ready()
        ts.append(time.perf_counter() - t0)
        cur = out  # vary the carry so nothing is hoisted
    return min(ts), ts


def main():
    pipe, state, packs, odoms = build_inputs()
    print("state ring:", state["ring_local"].shape, flush=True)
    m = pipe.matcher
    sa = dict(pipe._score_args)
    ba = dict(pipe._batch_args)
    bs = dict(pipe._batch_static)

    state_dev = {k: jnp.asarray(v) for k, v in state.items()}
    packs_dev = jnp.asarray(packs)
    odoms_dev = jnp.asarray(odoms)
    n = jnp.int32(DRAIN)

    real_raster = st._stream_raster_impl
    real_update = st._stream_update_impl

    def make(tag, raster_fn=None, update_fn=None):
        st._stream_raster_impl = raster_fn or real_raster
        st._stream_update_impl = update_fn or real_update
        fn = jax.jit(
            st._stream_batch_impl,
            static_argnames=("grid_size", "half_kernel", "acc_r", "parity",
                             "na_coarse", "na_fine"),
        )

        def call(s, p, o, nv):
            return fn(s, p, o, nv, score_args=sa, **ba, **bs)

        t, ts = timed(call, state_dev, packs_dev, odoms_dev, n)
        print(f"{tag:24s} best {1e3*t:8.1f} ms "
              f"({1e3*t/DRAIN:6.3f} ms/scan)  all "
              f"{[round(1e3*x,1) for x in ts]}", flush=True)
        st._stream_raster_impl = real_raster
        st._stream_update_impl = real_update
        return t

    # 1. full program
    make("full")

    # 2. no score: update uses a fake packed result (raster + state only)
    def upd_noscore(grid_flat, pgrid, center_off, prior, state, pack, odom,
                    offset_pose, rbs, rmd, score_kwargs):
        def fake_score(grid_flat, pgrid, center_off, local_pts, finite,
                       **kw):
            # consume the raster so it isn't DCE'd
            v = grid_flat[0].astype(jnp.float32) * 1e-9
            return jnp.concatenate([
                jnp.ones((1,), jnp.float32) * 0.5 + v,
                center_off[:3],
                jnp.eye(3, dtype=jnp.float32).reshape(-1),
            ])
        import slam_toolbox_tpu.mapper.streaming as stm
        orig = stm.__dict__["_score_impl"]
        stm.__dict__["_score_impl"] = fake_score
        try:
            return real_update(grid_flat, pgrid, center_off, prior, state,
                               pack, odom, offset_pose, rbs, rmd,
                               score_kwargs)
        finally:
            stm.__dict__["_score_impl"] = orig
    make("raster+state (no score)", update_fn=upd_noscore)

    # 3. no raster: constant zero grid (score + state only)
    from slam_toolbox_tpu.kernels import match_pallas as mp
    hp, wp = mp.parity_dims(m.G, m._acc_r)
    if m.use_pallas:
        zero_pgrid = jnp.zeros((4, hp, wp), jnp.int8)
        zero_flat = zero_pgrid.reshape(-1)
    else:
        zero_flat = jnp.zeros((m.G * m.G + 1,), jnp.int8)
        zero_pgrid = None

    def raster_const(state, odom, offset_pose, scale, sigma_cells,
                     half_span, grid_size, half_kernel, acc_r, parity):
        prior = st._transform_between(
            state["last_odom"], state["last_corrected"], odom)
        center = st._compose(prior, offset_pose)
        off = center[:2] - half_span
        center_off = jnp.concatenate([center, off])
        # consume ring state so carry deps stay realistic
        eps = jnp.sum(state["ring_pose"]) * 1e-12
        return (zero_flat, zero_pgrid,
                center_off + eps.astype(jnp.float32), prior)
    make("score+state (no raster)", raster_fn=raster_const)

    # 4. coarse only (refine=False) — measures the fine+angular share
    def upd_nofine(grid_flat, pgrid, center_off, prior, state, pack, odom,
                   offset_pose, rbs, rmd, score_kwargs):
        kw = dict(score_kwargs, refine=False)
        return real_update(grid_flat, pgrid, center_off, prior, state,
                           pack, odom, offset_pose, rbs, rmd, kw)
    make("no fine pass", update_fn=upd_nofine)

    # 5. no state update: score result discarded into results only
    def upd_nostate(grid_flat, pgrid, center_off, prior, state, pack, odom,
                    offset_pose, rbs, rmd, score_kwargs):
        local_pts, anchor, current, nxt, finite, dvalid = st._unpack_scan(
            pack)
        packed = _score_impl(grid_flat, pgrid, center_off, local_pts,
                             finite, **score_kwargs)
        new_state = dict(state)
        ridx = state["n_results"] % st.RESULT_CAP
        out13 = packed
        new_state["results"] = state["results"].at[ridx].set(out13)
        new_state["n_results"] = state["n_results"] + 1
        new_state["last_odom"] = odom
        new_state["last_corrected"] = packed[1:4]
        return new_state
    make("no ring update", update_fn=upd_nostate)


if __name__ == "__main__":
    main()
