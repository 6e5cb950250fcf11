"""In-context A/B of the streaming batch program's stages, take 2.

Take 1 pitfall: jax.jit keyed all variants to the same underlying
function object, so every "variant" reused the first compiled executable.
Here each variant wraps the traced body in a FRESH function object, so the
monkeypatched globals are actually traced.

Run: python scripts/exp_batch_stages2.py > /tmp/exp_stages2.txt 2>&1
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
from slam_toolbox_tpu.kernels.match import _score_impl

DRAIN = 96


def build_inputs():
    cfg, laser, data = bench.make_workload()
    sess = SlamSession(cfg, laser, streaming=True, drain_every=DRAIN)
    packs, odoms = [], []
    for i, (scan, tp) in enumerate(data):
        out = sess.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
        pipe = sess._pipe
        if pipe is not None and out is not None and len(packs) < DRAIN:
            if pipe.pending:
                packs.append(st.scan_pack(pipe.pending[-1]))
                odoms.append(np.asarray(scan.odom_pose, np.float32))
        if pipe is not None and pipe._dispatched_since_refresh >= DRAIN:
            break
    pipe = sess._pipe
    state = {k: np.asarray(v) for k, v in pipe.state.items()}
    packs = packs[:DRAIN]
    while len(packs) < DRAIN:
        packs.append(packs[-1])
        odoms.append(odoms[-1])
    return pipe, state, np.stack(packs), np.stack(odoms[:DRAIN])


def cached_inputs():
    """Session feed costs minutes of remote compiles; cache the realistic
    state + pack batch to disk so re-runs skip it. The pipeline/matcher
    objects are rebuilt cheaply (no device work until used)."""
    import os
    path = "/tmp/exp_inputs.npz"
    if os.path.exists(path):
        z = np.load(path)
        state = {k[3:]: z[k] for k in z.files if k.startswith("st_")}
        cfg, laser, _ = bench.make_workload()
        sess = SlamSession(cfg, laser, streaming=True, drain_every=DRAIN)
        sess.mapper.initialize(laser.range_threshold)
        from slam_toolbox_tpu.mapper.streaming import StreamingPipeline
        pipe = StreamingPipeline(sess.mapper, laser, drain_every=DRAIN)
        return pipe, state, z["packs"], z["odoms"]
    pipe, state, packs, odoms = build_inputs()
    np.savez(path, packs=packs, odoms=odoms,
             **{"st_" + k: v for k, v in state.items()})
    return pipe, state, packs, odoms


def main():
    pipe, state, packs, odoms = cached_inputs()
    m = pipe.matcher
    sa = dict(pipe._score_args)
    ba = dict(pipe._batch_args)
    bs = dict(pipe._batch_static)
    print("statics:", bs, flush=True)

    state_dev = {k: jnp.asarray(v) for k, v in state.items()}
    packs_dev = jnp.asarray(packs)
    odoms_dev = jnp.asarray(odoms)

    real_raster = st._stream_raster_impl
    real_update = st._stream_update_impl

    def run(tag, raster_fn=None, update_fn=None, statics=None, n=DRAIN,
            reps=4):
        st._stream_raster_impl = raster_fn or real_raster
        st._stream_update_impl = update_fn or real_update
        stat = dict(statics or bs)

        def fresh(s, p, o, nv, score_args, **kw):
            return st._stream_batch_impl(s, p, o, nv,
                                         score_args=score_args, **kw)

        fn = jax.jit(
            fresh,
            static_argnames=("grid_size", "half_kernel", "acc_r", "parity",
                             "na_coarse", "na_fine"),
        )

        def call(s):
            return fn(s, packs_dev[:n], odoms_dev[:n], jnp.int32(n),
                      score_args=sa, **ba, **stat)

        t0 = time.perf_counter()
        out = call(state_dev)
        out["results"].block_until_ready()
        t_compile = time.perf_counter() - t0
        ts = []
        cur = state_dev
        for _ in range(reps):
            t0 = time.perf_counter()
            out = call(cur)
            out["results"].block_until_ready()
            ts.append(time.perf_counter() - t0)
            cur = out
        st._stream_raster_impl = real_raster
        st._stream_update_impl = real_update
        print(f"{tag:28s} best {1e3*min(ts):8.1f} ms "
              f"({1e3*min(ts)/n:6.3f} ms/scan) compile {t_compile:.1f}s  "
              f"all {[round(1e3*x,1) for x in ts]}", flush=True)
        return min(ts)

    # noop body: state passthrough with trivial dependence
    def upd_noop(grid_flat, pgrid, center_off, prior, state, pack, odom,
                 offset_pose, rbs, rmd, score_kwargs):
        new_state = dict(state)
        new_state["last_odom"] = odom
        new_state["n_results"] = state["n_results"] + 1
        return new_state

    def raster_noop(state, odom, offset_pose, scale, sigma_cells,
                    half_span, grid_size, half_kernel, acc_r, parity):
        prior = st._transform_between(
            state["last_odom"], state["last_corrected"], odom)
        center = st._compose(prior, offset_pose)
        off = center[:2] - half_span
        center_off = jnp.concatenate([center, off])
        return None, None, center_off, prior

    run("noop body", raster_fn=raster_noop, update_fn=upd_noop)

    # full, fresh trace (sanity: should match take-1's ~500 ms)
    run("full (fresh)")

    # no smear: half_kernel=0 (everything else identical)
    run("full, no smear", statics=dict(bs, half_kernel=0))

    # no raster: constant zero grids
    from slam_toolbox_tpu.kernels import match_pallas as mp
    hp, wp = mp.parity_dims(m.G, m._acc_r)
    zero_pgrid = jnp.zeros((4, hp, wp), jnp.int8)
    zero_flat = zero_pgrid.reshape(-1)

    def raster_const(state, odom, offset_pose, scale, sigma_cells,
                     half_span, grid_size, half_kernel, acc_r, parity):
        prior = st._transform_between(
            state["last_odom"], state["last_corrected"], odom)
        center = st._compose(prior, offset_pose)
        off = center[:2] - half_span
        center_off = jnp.concatenate([center, off])
        eps = (jnp.sum(state["ring_pose"]) * 1e-12).astype(jnp.int8)
        return zero_flat + eps, zero_pgrid + eps, center_off, prior

    run("score+state (no raster)", raster_fn=raster_const)

    # no score
    def upd_noscore(grid_flat, pgrid, center_off, prior, state, pack, odom,
                    offset_pose, rbs, rmd, score_kwargs):
        def fake_score(grid_flat, pgrid, center_off, local_pts, finite,
                       **kw):
            v = grid_flat[0].astype(jnp.float32) * 1e-9
            return jnp.concatenate([
                jnp.ones((1,), jnp.float32) * 0.5 + v,
                center_off[:3],
                jnp.eye(3, dtype=jnp.float32).reshape(-1),
            ])
        orig = st.__dict__["_score_impl"]
        st.__dict__["_score_impl"] = fake_score
        try:
            return real_update(grid_flat, pgrid, center_off, prior, state,
                               pack, odom, offset_pose, rbs, rmd,
                               score_kwargs)
        finally:
            st.__dict__["_score_impl"] = orig

    run("raster+state (no score)", update_fn=upd_noscore)

    # scaling check: full at N=32
    run("full at N=32", n=32)


if __name__ == "__main__":
    main()
