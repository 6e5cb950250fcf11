"""Post-smear decomposition: (a) score-path stages inside the streaming
batch program, (b) loop-verify program internals.

Run: python scripts/exp_score_lv_stages.py > /tmp/exp_slv.txt 2>&1
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

from exp_batch_stages2 import cached_inputs, DRAIN  # noqa: E402
from slam_toolbox_tpu.mapper import streaming as st  # noqa: E402
from slam_toolbox_tpu.kernels import match_pallas as mp  # noqa: E402
from slam_toolbox_tpu.kernels import match as mk  # noqa: E402


def batch_variants():
    pipe, state, packs, odoms = cached_inputs()
    sa = dict(pipe._score_args)
    ba = dict(pipe._batch_args)
    bs = dict(pipe._batch_static)
    state_dev = {k: jnp.asarray(v) for k, v in state.items()}
    packs_dev = jnp.asarray(packs)
    odoms_dev = jnp.asarray(odoms)
    real_update = st._stream_update_impl

    def run(tag, update_fn=None, patch=None, reps=4):
        st._stream_update_impl = update_fn or real_update
        saved = {}
        if patch:
            for mod, name, fn in patch:
                saved[(id(mod), name)] = (mod, name, mod.__dict__[name])
                mod.__dict__[name] = fn

        def fresh(s, p, o, nv, score_args, **kw):
            return st._stream_batch_impl(s, p, o, nv,
                                         score_args=score_args, **kw)

        fn = jax.jit(
            fresh,
            static_argnames=("grid_size", "half_kernel", "acc_r",
                             "parity", "na_coarse", "na_fine"),
        )

        def call(s):
            return fn(s, packs_dev, odoms_dev, jnp.int32(DRAIN),
                      score_args=sa, **ba, **bs)

        out = call(state_dev)
        out["results"].block_until_ready()
        np.asarray(out["results"])  # real sync: block alone acks early
        t0 = time.perf_counter()
        cur = state_dev
        for _ in range(reps):
            cur = call(cur)
        np.asarray(cur["results"])  # one final fetch syncs the chain
        dt = (time.perf_counter() - t0) / reps
        st._stream_update_impl = real_update
        for mod, name, orig in saved.values():
            mod.__dict__[name] = orig
        print(f"batch/{tag:22s} amort {1e3*dt:7.1f} ms "
              f"({1e3*dt/DRAIN:6.3f} ms/scan) over {reps}", flush=True)

    run("full")

    def upd_nofine(grid_flat, pgrid, center_off, prior, state, pack, odom,
                   offset_pose, rbs, rmd, score_kwargs):
        return real_update(grid_flat, pgrid, center_off, prior, state,
                           pack, odom, offset_pose, rbs, rmd,
                           dict(score_kwargs, refine=False))
    run("no fine pass", update_fn=upd_nofine)

    def fake_windows(pgrid, tbl, acc_r=32, interpret=False):
        # consume inputs cheaply; same output shape as score_windows
        na = tbl.shape[0]
        v = (pgrid[0, 0, 0].astype(jnp.int32)
             + tbl[0, 0, 0]) * 0
        return jnp.zeros((na, acc_r, 128), jnp.int32) + v
    run("no coarse kernel", patch=[(mp, "score_windows", fake_windows)])

    def fake_hrow3(pgrid):
        return jnp.zeros((4,) + pgrid.shape[1:], jnp.int32)
    run("no hrow3 build", patch=[(mk, "_build_hrow3", fake_hrow3)])
    return pipe


def lv_variants(pipe):
    import bench
    from slam_toolbox_tpu.core.scan import LocalizedScan
    from slam_toolbox_tpu.kernels import loop_verify as lv

    cfg, laser, data = bench.make_workload()
    mapper = pipe.mapper
    seq, loop = mapper.sequential_matcher, mapper.loop_matcher

    scans = []
    for i, (scan, tp) in enumerate(data[:160]):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        s.unique_id = i
        s.state_id = i
        scans.append(s)
    chain = scans[:43]
    query = scans[120]

    real_raster = lv._chain_raster
    real_score = lv.__dict__["_score_impl"]

    def run(tag, patch=None, reps=6):
        saved = {}
        if patch:
            for name, fn in patch:
                saved[name] = lv.__dict__[name]
                lv.__dict__[name] = fn
        # fresh jit per variant
        fn = jax.jit(
            lv._loop_verify_impl,
            static_argnames=(
                "loop_G", "loop_hk", "loop_acc_r", "loop_parity",
                "loop_na_c", "loop_na_f",
                "seq_G", "seq_hk", "seq_acc_r", "seq_parity",
                "seq_na_c", "seq_na_f",
            ),
        )
        orig_jit = lv._loop_verify_jit
        lv._loop_verify_jit = fn
        packs = lv.dispatch_loop_verify(loop, seq, query, [chain], cfg)
        np.asarray(jnp.stack(packs))  # compile + real sync
        t0 = time.perf_counter()
        allp = []
        for r in range(reps):
            allp += lv.dispatch_loop_verify(loop, seq, query, [chain], cfg)
        np.asarray(jnp.stack(allp))
        dt = (time.perf_counter() - t0) / reps
        lv._loop_verify_jit = orig_jit
        for name, orig in saved.items():
            lv.__dict__[name] = orig
        print(f"lv/{tag:25s} amort {1e3*dt:7.1f} ms over {reps}",
              flush=True)

    run("full")

    def raster_zero(packs, poses, cvalid, viewpoint_xy, offset, scale,
                    sigma_cells, grid_size, half_kernel, acc_r, parity):
        from slam_toolbox_tpu.kernels import match_pallas as mpp
        hp, wp = mpp.parity_dims(grid_size, acc_r)
        eps = (jnp.sum(poses) * 0).astype(jnp.int8)
        pg = jnp.zeros((4, hp, wp), jnp.int8) + eps
        return pg.reshape(-1), pg
    run("no rasters", patch=[("_chain_raster", raster_zero)])

    def score_fake(grid_flat, pgrid, center_off, local_pts, finite, **kw):
        v = grid_flat[0].astype(jnp.float32) * 1e-9
        return jnp.concatenate([
            jnp.full((1,), 0.9, jnp.float32) + v, center_off[:3],
            (jnp.eye(3, dtype=jnp.float32) * 0.01).reshape(-1),
        ])
    run("no scores", patch=[("_score_impl", score_fake)])
    run("no rasters+scores", patch=[
        ("_chain_raster", raster_zero), ("_score_impl", score_fake)])


if __name__ == "__main__":
    pipe = batch_variants()
    lv_variants(pipe)
