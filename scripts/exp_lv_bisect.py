"""Bisect the loop-verify device-time blowup: coarse half vs fine half.

Run: python scripts/exp_lv_bisect.py > /tmp/exp_lvb.txt 2>&1
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from slam_toolbox_tpu.core.scan import LocalizedScan
from slam_toolbox_tpu.core.params import MapperConfig  # noqa
from slam_toolbox_tpu.mapper import Mapper
from slam_toolbox_tpu.kernels import loop_verify as lv
from slam_toolbox_tpu.kernels.match import _score_impl, _raster_quant_impl


def main():
    cfg, laser, data = bench.make_workload()
    mapper = Mapper(cfg)
    mapper.initialize(laser.range_threshold)
    seq, loop = mapper.sequential_matcher, mapper.loop_matcher

    scans = []
    for i, (scan, tp) in enumerate(data[:160]):
        s = LocalizedScan(laser, scan.ranges, scan.odom_pose, time=i * 0.1)
        s.unique_id = i
        s.state_id = i
        scans.append(s)
    chain = scans[:43]
    query = scans[120]

    real_impl = lv._loop_verify_impl

    def variant(name):
        """Wrap _loop_verify_impl replacements."""
        def coarse_only(packs, poses, cvalid, scan_local, scan_finite,
                        center, gates, loop_args, seq_args,
                        loop_sigma, seq_sigma, loop_half_span,
                        seq_half_span,
                        loop_G, loop_hk, loop_acc_r, loop_parity,
                        loop_na_c, loop_na_f,
                        seq_G, seq_hk, seq_acc_r, seq_parity,
                        seq_na_c, seq_na_f):
            off_l = center[:2] - loop_half_span
            grid_l, pgrid_l = lv._chain_raster(
                packs, poses, cvalid, center[:2], off_l,
                loop_args["scale"], loop_sigma, loop_G, loop_hk,
                loop_acc_r, loop_parity)
            packed_c = _score_impl(
                grid_l, pgrid_l, jnp.concatenate([center, off_l]),
                scan_local, scan_finite, penalize=jnp.bool_(False),
                grid_size=loop_G, na_coarse=loop_na_c, na_fine=loop_na_f,
                acc_r=loop_acc_r, refine=False, **loop_args)
            gate = ((packed_c[0] > gates[0])
                    & (packed_c[4] < gates[1]) & (packed_c[8] < gates[1]))
            return jnp.concatenate(
                [packed_c, packed_c, gate.astype(jnp.float32)[None]])

        def fine_only(packs, poses, cvalid, scan_local, scan_finite,
                      center, gates, loop_args, seq_args,
                      loop_sigma, seq_sigma, loop_half_span, seq_half_span,
                      loop_G, loop_hk, loop_acc_r, loop_parity,
                      loop_na_c, loop_na_f,
                      seq_G, seq_hk, seq_acc_r, seq_parity,
                      seq_na_c, seq_na_f):
            center2 = center + 0.01  # fake coarse result, data-dependent
            off_s = center2[:2] - seq_half_span
            grid_s, pgrid_s = lv._chain_raster(
                packs, poses, cvalid, center2[:2], off_s,
                seq_args["scale"], seq_sigma, seq_G, seq_hk, seq_acc_r,
                seq_parity)
            packed_f = _score_impl(
                grid_s, pgrid_s, jnp.concatenate([center2, off_s]),
                scan_local, scan_finite, penalize=jnp.bool_(False),
                grid_size=seq_G, na_coarse=seq_na_c, na_fine=seq_na_f,
                acc_r=seq_acc_r, refine=True, **seq_args)
            gate = packed_f[0] > gates[0]
            return jnp.concatenate(
                [packed_f, packed_f, gate.astype(jnp.float32)[None]])

        def fine_norefine(*a, **kw):
            # fine raster + seq-geometry score but refine=False
            (packs, poses, cvalid, scan_local, scan_finite, center,
             gates) = a
            seq_args = kw["seq_args"]
            seq_sigma = kw["seq_sigma"]
            seq_half_span = kw["seq_half_span"]
            center2 = center + 0.01
            off_s = center2[:2] - seq_half_span
            grid_s, pgrid_s = lv._chain_raster(
                packs, poses, cvalid, center2[:2], off_s,
                seq_args["scale"], seq_sigma, kw["seq_G"], kw["seq_hk"],
                kw["seq_acc_r"], kw["seq_parity"])
            packed_f = _score_impl(
                grid_s, pgrid_s, jnp.concatenate([center2, off_s]),
                scan_local, scan_finite, penalize=jnp.bool_(False),
                grid_size=kw["seq_G"], na_coarse=kw["seq_na_c"],
                na_fine=kw["seq_na_f"], acc_r=kw["seq_acc_r"],
                refine=False, **seq_args)
            gate = packed_f[0] > gates[0]
            return jnp.concatenate(
                [packed_f, packed_f, gate.astype(jnp.float32)[None]])

        return {"coarse only": coarse_only, "fine only": fine_only,
                "fine only norefine": fine_norefine}[name]

    def run(tag, impl, reps=6):
        fn = jax.jit(
            impl,
            static_argnames=(
                "loop_G", "loop_hk", "loop_acc_r", "loop_parity",
                "loop_na_c", "loop_na_f",
                "seq_G", "seq_hk", "seq_acc_r", "seq_parity",
                "seq_na_c", "seq_na_f",
            ),
        )
        orig = lv._loop_verify_jit
        lv._loop_verify_jit = fn
        packs = lv.dispatch_loop_verify(loop, seq, query, [chain], cfg)
        np.asarray(jnp.stack(packs))
        t0 = time.perf_counter()
        allp = []
        for r in range(reps):
            allp += lv.dispatch_loop_verify(loop, seq, query, [chain], cfg)
        np.asarray(jnp.stack(allp))
        dt = (time.perf_counter() - t0) / reps
        lv._loop_verify_jit = orig
        print(f"lv/{tag:22s} amort {1e3*dt:7.1f} ms over {reps}",
              flush=True)

    run("full", real_impl)
    run("coarse only", variant("coarse only"))
    run("fine only", variant("fine only"))
    run("fine only norefine", variant("fine only norefine"))


if __name__ == "__main__":
    main()
