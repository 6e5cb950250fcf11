"""Roofline measurement for the two flagship Pallas kernels
(VERDICT r4 next #7): the coarse window-score kernel and the banded
smear+quantize kernel, at the exact bench geometry (G=2051, na=21,
B=1088, acc_r=32, half_kernel=20). Results recorded in PARITY.md
§Kernel roofline.

Method notes (hard-won, round 5):
  - NEVER vary the SMEM descriptor table inside the measured scan: a
    jnp.roll of the (na,4,B) table inside the program lowers to
    scalarized SMEM writes (~20 ms/iter, 6x the kernel itself). Vary
    the VMEM grid operand instead (g ^ 1 per iteration).
  - pallas_call fixed launch overhead is ~0.3-0.5 ms on the tunnel
    chip: single-block microkernels must amortize with an internal
    REP loop or a grid, or the launch swamps the op under test.
  - XLA does NOT fuse long elementwise chains on this backend (each
    op streams HBM at ~0.9 ms/64 MB), so "XLA elementwise rate" is an
    HBM measurement, not a VPU one. The smear kernel's own in-VMEM
    tap rate (0.19 f32 Top/s) is the fastest f32 elementwise rate
    measured on this chip by any harness.

Run on the TPU: python scripts/exp_roofline.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_toolbox_tpu.kernels import match_pallas as mp

G, NA, B, ACC_R, HK, ITERS = 2051, 21, 1088, 32, 20, 16


def time_scan(run, *args, n=ITERS, tag=""):
    o = run(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = run(*args)
    jax.block_until_ready(o)
    np.asarray(o)
    t = (time.perf_counter() - t0) / n
    print(f"{tag}: {t*1e3:.3f} ms/iter", flush=True)
    return t


def main():
    hp, wp = mp.parity_dims(G, ACC_R)
    read_r = ACC_R + mp.N_PHASE
    rng = np.random.default_rng(0)
    pgrid = jnp.asarray(
        rng.integers(0, 100, (4, hp, wp), dtype=np.int8)
    )

    # coherent tables via the real prepare_tables (a lidar-like sweep)
    d = np.zeros((NA, B, 2), np.int32)
    ang = np.linspace(-0.35, 0.35, NA)
    rr = rng.uniform(0.5, 10.0, B)
    th = np.linspace(-np.pi, np.pi, B)
    for ai, a in enumerate(ang):
        d[ai, :, 0] = np.round(rr * np.cos(th + a) * 100)
        d[ai, :, 1] = np.round(rr * np.sin(th + a) * 100)
    tbl = jnp.asarray(np.asarray(mp.prepare_tables(
        jnp.asarray(d), 1000, 1000, jnp.ones(B, bool), G, ACC_R
    )))

    @jax.jit
    def run_score(pgrid, tbl):
        def body(carry, _):
            g = carry ^ 1
            return g, mp.score_windows(g, tbl, acc_r=ACC_R).sum()
        _, s = jax.lax.scan(body, pgrid, None, length=ITERS)
        return s.sum()

    t_s = time_scan(run_score, pgrid, tbl,
                    tag="score_windows (coherent tbl, grid-varied)")
    beams = NA * B
    print(f"  {t_s/beams*1e9:.0f} ns/beam, "
          f"{beams/t_s/1e6:.2f} M window-reads/s, "
          f"VMEM {beams*read_r*mp.READ_C/t_s/1e9:.0f} GB/s")

    # ceiling: identical per-beam data path, compile-time offsets, no
    # SMEM descriptor loads, no alignment arithmetic
    offs = [(int(rng.integers(0, 4)),
             int(rng.integers(0, (hp - read_r) // 32)) * 32,
             int(rng.integers(0, (wp - mp.READ_C) // 128)) * 128,
             int(rng.integers(0, mp.N_PHASE)),
             int(rng.integers(0, 128)))
            for _ in range(mp.BEAM_UNROLL)]

    def mk_ceil():
        def kern(pgrid_ref, out_ref, acc_ref):
            acc_ref[...] = jnp.zeros(
                (mp.N_PHASE, read_r, mp.ACC_C), jnp.int32
            )

            def body(i, _):
                for k in range(mp.BEAM_UNROLL):
                    p, ra, ca, phi, phic = offs[k]
                    w8 = pgrid_ref[p, pl.ds(ra, read_r),
                                   pl.ds(ca, mp.READ_C)]
                    w32 = pltpu.bitcast(w8, jnp.int32)
                    w32 = pltpu.roll(
                        w32, (mp.READ_C - phic) % mp.READ_C, axis=1
                    )
                    w = pltpu.bitcast(w32, jnp.int8)[
                        :, :mp.ACC_C].astype(jnp.int32)
                    acc_ref[pl.ds(phi, 1)] += w[None]
                return 0

            jax.lax.fori_loop(0, beams // mp.BEAM_UNROLL, body, 0)
            out = jnp.zeros((ACC_R, mp.ACC_C), jnp.int32)
            for phi in range(mp.N_PHASE):
                out = out + acc_ref[phi, phi:phi + ACC_R, :]
            out_ref[0] = out

        return kern

    call = pl.pallas_call(
        mk_ceil(), grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, ACC_R, mp.ACC_C), lambda a: (a, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((1, ACC_R, mp.ACC_C), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((mp.N_PHASE, read_r, mp.ACC_C), jnp.int32)
        ],
    )

    @jax.jit
    def run_ceil(pgrid):
        def body(carry, _):
            g = carry ^ 1
            return g, call(g).sum()
        _, s = jax.lax.scan(body, pgrid, None, length=ITERS)
        return s.sum()

    t_c = time_scan(run_ceil, pgrid,
                    tag="score CEILING (static offsets)")
    print(f"  {t_c/beams*1e9:.0f} ns/beam ceiling -> kernel at "
          f"{t_c/t_s*100:.0f}% of ceiling")

    # smear at bench geometry
    bits = jnp.asarray(
        rng.integers(0, 2**30, (4, hp, 128), dtype=np.int32)
    )

    @jax.jit
    def run_smear(bits):
        def body(carry, _):
            b = carry ^ 1
            out = mp.smear_quantize_parity(
                b, jnp.float32(10.0), G, HK, ACC_R
            )
            return b, out.astype(jnp.int32).sum()
        _, s = jax.lax.scan(body, bits, None, length=ITERS)
        return s.sum()

    t_m = time_scan(run_smear, bits, tag="smear_quantize_parity")
    gh = (G + 1) // 2
    NL = (gh + 127) // 128
    WU = 128 * NL + 256
    WCORE = 128 * NL
    n_bands = hp // 32
    ops = (4 * n_bands * 32 * (WU + WCORE)) * (3 * HK + 1)
    print(f"  {ops/1e9:.2f} G f32 tap-ops -> {ops/t_m/1e12:.2f} Top/s "
          f"(~{ops/t_m/1e12/0.98*100:.0f}% of the 8x128-lane @ ~1 GHz "
          f"nominal VPU peak)")

    # HBM stream bound
    x = jnp.zeros(2**30, jnp.int8)

    @jax.jit
    def run_hbm(x):
        def body(carry, _):
            y = carry + 1
            return y, y[0].astype(jnp.int32)
        y, _ = jax.lax.scan(body, x, None, length=4)
        return y[0]

    o = run_hbm(x)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = run_hbm(x)
    jax.block_until_ready(o)
    np.asarray(o)
    t = (time.perf_counter() - t0) / 4
    print(f"HBM stream (1 GB int8 add): {t*1e3:.2f} ms/pass -> "
          f"{2*x.size/t/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
