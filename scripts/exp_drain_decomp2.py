"""Additive decomposition of the drain cycle (TPU, one process).

Four measure passes over the bench workload, all in one process so every
executable is shared:
  A. full pipeline (spec echo + loop closing)       — the bench number
  B. SPECULATE off (near-chain via per-drain fused program)
  C. loop closing off (no verify/solve/settle)
  D. loop closing off + spec off                    — batch program + edges only
plus a micro-timing of the batch program alone (dependent chain, one
fetch — block_until_ready ACKs early on the tunnel, CLAUDE.md).

Run: python scripts/exp_drain_decomp2.py 2>&1 | tee /tmp/decomp2.log
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_STATS", "1")
os.environ.setdefault("BENCH_LAPS", "16")

import numpy as np

from bench import make_workload, run_pass  # noqa: E402


def one(cfg, laser, data, drain, tag, budget=600.0):
    t0 = time.time()
    wall, lat, n, ate, ate_odom, sess = run_pass(
        cfg, laser, data, drain, t0 + budget, tag
    )
    print(f"## {tag}: {n / wall:.1f} scans/s ({n} scans, {wall:.1f}s, "
          f"ATE {ate})", file=sys.stderr, flush=True)
    st = sess.stats
    for k in ("drain_fetch", "commit_bookkeep", "loop_closure_settle",
              "near_chain_match", "loop_verify_wait", "solve"):
        s = st.summary().get(k)
        if s:
            print(f"##   {k}: {s}", file=sys.stderr)
    print(f"##   counts: {dict(st.counts)}", file=sys.stderr, flush=True)
    return sess


def main():
    import jax.numpy as jnp

    from slam_toolbox_tpu.mapper import streaming

    cfg, laser, data = make_workload()
    drain = int(os.environ.get("BENCH_DRAIN", "192"))
    deadline = time.time() + float(os.environ.get("BENCH_BUDGET_S", "1800"))

    run_pass(cfg, laser, data, drain, deadline, "warm")

    sess = one(cfg, laser, data, drain, "A_full")
    streaming.SPECULATE = False
    one(cfg, laser, data, drain, "B_nospec")
    streaming.SPECULATE = True
    cfg_nolc = dataclasses.replace(cfg, do_loop_closing=False)
    one(cfg_nolc, laser, data, drain, "C_noloop")
    streaming.SPECULATE = False
    one(cfg_nolc, laser, data, drain, "D_noloop_nospec")
    streaming.SPECULATE = True

    # micro: batch program alone, 6 dependent runs + one fetch
    pipe = sess._pipe
    state = pipe.state
    N = pipe.drain_every
    packs = jnp.zeros((N, pipe.B, 8), jnp.float32)
    odoms = jnp.tile(jnp.asarray(state["last_odom"][None, :]), (N, 1))
    reps = 6
    t0 = time.time()
    s = state
    for _ in range(reps):
        s = pipe._run_batch(s, packs, odoms, jnp.int32(N))
    np.asarray(s["results"])  # one real fetch
    dt = time.time() - t0
    print(f"## batch program: {dt:.3f}s for {reps}x{N} scans "
          f"= {1e3 * dt / (reps * N):.3f} ms/scan", file=sys.stderr)
    print("{}")


if __name__ == "__main__":
    main()
