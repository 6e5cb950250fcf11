"""Decompose the streaming drain_fetch floor (TPU, one process).

Runs the bench workload twice (warm + measure, same process so every
executable is reused), then micro-times the batch program alone with
dependent back-to-back dispatches and ONE final fetch (per CLAUDE.md:
block_until_ready can ACK early; only amortized dependent-chain timing
with a real fetch is honest). The difference between the measured
drain_fetch and the batch program's own time is the speculative
near-chain echo + fetch overhead riding the same wait.

Run: python scripts/exp_drain_decomp.py  (TPU; ~8 min)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_STATS", "1")
os.environ.setdefault("BENCH_LAPS", "16")

import numpy as np

from bench import make_workload, run_pass  # noqa: E402


def main():
    import jax.numpy as jnp

    cfg, laser, data = make_workload()
    drain = int(os.environ.get("BENCH_DRAIN", "192"))
    deadline = time.time() + float(os.environ.get("BENCH_BUDGET_S", "900"))

    run_pass(cfg, laser, data, drain, deadline, "warm")
    wall, lat, n, ate, ate_odom, sess = run_pass(
        cfg, laser, data, drain, deadline, "measure"
    )
    print(f"# measure: {n / wall:.1f} scans/s", file=sys.stderr)
    st = sess.stats
    for k in ("drain_fetch", "loop_closure_settle", "near_chain_match"):
        s = st.summary().get(k)
        if s:
            print(f"# {k}: {s}", file=sys.stderr)
    print(f"# counts: {dict(st.counts)}", file=sys.stderr)

    # micro: batch program alone, 6 dependent runs + one fetch
    pipe = sess._pipe
    state = pipe.state
    N = pipe.drain_every
    packs = jnp.zeros((N, pipe.B, 8), jnp.float32)
    # reuse the LAST real batch's packs if available (pool tail)
    odoms = jnp.tile(jnp.asarray(
        state["last_odom"][None, :]), (N, 1))
    reps = 6
    t0 = time.time()
    s = state
    for _ in range(reps):
        s = pipe._run_batch(s, packs, odoms, jnp.int32(N))
    np.asarray(s["results"])  # one real fetch
    dt = time.time() - t0
    per_scan_ms = 1e3 * dt / (reps * N)
    print(f"# batch program: {dt:.3f}s for {reps}x{N} scans "
          f"= {per_scan_ms:.3f} ms/scan", file=sys.stderr)
    df = st.summary().get("drain_fetch", {})
    if df:
        echo_ms = df["mean_ms"] - per_scan_ms * N
        print(f"# drain_fetch mean {df['mean_ms']:.1f} ms "
              f"- batch {per_scan_ms * N:.1f} ms "
              f"=> echo+overhead ~{echo_ms:.1f} ms/drain",
              file=sys.stderr)
    print("{}")


if __name__ == "__main__":
    main()
