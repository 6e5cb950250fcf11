"""Pipelined vs settle-first-serial drains under closure-heavy load (TPU).

Hypothesis (from BENCH_STATS r2): with 16 laps over one apartment, a loop
closure fires on EVERY drain; each closure forces refresh_state + re-run
of both in-flight batches, so the pipelined path executes the batch
program ~3x per drain (drain_fetch ~1010 ms vs ~450 ms of batch device
time). The serial path settles the deferred closure BEFORE dispatching,
so every batch runs exactly once from post-closure state.

One process, executables shared: warm, then measure passes
  P1 pipelined (the current default)
  S1 serial (SLAM_STREAM_PIPELINE=0 equivalent)
  S2 serial again (drift check)
  P2 pipelined again (drift bracket)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_STATS", "1")
os.environ.setdefault("BENCH_LAPS", "16")

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
    from slam_toolbox_tpu.mapper import streaming

    cfg, laser, data = make_workload()
    drain = int(os.environ.get("BENCH_DRAIN", "192"))
    deadline = time.time() + float(os.environ.get("BENCH_BUDGET_S", "1800"))

    run_pass(cfg, laser, data, drain, deadline, "warm")
    # serial/adaptive share every executable (control flow is host-side)

    streaming.ADAPTIVE = False
    one(cfg, laser, data, drain, "P1_pipelined")
    streaming.PIPELINED = False
    one(cfg, laser, data, drain, "S1_serial")
    streaming.PIPELINED = True
    streaming.ADAPTIVE = True
    one(cfg, laser, data, drain, "A1_adaptive")
    streaming.PIPELINED = False
    one(cfg, laser, data, drain, "S2_serial")
    streaming.PIPELINED = True
    streaming.ADAPTIVE = False
    one(cfg, laser, data, drain, "P2_pipelined")
    streaming.ADAPTIVE = True
    one(cfg, laser, data, drain, "A2_adaptive")
    print("{}")


if __name__ == "__main__":
    main()
