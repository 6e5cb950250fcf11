"""Supervisor fault/contention paths of bench.py (VERDICT r4 next #8).

The real measurement child is substituted via BENCH_FAULT_CHILD_CMD with
a trivial script, so the supervisor's retry / best-run-selection logic is
exercised in milliseconds without touching the TPU.
"""
import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_supervisor(tmp_path, child_body, budget="900", extra_env=None):
    child = tmp_path / "fake_child.py"
    child.write_text(textwrap.dedent(child_body))
    env = dict(
        os.environ,
        BENCH_FAULT_CHILD_CMD=f"{shlex_quote(sys.executable)} "
                              f"{shlex_quote(str(child))}",
        BENCH_BUDGET_S=budget,
        BENCH_CONTENTION_BACKOFF_S="0",
    )
    env.pop("BENCH_CHILD", None)
    if extra_env:
        env.update(extra_env)
    out = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True,
        timeout=120, cwd=str(tmp_path),
    )
    lines = [ln for ln in out.stdout.splitlines()
             if ln.strip().startswith("{") and '"metric"' in ln]
    assert lines, f"no metric line:\n{out.stdout}\n{out.stderr}"
    return json.loads(lines[-1]), out


def shlex_quote(s):
    import shlex

    return shlex.quote(s)


def test_contended_run_retries_and_keeps_better():
    """Attempt 1 reports contended=true; the supervisor must back off,
    rerun, and emit the better of the two runs."""
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        tmp = Path(d)
        body = """
        import json, os
        # attempt 1: contended + slower; attempt 2: clean + faster
        a = os.environ.get("BENCH_ATTEMPT", "1")
        if a == "1":
            rec = {"metric": "online_sync_scans_per_sec_1chip",
                   "value": 100.0, "unit": "scans/s", "vs_baseline": 2.0,
                   "source": "two_pass_wall_clock", "ate_m": 0.02,
                   "load_1m": 9.5, "contended": True}
        else:
            rec = {"metric": "online_sync_scans_per_sec_1chip",
                   "value": 250.0, "unit": "scans/s", "vs_baseline": 5.0,
                   "source": "two_pass_wall_clock", "ate_m": 0.02,
                   "load_1m": 1.1, "contended": False}
        print(json.dumps(rec))
        """
        rec, out = _run_supervisor(tmp, body)
    assert rec["value"] == 250.0
    assert rec["contended"] is False
    assert "contended run" in (out.stderr or "")


def test_contended_retry_worse_keeps_first():
    """If the retry lands on an even more contended host, the supervisor
    must keep the better (first) number, not the latest."""
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        tmp = Path(d)
        body = """
        import json, os
        a = os.environ.get("BENCH_ATTEMPT", "1")
        v = 200.0 if a == "1" else 120.0
        rec = {"metric": "online_sync_scans_per_sec_1chip",
               "value": v, "unit": "scans/s", "vs_baseline": v / 50.0,
               "source": "two_pass_wall_clock",
               "load_1m": 9.5, "contended": True}
        print(json.dumps(rec))
        """
        rec, _ = _run_supervisor(tmp, body)
    assert rec["value"] == 200.0


def test_clean_run_no_retry():
    """An uncontended attempt 1 is emitted directly (single child run)."""
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        tmp = Path(d)
        marker = tmp / "runs.txt"
        body = f"""
        import json, os
        with open({str(marker)!r}, "a") as f:
            f.write("x")
        rec = {{"metric": "online_sync_scans_per_sec_1chip",
               "value": 260.0, "unit": "scans/s", "vs_baseline": 5.2,
               "source": "two_pass_wall_clock",
               "load_1m": 1.0, "contended": False}}
        print(json.dumps(rec))
        """
        rec, _ = _run_supervisor(tmp, body)
        assert marker.read_text() == "x"  # exactly one child run
    assert rec["value"] == 260.0


def test_crash_then_recover():
    """Attempt 1 dies without a metric line; attempt 2 succeeds — the
    existing crash-retry path still works with the new selection logic."""
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        tmp = Path(d)
        body = """
        import json, os, sys
        if os.environ.get("BENCH_ATTEMPT", "1") == "1":
            sys.exit(13)
        rec = {"metric": "online_sync_scans_per_sec_1chip",
               "value": 240.0, "unit": "scans/s", "vs_baseline": 4.8,
               "source": "two_pass_wall_clock",
               "load_1m": 1.0, "contended": False}
        print(json.dumps(rec))
        """
        rec, _ = _run_supervisor(tmp, body)
    assert rec["value"] == 240.0


def test_fault_load_injection_marks_contended():
    """BENCH_FAULT_LOAD must flow through _load_1m into the child's
    emitted record (unit-level, no subprocess)."""
    sys.path.insert(0, REPO)
    import importlib

    import bench as bench_mod

    importlib.reload(bench_mod)
    os.environ["BENCH_FAULT_LOAD"] = "7.25"
    try:
        assert bench_mod._load_1m() == 7.25
        assert 7.25 > bench_mod.CONTENTION_LOAD
    finally:
        del os.environ["BENCH_FAULT_LOAD"]
        importlib.reload(bench_mod)
