"""Stall-proofing tests for the bench.py supervisor.

Round 3's headline (2,012 img/s achieved) was lost to the driver because a
tunnel stall hung bench.py until rc=124 (BENCH_r03.json, VERDICT.md round 3
"What's missing" #1). These tests prove the round-4 supervisor design
survives every stall mode: the measurement loop runs in a worker
subprocess, the supervisor enforces deadlines, and a deadline with ANY
completed config still prints a headline JSON line with exit 0.

Stalls are simulated with MSIG_BENCH_FAKE_STALL (worker-side sleeps) and a
shrunken MSIG_BENCH_PROBE_TIMEOUT (supervisor-side probe failure); all runs
use tiny shapes on the CPU platform the conftest pins.
"""

import json
import os
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")

# Tiny workload: 64x64, batch 2, 1 timing iter — compiles in seconds on CPU.
FAST_ARGS = ["--image_size", "64", "--batches", "2", "--iters", "1"]


def run_bench(extra_env, args=FAST_ARGS, timeout=600):
    env = dict(os.environ)
    env.update(extra_env)
    t0 = time.monotonic()
    r = subprocess.run([sys.executable, BENCH, *args], env=env,
                       capture_output=True, text=True, timeout=timeout)
    return r, time.monotonic() - t0


def parse_headline(stdout):
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout from bench: {stdout!r}"
    return json.loads(lines[-1])


@pytest.mark.slow
def test_latency_mode_emits_ms_headline_and_curve():
    """--mode latency: int8-only sweep; headline = ms/img at smallest batch
    + a ms_per_batch curve; survives the same supervisor harness."""
    r, _ = run_bench({}, args=["--mode", "latency", "--image_size", "64",
                               "--batches", "1,2", "--iters", "1"])
    assert r.returncode == 0, r.stderr[-1500:]
    rec = parse_headline(r.stdout)
    assert rec["metric"].startswith("latency_ms_per_img_64px_int8_b1")
    assert rec["unit"] == "ms" and rec["value"] > 0
    assert {str(k) for k in rec["ms_per_batch"]} == {"1", "2"}
    # int8-only sweep: bf16 configs must not appear in stderr
    assert "bf16 batch" not in r.stderr


@pytest.mark.slow
def test_normal_run_emits_headline():
    r, _ = run_bench({})
    assert r.returncode == 0, r.stderr[-2000:]
    rec = parse_headline(r.stdout)
    assert rec["metric"] == "img_per_s_64px_ref_guided_inference"
    assert rec["value"] > 0
    assert rec["unit"] == "img/s/chip"
    assert rec["vs_baseline"] is None  # only the 256px headline is scored


@pytest.mark.slow
def test_stall_after_first_config_still_reports_best_so_far():
    # Worker hangs forever after its first successful config; the
    # supervisor's per-config deadline must fire, kill it, and report the
    # one measurement it has — exit 0, no rc=124.
    r, dt = run_bench({
        "MSIG_BENCH_FAKE_STALL": "after_first",
        "MSIG_BENCH_NEXT_DEADLINE": "10",
    })
    assert r.returncode == 0, r.stderr[-2000:]
    rec = parse_headline(r.stdout)
    assert rec["value"] > 0
    assert "stalled" in r.stderr  # the diagnosis is loud, not silent
    # One config + a 10s deadline; generous bound to absorb CPU compiles.
    assert dt < 400


@pytest.mark.slow
def test_stall_before_any_config_exits_nonzero_with_diagnostic():
    r, _ = run_bench({
        "MSIG_BENCH_FAKE_STALL": "init",
        "MSIG_BENCH_CONFIG_DEADLINE": "8",
        "MSIG_BENCH_DEADLINE": "20",
    })
    assert r.returncode == 1
    assert "no config completed" in r.stderr or "stalled" in r.stderr
    assert not r.stdout.strip()  # no fake headline


def test_unreachable_backend_fails_probe_fast():
    # A probe that can't finish within its timeout (simulating the hung
    # jax.devices() observed live during the round-3 judging) must produce
    # rc=1 with a clear diagnostic — quickly, after exactly one retry.
    r, dt = run_bench({"MSIG_BENCH_PROBE_TIMEOUT": "0.05"})
    assert r.returncode == 1
    assert "backend unreachable" in r.stderr
    assert not r.stdout.strip()
    assert dt < 60


@pytest.mark.slow
def test_external_sigterm_still_reports_best_so_far():
    # The driver wraps bench in `timeout`, which SIGTERMs on expiry. If an
    # external timeout beats our internal deadlines, the handler must still
    # put the best-so-far JSON on stdout (the driver parses output even
    # when rc comes from `timeout`).
    env = dict(os.environ)
    env.update({
        "MSIG_BENCH_FAKE_STALL": "after_first",
        # internal deadlines long, so the external TERM arrives first
        "MSIG_BENCH_NEXT_DEADLINE": "3000",
        "MSIG_BENCH_DEADLINE": "3000",
    })
    proc = subprocess.Popen([sys.executable, BENCH, *FAST_ARGS], env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True)
    # Wait until the first config's result reaches the supervisor, then TERM.
    deadline = time.monotonic() + 500
    import threading
    lines = []
    def drain(s):
        for ln in s:
            lines.append(ln)
    t = threading.Thread(target=drain, args=(proc.stderr,), daemon=True)
    t.start()
    while time.monotonic() < deadline:
        if any("img/s" in ln for ln in lines):
            break
        time.sleep(1)
    time.sleep(3)  # let the result line cross the pipe to the supervisor
    proc.terminate()
    out, _ = proc.communicate(timeout=60)
    assert proc.returncode == 0, f"rc={proc.returncode} stderr={lines[-5:]}"
    rec = parse_headline(out)
    assert rec["value"] > 0


def test_worker_config_order_puts_winning_config_first():
    # int8@128 carried the round-3 headline; it must run first so a stall
    # later in the sweep cannot lose the headline (VERDICT.md next-round #1c).
    sys.path.insert(0, os.path.dirname(BENCH))
    try:
        import bench
        order = bench.inference_configs((128, 256))
    finally:
        sys.path.pop(0)
    assert order[0] == ("int8", 128)
    assert order == [("int8", 128), ("int8", 256), ("bf16", 128), ("bf16", 256)]
