"""bench.py must be outage-proof (VERDICT r3 item 2).

BENCH_r03.json was lost because the axon tunnel was down at capture time
and bench.py crashed during backend init, before printing anything.  The
contract under test: with the accelerator backend unavailable, bench.py
still prints EXACTLY one parseable JSON line (headline metric null, an
"error" field) and exits nonzero.

The failure is simulated by pointing JAX_PLATFORMS at a platform that
does not exist in a fresh subprocess — the same failure shape as the
axon plugin failing to reach the TPU (jax.devices() raises at init).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(*argv):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "nonexistent_backend"
    # The axon sitecustomize (gated on PALLAS_AXON_POOL_IPS) latches the
    # platform at interpreter start, overriding JAX_PLATFORMS — with the
    # tunnel UP the "unavailable backend" subprocess would happily run
    # the real bench on the TPU for 300 s (observed 2026-08-19).
    # Clearing the gate makes the env override effective again.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["BENCH_INIT_RETRIES"] = "2"   # exercise the retry loop, fast
    env["BENCH_INIT_WAIT"] = "0"
    # with an unreachable backend jax.devices() HANGS rather than
    # raising (the real tunnel-down failure shape) — the probe's hard
    # subprocess timeout is what bounds it
    env["BENCH_INIT_TIMEOUT"] = "20"
    return subprocess.run(
        [sys.executable, BENCH] + list(argv),
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)


def test_bench_emits_json_line_when_backend_unavailable():
    p = _run_bench()
    assert p.returncode == 1, p.stderr[-2000:]
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, p.stdout
    rec = json.loads(lines[0])
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    assert rec["parity_ok"] is False
    assert "error" in rec and rec["error"]
    assert rec["metric"].startswith("BF(CNN,CNN)")
    # the bounded retry ran (both attempts logged to stderr)
    assert "attempt 1/2" in p.stderr and "attempt 2/2" in p.stderr


def test_gate_emits_json_line_when_backend_unavailable():
    p = _run_bench("--gate")
    assert p.returncode == 1, p.stderr[-2000:]
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, p.stdout
    rec = json.loads(lines[0])
    assert rec["parity_ok"] is False
    assert "error" in rec["parity_max_diffs"]


def test_emit_once_single_writer(capsys):
    """The exactly-one-JSON-line guard: Timer.cancel() cannot stop a
    watchdog _fire that already started, so the emit is serialized
    through an atomic test-and-set — the first caller prints, every
    later caller (from any thread) is a no-op."""
    import threading
    import importlib.util
    # fresh module instance: the shared _EMIT_LOCK must start unheld
    spec = importlib.util.spec_from_file_location("bench_emit_test", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    results = []
    barrier = threading.Barrier(8)

    def worker(i):
        barrier.wait()
        results.append(bench._emit_once({"winner": i}))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(out) == 1, out
    assert sum(results) == 1
    json.loads(out[0])


def test_watchdog_emits_json_line_when_bench_hangs():
    """A tunnel that degrades MID-RUN leaves ops hung inside the PJRT C
    dispatch, unreachable by exceptions or SIGALRM — the daemon-thread
    watchdog must still emit the one JSON line and hard-exit.  Simulated
    by giving the real bench (on the CPU backend, where it would take
    minutes) a 2-second deadline: whatever it is doing at t=2s, the
    watchdog fires from its own thread."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""   # see _run_bench: unlatch axon
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_DEADLINE"] = "2"
    p = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        env=env, cwd=REPO, timeout=120)
    assert p.returncode == 1, (p.stdout, p.stderr[-2000:])
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, p.stdout
    rec = json.loads(lines[0])
    assert rec["value"] is None
    assert rec["parity_ok"] is False
    assert "watchdog" in rec["error"]
