"""Driver-contract tests for __graft_entry__.py.

The round-1 driver check failed (MULTICHIP_r01.json) because
dryrun_multichip ran under the latched JAX_PLATFORMS=axon env and saw one
TPU instead of bootstrapping an 8-device virtual CPU mesh.  These tests
invoke the entry points the way the driver does — a fresh interpreter
with the environment as-is (XLA_FLAGS stripped), `python -c` — so a
regression in the self-bootstrap fails here first.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    env = dict(os.environ)
    # The driver gives no XLA_FLAGS help; conftest may have set it for this
    # process — strip it so the subprocess must bootstrap on its own.
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_dryrun_multichip_fresh_interpreter():
    code = ("import __graft_entry__ as g; g.dryrun_multichip(8)")
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_driver_env(),
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (
        "dryrun_multichip(8) failed from a bare interpreter:\n"
        "stdout:\n{}\nstderr:\n{}".format(proc.stdout, proc.stderr))
    assert "dryrun_multichip(8) OK" in proc.stdout


def test_dryrun_multichip_in_process():
    # Also callable in-process where conftest already forced the 8-device
    # CPU backend (the bootstrap must tolerate an initialized backend).
    import __graft_entry__ as g

    g.dryrun_multichip(8)
