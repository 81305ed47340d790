"""initialize_multihost (SURVEY.md §5.8): the DCN-join path.

A real multi-host pod cannot exist in CI, but jax.distributed supports a
single-process "cluster" — which exercises the exact code path
(jax.distributed.initialize -> global mesh over all hosts' devices) the
pod run takes.  Runs in a subprocess so the coordinator/client state
never leaks into the test session's runtime.
"""
import os
import subprocess
import sys

_CODE = """
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from reflectance_filtering_tpu.parallel.mesh import (
    initialize_multihost, shard_batch)

mesh = initialize_multihost(coordinator_address="localhost:12355",
                            num_processes=1, process_id=0)
assert jax.process_count() == 1 and jax.process_index() == 0
assert len(mesh.devices.flatten()) == 4, mesh
x = shard_batch(jnp.arange(8.0), mesh)
assert float(jnp.sum(x)) == 28.0
jax.distributed.shutdown()
print("MULTIHOST_OK")
"""


def test_initialize_multihost_single_process_cluster():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", _CODE], capture_output=True, text=True,
        timeout=600, env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "MULTIHOST_OK" in out.stdout
