"""Multi-host (DCN) path: a real two-process jax.distributed smoke over
localhost, plus the 2D mesh layout helper.

The worker processes run ``initialize_multihost`` with explicit args, build
a global mesh spanning both processes' CPU devices, compute a psum over the
'data' axis and each host's ``local_batch_slice`` — exercising every public
function in vmrframe_tpu/parallel/mesh.py across an actual process boundary.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from vmrframe_tpu.parallel.mesh import (batch_sharding, initialize_multihost,
                                        local_batch_slice, make_mesh, replicated)

coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
initialize_multihost(coordinator_address=coordinator, num_processes=n_proc,
                     process_id=pid)
assert jax.process_count() == n_proc, jax.process_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

mesh = make_mesh(jax.devices())  # global: both processes' CPU devices
n_dev = len(jax.devices())
B = 2 * n_dev
sharding = batch_sharding(mesh)

# per-host slice of the global batch (what the trainer's loader would ship)
start, size = local_batch_slice(B)
full = np.arange(B, dtype=np.float32)

local = full[start:start + size]
arrays = [jax.device_put(local[i::len(mesh.local_devices)], d)
          for i, d in enumerate(mesh.local_devices)]
global_x = jax.make_array_from_single_device_arrays(
    (B,), sharding, arrays)

@jax.jit
def total(x):
    return jnp.sum(x)

result = float(total(global_x))
expected = float(np.sum(full))
print(json.dumps({"pid": pid, "n_dev": n_dev, "result": result,
                  "expected": expected, "start": start, "size": size}))
assert abs(result - expected) < 1e-6, (result, expected)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    # APPEND to PYTHONPATH (this machine's sitecustomize lives there)
    env["PYTHONPATH"] = (env.get("PYTHONPATH", "") + os.pathsep + REPO).lstrip(os.pathsep)
    procs = [subprocess.Popen([sys.executable, str(worker), coordinator, "2", str(pid)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              cwd=REPO, env=env, text=True)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert {o["pid"] for o in outs} == {0, 1}
    for o in outs:
        assert o["n_dev"] == 4  # 2 procs x 2 local devices
        assert o["result"] == o["expected"]
    # the two hosts got disjoint halves of the global batch
    slices = sorted((o["start"], o["size"]) for o in outs)
    assert slices == [(0, 4), (4, 4)]


def test_initialize_multihost_noop_without_coordinator(monkeypatch):
    """Single-host setups: no coordinator configured -> no-op (no hang)."""
    from vmrframe_tpu.parallel.mesh import initialize_multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    initialize_multihost()  # must return immediately


def test_2d_mesh_shape():
    import jax

    from vmrframe_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    devices = jax.devices()[:8]
    mesh = make_mesh(devices, axis_names=("data", "model"), shape=(4, 2))
    assert mesh.shape == {"data": 4, "model": 2}
    import jax.numpy as jnp

    x = jnp.arange(16.0).reshape(16, 1)
    xs = jax.device_put(x, batch_sharding(mesh))  # sharded over 'data' only
    w = jax.device_put(jnp.ones((1, 1)), replicated(mesh))

    @jax.jit
    def f(x, w):
        return jnp.sum(x @ w)

    assert float(f(xs, w)) == float(jnp.sum(x))
