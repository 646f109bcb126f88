"""True multi-process distributed test: 2 local processes, CPU backend,
jax.distributed coordination — exercises the cross-process collective path
the virtual-device mesh cannot (SURVEY.md §4 multi-host simulation)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from icp_tpu.parallel.mesh import init_distributed

ok = init_distributed(
    coordinator=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PID_"]),
)
assert ok
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

devs = jax.devices()
assert len(devs) == 2, devs                     # one cpu device per process
mesh = Mesh(np.asarray(devs), ("d",))

@jax.jit
def total(x):
    return jax.lax.psum(x, "d")

from jax import shard_map
f = shard_map(lambda x: jax.lax.psum(jnp.sum(x), "d"), mesh=mesh,
              in_specs=P("d"), out_specs=P())
local = jnp.arange(8.0) + 100.0 * int(os.environ["PID_"])
import jax.experimental.multihost_utils as mhu
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("d")), np.asarray(local))
out = f(garr)
print("PSUM_RESULT", float(np.asarray(out)), flush=True)
"""


@pytest.mark.skipif(os.environ.get("ICP_TPU_MULTIPROC") != "1",
                    reason="multi-process test is opt-in "
                           "(ICP_TPU_MULTIPROC=1); spawns jax.distributed "
                           "workers")
def test_two_process_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update({"REPO": REPO, "COORD": coord, "PID_": str(pid),
                    "JAX_PLATFORMS": "cpu"})
        env.pop("XLA_FLAGS", None)
        # the TPU plugin's sitecustomize (on /root/.axon_site via
        # PYTHONPATH) initializes a backend at interpreter start, which
        # breaks jax.distributed.initialize — give workers a clean path
        env["PYTHONPATH"] = REPO
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-800:]
    # sum over both processes' local [0..7] and [100..107]
    want = sum(range(8)) + sum(range(8)) + 100.0 * 8
    for so, _ in outs:
        assert f"PSUM_RESULT {want}" in so
