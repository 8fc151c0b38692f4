"""2-process localhost test of the jax.distributed wrapper.

Real multi-host TPU hardware is unavailable here, so the test launches two
CPU subprocesses against a localhost coordinator (what
``parallel.multihost.initialize`` wires up on a pod) and asserts a psum
across processes — this would catch any ``jax.distributed`` API break in
the 57-line wrapper.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)

from lammps_analysis_tpu.parallel import multihost

proc_id = int(sys.argv[1])
multihost.initialize(
    coordinator_address=sys.argv[2], num_processes=2, process_id=proc_id
)

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

assert jax.process_count() == 2, jax.process_count()
assert multihost.is_multihost()
assert len(jax.devices()) == 2  # one CPU device per process, global view

mesh = Mesh(np.array(jax.devices()), axis_names=("data",))

# each process contributes its local shard; psum must see both
local = jnp.full((1,), float(proc_id + 1))
arr = jax.make_array_from_single_device_arrays(
    (2,),
    NamedSharding(mesh, P("data")),
    [jax.device_put(local, jax.local_devices()[0])],
)
total = jax.jit(
    jax.shard_map(
        lambda x: jax.lax.psum(x, "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P("data"),
    ),
    out_shardings=NamedSharding(mesh, P("data")),
)(arr)
local_val = float(np.asarray(total.addressable_data(0))[0])
assert local_val == 3.0, local_val  # 1 + 2 summed across processes
print(f"proc {proc_id} OK psum={local_val}", flush=True)
"""


def test_two_process_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), coordinator],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out
