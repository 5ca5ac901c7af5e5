"""Multi-host bootstrap smoke tests.

``initialize_multihost`` (parallel/mesh.py) is the entry point for
multi-host pods; the reference has no distributed backend at all (SURVEY.md
section 2 — one process, one mutex). These tests exercise the real
``jax.distributed`` path with TWO OS processes on CPU: each process
contributes 2 virtual devices, the global mesh spans 4, and a shard_map
psum must see all of them. Run in subprocesses so the coordinator service
never pollutes the pytest process.
"""

import socket
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
port, pid = sys.argv[1], int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %r)
from pmv_tpu.parallel import mesh as mesh_lib

ok = mesh_lib.initialize_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
assert ok, "initialize_multihost returned False with explicit args"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2, jax.local_device_count()

import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = mesh_lib.make_mesh(dp=4, lm=1)
sharding = NamedSharding(mesh, P("dp"))
data = np.arange(4.0, dtype=np.float32)
x = jax.make_array_from_callback((4,), sharding, lambda idx: data[idx])

def f(x):
    return jax.lax.psum(jnp.sum(x), "dp")

y = jax.jit(shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P(),
                      check_vma=False))(x)
val = float(np.asarray(y.addressable_shards[0].data))
print(f"RESULT {pid} {val}", flush=True)
""" % (REPO,)

AUTO_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %r)
from pmv_tpu.parallel import mesh as mesh_lib

# Outside a managed cluster, argument-free auto-init must degrade gracefully
# (False) or succeed as a single-process group — never raise.
ok = mesh_lib.initialize_multihost()
print(f"AUTO {ok} {jax.process_count()}", flush=True)
""" % (REPO,)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


class TestMultihostInit:
    def test_two_process_psum(self):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", WORKER, str(port), str(pid)],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
            for pid in range(2)
        ]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=180)
            assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
            outs.append(out)
        # psum over the 4-device global mesh: 0+1+2+3 = 6 on both processes
        for pid, out in enumerate(outs):
            assert f"RESULT {pid} 6.0" in out, out

    def test_auto_init_degrades_gracefully(self):
        proc = subprocess.run(
            [sys.executable, "-c", AUTO_WORKER],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 0, proc.stderr
        assert "AUTO " in proc.stdout, proc.stdout
