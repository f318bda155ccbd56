"""Multi-process (multi-host analog) bring-up test: two OS processes join a
jax.distributed coordination service over localhost, build one global
('data', 'model') mesh spanning both, and jointly reduce a global sharded
array. This is the CPU stand-in for the SURVEY 5.8 "≥2 hosts" axis —
the same initialize_distributed/make_mesh path the train CLI wires via
--num_processes/--coordinator_address.
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from splatfields_tpu.parallel.mesh import initialize_distributed, make_mesh

pid = int(sys.argv[1]); port = sys.argv[2]
initialize_distributed("127.0.0.1:" + port, 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()   # 2 local x 2 processes

mesh = make_mesh(4, data=2)
data = np.arange(16, dtype=np.float32)
sharding = NamedSharding(mesh, P(("data", "model")))
x = jax.make_array_from_callback((16,), sharding, lambda idx: data[idx])
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
assert float(total) == 120.0, float(total)
print("DIST_OK", jax.process_index(), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_mesh(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    env.pop("XLA_FLAGS", None)      # worker forces 2 local devices
    # append (never clobber) PYTHONPATH — the axon site dir must survive
    env["PYTHONPATH"] = REPO + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"DIST_OK {i}" in out, out
