"""The DCN path actually executes: two local processes bring up
jax.distributed over CPU via parallel.multihost.init and run a psum
across the process boundary (BASELINE.md's multi-host scaling target has
no hardware here, but the control plane + collective path is real)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_CHILD = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    from rx_tools_tpu.parallel import multihost

    coord, num, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    idx = multihost.init(coordinator_address=coord, num_processes=num,
                         process_id=pid)
    assert idx == pid, (idx, pid)
    assert jax.process_count() == num
    assert jax.device_count() == num      # 1 CPU device per process

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("h",))

    def body(x):
        return jax.lax.psum(x, "h")

    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P("h"),
                               out_specs=P()))
    # each process contributes its own value; the psum crosses processes
    local = jnp.full((1,), float(pid + 1))
    glob = jax.make_array_from_single_device_arrays(
        (num,), NamedSharding(mesh, P("h")),
        [jax.device_put(local, jax.local_devices()[0])])
    total = fn(glob)
    expect = sum(range(1, num + 1))
    got = float(jax.device_get(total.addressable_data(0))[0])
    assert got == expect, (got, expect)
    assert multihost.is_primary() == (pid == 0)
    print(f"OK process {pid}", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum(tmp_path):
    num = 2
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(num), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for i in range(num)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {i} failed:\n{err[-3000:]}"
        assert f"OK process {i}" in out
