"""Multi-process rx_channels: the channel axis divides across processes
(round-5) — each process computes only its own channels' mixer columns /
PFB DFT rows + demod tails against the replicated capture front, and
writes only its own channel files.  Zero cross-process communication
(the division is structural, like rx_power's hop partition)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

_CHILD = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    from rx_tools_tpu.apps import rx_channels
    sys.exit(rx_channels.main(sys.argv[1:]))
""")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(argv, tmp_path, n_proc, tag, env_extra=None, timeout=240):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    envs = []
    coord = f"127.0.0.1:{_free_port()}"
    for pid in range(n_proc):
        env = dict(os.environ)
        env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["RX_PLATFORM"] = "cpu"
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
        for k in ("JAX_PLATFORMS", "JAX_COORDINATOR_ADDRESS",
                  "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
            env.pop(k, None)
        if n_proc > 1:
            env["JAX_COORDINATOR_ADDRESS"] = coord
            env["JAX_NUM_PROCESSES"] = str(n_proc)
            env["JAX_PROCESS_ID"] = str(pid)
        if env_extra:
            env.update(env_extra)
        envs.append(env)
    procs = [subprocess.Popen([sys.executable, str(script)] + argv,
                              stderr=subprocess.PIPE, env=env)
             for env in envs]
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=timeout)
        errs.append(err.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"{tag} process {i}:\n{errs[i][-3000:]}"
    return errs


def _compare_dirs(d1, d2, n_expect, atol_lsb=2.0):
    f1 = sorted(d1.glob("ch*.s16"))
    f2 = sorted(d2.glob("ch*.s16"))
    assert [p.name for p in f1] == [p.name for p in f2]
    assert len(f1) == n_expect
    for a, b in zip(f1, f2):
        x = np.fromfile(a, np.int16).astype(np.float64)
        y = np.fromfile(b, np.int16).astype(np.float64)
        assert x.size == y.size > 500, a.name
        assert np.max(np.abs(x - y)) <= atol_lsb, a.name


def test_two_process_pfb_channels(tmp_path):
    """2-process -n 16: channels 0..7 from process 0, 8..15 from process 1
    (per-process DFT row slices over the replicated filterbank) match the
    single-process run channel for channel."""
    args = ["-f", "100M", "-s", "1024k", "-n", "16", "-M", "fm",
            "-A", "fast", "-c", "us", "-r", "32k", "-e", "1",
            "-d", "synth=fm,det=1,seed=9,carrier=100.192M,audio=1k,"
                  "dev=15k,amp=0.8"]
    out1, out2 = tmp_path / "p1", tmp_path / "p2"
    # single-process reference on the channel-major engine (what the
    # per-process partition runs)
    _run(args + [str(out1)], tmp_path, 1, "single",
         env_extra={"RX_PFB": "cm"})
    errs = _run(args + [str(out2)], tmp_path, 2, "multi")
    assert any("owns channels 0..7 of 16" in e for e in errs)
    assert any("owns channels 8..15 of 16" in e for e in errs)
    _compare_dirs(out1, out2, 16)


def test_two_process_mixer_channels(tmp_path):
    """2-process -k with 4 stations: two per process, same audio as the
    single-process run (the time-major mixer's station columns are
    independent)."""
    args = ["-f", "100M", "-s", "1024k",
            "-k", "100.192M,99.936M,100.017M,100.26M", "-D", "16",
            "-M", "fm", "-A", "fast", "-c", "us", "-r", "32k", "-e", "1",
            "-d", "synth=fm,det=1,seed=7,carrier=100.192M,audio=1k,"
                  "dev=15k,amp=0.8"]
    out1, out2 = tmp_path / "m1", tmp_path / "m2"
    _run(args + [str(out1)], tmp_path, 1, "single")
    errs = _run(args + [str(out2)], tmp_path, 2, "multi")
    assert any("owns stations 0..1" in e for e in errs)
    assert any("owns stations 2..3" in e for e in errs)
    _compare_dirs(out1, out2, 4)
