"""Multi-process sweep division E2E (docs/MULTIHOST.md recipe, implemented
in apps/rx_power.py): N processes each retune/read/integrate only their own
contiguous slice of the tune table; the primary stitches gathered
accumulators into a CSV identical to the single-process run.

This parallelizes the reference's serial hop loop
(``src/rtl_power.c:670-772``) across hosts — the BASELINE.md >= 85%
multi-host scaling axis.  Two local CPU processes stand in for two hosts
(the same jax.distributed control plane a real pod uses;
tests/test_multihost.py proves the collective path).

The synthetic source runs in ``det=1`` mode (deterministic-per-retune), so
a hop's samples depend only on its frequency — never on which process (or
which sweep) read it — making the single- vs multi-process CSVs exactly
comparable.
"""

import os
import socket
import subprocess
import sys
import textwrap
import time

import pytest

_CHILD = textwrap.dedent("""
    import sys, time
    import jax
    jax.config.update("jax_platforms", "cpu")
    from rx_tools_tpu.apps import rx_power
    t0 = time.perf_counter()
    rc = rx_power.main(sys.argv[1:])
    print(f"ELAPSED {time.perf_counter() - t0:.3f}", file=sys.stderr)
    sys.exit(rc)
""")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _base_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["RX_PLATFORM"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_PROCESS_ID", None)
    return env


def _run_power(argv, tmp_path, n_proc, tag, timeout=240):
    """Run the rx_power CLI in 1..N coordinated subprocesses; returns
    (elapsed seconds from the primary, stderr of the primary)."""
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    envs = []
    if n_proc == 1:
        envs.append(_base_env())
    else:
        coord = f"127.0.0.1:{_free_port()}"
        for pid in range(n_proc):
            env = _base_env()
            env["JAX_COORDINATOR_ADDRESS"] = coord
            env["JAX_NUM_PROCESSES"] = str(n_proc)
            env["JAX_PROCESS_ID"] = str(pid)
            envs.append(env)
    procs = [subprocess.Popen([sys.executable, str(script)] + argv,
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              env=env) for env in envs]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"{tag} process {i} failed:\n{err[-4000:]}"
    err0 = outs[0][2]
    elapsed = [float(l.split()[1]) for l in err0.splitlines()
               if l.startswith("ELAPSED")]
    return elapsed[0], err0


def _csv_body(path):
    """CSV rows minus the timestamp columns (they can't match)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split(", ")
            rows.append(parts[2:])
    return rows


def test_two_process_sweep_csv_identical(tmp_path):
    """2-process partitioned sweep CSV == single-process CSV, exactly."""
    src = ("synth=tone,det=1,noise=0.01,seed=5,"
           "carrier=91M|93.5M|96M,amp=0.5|0.3|0.2")
    csv1 = tmp_path / "single.csv"
    csv2 = tmp_path / "multi.csv"
    argv = ["-f", "90M:98M:125k", "-1", "-t", "1", "-S", "0", "-d", src]
    _run_power(argv + [str(csv1)], tmp_path, 1, "single")
    _, err = _run_power(argv + [str(csv2)], tmp_path, 2, "multi")
    assert "Multi-process sweep: process 0/2 owns hops 0..1 of 3" in err
    body1, body2 = _csv_body(csv1), _csv_body(csv2)
    assert len(body1) == 3                # 3 hops planned for this range
    assert body1 == body2                 # bit-identical dBm values
    # the non-primary must not have written anything to the CSV twice
    assert len(body2) == 3


def test_two_process_sweep_scaling(tmp_path):
    """1-vs-2-process scaling on a source-bound 1000-hop sweep.

    Metric: integrated FFT segments (the CSV ``samples`` column, summed
    over all flushed rows) completed in a fixed wall-clock window — robust
    to the constant startup overhead (backend init, compile-cache load,
    distributed bring-up) that would swamp a single-sweep wall-clock
    comparison.  Honest accounting (docs/MULTIHOST.md): the sweep is
    source/retune bound, exactly like the reference's serial hop loop
    (``rtl_power.c:670-772``) — and that work divides by the process
    count because each process reads only its own hops.
    """
    src = "synth=tone,det=1,seed=1,carrier=150M"
    base = ["-f", "100M:2.9G:125k", "-t", "1", "-S", "0", "-d", src]
    # warm the compile cache for both configs (single-shot runs)
    _run_power(base + ["-1", str(tmp_path / "w1.csv")], tmp_path, 1, "warm1")
    _run_power(base + ["-1", str(tmp_path / "w2.csv")], tmp_path, 2, "warm2")
    # the single-shot warmup CSVs must also agree exactly (det source,
    # scene pinned by an explicit carrier)
    assert _csv_body(tmp_path / "w1.csv") == _csv_body(tmp_path / "w2.csv")
    timed = base + ["-i", "1", "-e", "8"]
    speedup = 0.0
    for attempt in range(2):            # wall-clock metric; retry once
        _run_power(timed + [str(tmp_path / "t1.csv")], tmp_path, 1, "t1")
        _run_power(timed + [str(tmp_path / "t2.csv")], tmp_path, 2, "t2")
        work1 = sum(int(r[3]) for r in _csv_body(tmp_path / "t1.csv"))
        work2 = sum(int(r[3]) for r in _csv_body(tmp_path / "t2.csv"))
        speedup = work2 / work1
        sys.stderr.write(f"\n1-proc {work1} segs  2-proc {work2} segs in "
                         f"8 s: speedup {speedup:.2f}x (attempt {attempt})\n")
        if speedup > 1.2:
            break
    if speedup <= 1.2:
        # a loaded machine starves the 2-process run of its second core,
        # making the wall-clock comparison meaningless — skip, don't fail
        load = os.getloadavg()[0]
        ncpu = os.cpu_count() or 1
        if load > 0.5 * ncpu:
            pytest.skip(f"host too loaded for a wall-clock scaling "
                        f"comparison (load {load:.1f} on {ncpu} cpus)")
    assert speedup > 1.2, f"no multi-process speedup: {speedup:.2f}x"


def test_two_process_intfft_csv_identical(tmp_path):
    """Round-4: --int-fft composes with multi-process sweep division —
    2-process CSV == 1-process CSV bit-for-bit (the int64 accumulators
    ride the two-uint32-plane exact gather, parallel/multihost.py)."""
    src = ("synth=tone,det=1,noise=0.01,seed=5,"
           "carrier=91M|93.5M|96M,amp=0.5|0.3|0.2")
    csv1 = tmp_path / "isingle.csv"
    csv2 = tmp_path / "imulti.csv"
    argv = ["-f", "90M:98M:125k", "-1", "-t", "1", "-S", "0",
            "--int-fft", "-d", src]
    _run_power(argv + [str(csv1)], tmp_path, 1, "int-single")
    _, err = _run_power(argv + [str(csv2)], tmp_path, 2, "int-multi")
    assert "Multi-process sweep: process 0/2 owns hops 0..1 of 3" in err
    body1, body2 = _csv_body(csv1), _csv_body(csv2)
    assert len(body1) == 3
    assert body1 == body2                 # bit-identical (integer tier)
