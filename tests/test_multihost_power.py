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
    return elapsed[0], err0, [o[2] for o in outs]


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
    _, err, _ = _run_power(argv + [str(csv2)], tmp_path, 2, "multi")
    assert "Multi-process sweep: process 0/2 owns hops 0..1 of 3" in err
    body1, body2 = _csv_body(csv1), _csv_body(csv2)
    assert len(body1) == 3                # 3 hops planned for this range
    assert body1 == body2                 # bit-identical dBm values
    # the non-primary must not have written anything to the CSV twice
    assert len(body2) == 3


def _sweep_summary(err):
    """Parse the deterministic work line rx_power logs at exit:
    ``Sweep summary: P passes, R hop reads (K hops owned of T).``"""
    for line in err.splitlines():
        if "Sweep summary:" in line:
            import re
            m = re.search(r"Sweep summary: (\d+) passes, (\d+) hop reads "
                          r"\((\d+) hops owned of (\d+)\)", line)
            assert m, line
            return tuple(int(g) for g in m.groups())
    raise AssertionError(f"no sweep summary in stderr:\n{err[-2000:]}")


def test_two_process_sweep_division_deterministic(tmp_path):
    """1-vs-2-process scaling asserted STRUCTURALLY, not by wall clock.

    The scaling mechanism is work division: each process retunes/reads
    only its own contiguous slice of the tune table (the reference's
    serial hop loop ``rtl_power.c:670-772``, partitioned).  On a 50-hop
    single-shot sweep the 2-process job must show each process reading
    exactly 25 hops (half the source/retune work — the sweep's measured
    bottleneck, docs/MULTIHOST.md) while the stitched CSV still carries
    all 50 hops bit-identically to the 1-process run.  Deterministic
    counters, so this can never skip under host load (round-4 verdict:
    the previous fixed-window throughput form could).
    """
    src = "synth=tone,det=1,seed=1,carrier=150M"
    base = ["-f", "100M:240M:125k", "-1", "-t", "1", "-S", "0", "-d", src]
    _, err1, _ = _run_power(base + [str(tmp_path / "d1.csv")],
                            tmp_path, 1, "div1")
    _, err2, errs2 = _run_power(base + [str(tmp_path / "d2.csv")],
                                tmp_path, 2, "div2")
    p1, r1, own1, tot1 = _sweep_summary(err1)
    assert (p1, own1) == (1, tot1)        # single process owns the plan
    assert r1 == tot1 >= 50               # one full pass of hop reads
    # two processes: the hop reads divide exactly — same total work,
    # half per process, zero duplication
    sums = [_sweep_summary(e) for e in errs2]
    assert [s[3] for s in sums] == [tot1, tot1]
    assert sorted(s[2] for s in sums) == sorted(
        [-(-tot1 // 2), tot1 - -(-tot1 // 2)])
    for passes, reads, owned, _tot in sums:
        assert passes == 1 and reads == owned
    assert sum(s[1] for s in sums) == tot1
    # and the stitched CSV is the complete plan, bit-identical
    body1, body2 = _csv_body(tmp_path / "d1.csv"), _csv_body(tmp_path / "d2.csv")
    assert len(body1) == tot1
    assert body1 == body2


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
    _, err, _ = _run_power(argv + [str(csv2)], tmp_path, 2, "int-multi")
    assert "Multi-process sweep: process 0/2 owns hops 0..1 of 3" in err
    body1, body2 = _csv_body(csv1), _csv_body(csv2)
    assert len(body1) == 3
    assert body1 == body2                 # bit-identical (integer tier)
