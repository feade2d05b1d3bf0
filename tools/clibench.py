"""CLI-level wall-clock benchmark: rx_channels over a tunneled TPU.

The device-side step rates live in bench.py/chipsuiteN; this measures
what a USER sees — the CLI demodulating a recorded capture end to end,
where a tunneled device adds ~26-35 ms per dispatch.  It times
``rx_channels -n 64`` over an 8-second 2.4 Msps capture at chunked
dispatch (default, 8 blocks/dispatch) vs per-block dispatch
(RX_CHANNELS_CHUNK=1), demonstrating the round-trip amortization the
runner exists for (stream/chunked.py's story, applied to rx_channels in
round 5).

Run: PYTHONPATH=/root/repo python tools/clibench.py
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SECONDS = 8
FS = 2_400_000


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def run_cli(mod, argv, extra_env=None, timeout=1200):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if extra_env:
        env.update(extra_env)
    t0 = time.perf_counter()
    p = subprocess.run([sys.executable, "-m", f"rx_tools_tpu.apps.{mod}"]
                       + argv, env=env, timeout=timeout,
                       stderr=subprocess.PIPE)
    dt = time.perf_counter() - t0
    if p.returncode != 0:
        sys.stderr.write(p.stderr.decode(errors="replace")[-2000:])
        raise SystemExit(f"{mod} failed rc={p.returncode}")
    return dt


def main():
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        cap = os.path.join(tmp, "band.cs16")
        log(f"recording {SECONDS}s of 2.4 Msps synth band...")
        run_cli("rx_sdr", ["-d", "synth=fm,det=1,seed=3,carrier=100.3M,"
                           "audio=1k,dev=75k,amp=0.6",
                           "-f", "100M", "-s", str(FS),
                           "-n", str(SECONDS * FS), "-F", "CS16", cap],
                extra_env={"RX_PLATFORM": "cpu"})
        args = ["-f", "100M", "-s", str(FS), "-n", "64", "-M", "fm",
                "-A", "fast", "-c", "us", "-r", "32k",
                "-d", f"file={cap},format=CS16,rate={FS}"]
        # warm the compile cache + tunnel first (not timed)
        log("warm-up run...")
        run_cli("rx_channels", args + [os.path.join(tmp, "w")])
        for name, env in (("chunked8", {}),
                          ("perblock", {"RX_CHANNELS_CHUNK": "1"}),
                          ("chunked8_b", {})):
            dt = run_cli("rx_channels", args + [os.path.join(tmp, name)])
            rt = SECONDS * 64 / dt          # channel-seconds per second
            results[f"{name}_s"] = round(dt, 2)
            results[f"{name}_chan_rt"] = round(rt, 1)
            log(f"{name}: {dt:.2f} s wall = {rt:.0f} channel-seconds/s")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
