"""E2E validation of the CLI dispatch stack on the real TPU vs CPU.

Round-4 established the methodology (docs/PERF.md "End-to-end hardware
validation"); round 5 scripts it so every round can re-run it in one
command after perf changes:

    python tools/tpu_e2e.py            # runs TPU + CPU, compares

Checks, all on the SAME deterministic synth-FM capture file:

1. ``rx_fm -M wbfm``: TPU (current production dispatch: int16-dot
   frontend, batched-front scan engine, MXU deemph, rows resampler) vs
   CPU (masked frontend, Hillis-Steele, cumsum resampler) — identical
   sample counts, audio SNR >= 90 dB, max diff <= 2 LSB, and the 1 kHz
   test tone recovered on both.
2. ``rx_fm --int-audio``: TPU output byte-identical to CPU (the
   bit-exact integer tier must survive the backend change).
3. ``rx_power --int-fft``: TPU CSV identical to CPU CSV to the digit.
4. ``rx_channels -n 16`` (time-major PFB engine): per-channel TPU
   audio within 2 LSB of CPU on every channel.

Exit 0 = all pass.  Writes work files under /tmp/rx_e2e.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/rx_e2e"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def run_cli(mod, argv, platform=None, timeout=1200):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    if platform:
        env["RX_PLATFORM"] = platform
    else:
        env.pop("RX_PLATFORM", None)
    cmd = [sys.executable, "-m", f"rx_tools_tpu.apps.{mod}"] + argv
    p = subprocess.run(cmd, env=env, timeout=timeout, stderr=subprocess.PIPE)
    if p.returncode != 0:
        sys.stderr.write(p.stderr.decode(errors="replace")[-3000:])
        raise SystemExit(f"{mod} {platform or 'tpu'} failed rc={p.returncode}")


def snr_db(ref, x):
    err = x - ref
    p = float(np.mean(ref ** 2))
    pe = float(np.mean(err ** 2))
    return 10 * np.log10(p / pe) if pe > 0 else float("inf")


def peak_hz(a, fs):
    a = a[a.size // 4:] - a[a.size // 4:].mean()
    sp = np.abs(np.fft.rfft(a * np.hanning(a.size))) ** 2
    return np.fft.rfftfreq(a.size, 1.0 / fs)[np.argmax(sp[1:]) + 1]


def main() -> int:
    os.makedirs(WORK, exist_ok=True)
    ok = True
    cap = os.path.join(WORK, "cap.cs16")
    # 2 s of deterministic synth FM at 1.02 MS/s (the wbfm capture rate)
    src = "synth=fm,det=1,seed=5,carrier=100.016M,audio=1k,dev=75k,amp=0.8"
    run_cli("rx_sdr", ["-d", src, "-f", "100.271M", "-s", "1020k",
                       "-n", str(2 * 1_020_000), "-F", "CS16", cap],
            platform="cpu")
    fsrc = f"file={cap},format=CS16,rate=1020k"
    fm_args = ["-f", "100M", "-M", "wbfm", "-d", fsrc]

    # ---- 1. float wbfm chain -------------------------------------------
    a_t, a_c = os.path.join(WORK, "fm_tpu.pcm"), os.path.join(WORK, "fm_cpu.pcm")
    run_cli("rx_fm", fm_args + [a_t])
    run_cli("rx_fm", fm_args + [a_c], platform="cpu")
    t = np.fromfile(a_t, np.int16).astype(np.float64)
    c = np.fromfile(a_c, np.int16).astype(np.float64)
    log(f"wbfm sizes: tpu {t.size} cpu {c.size}")
    if t.size != c.size or t.size < 32000:
        log("FAIL: size mismatch")
        ok = False
    else:
        s = snr_db(c, t)
        md = float(np.max(np.abs(t - c)))
        pk = peak_hz(t, 32000)
        log(f"wbfm: SNR {s:.1f} dB, max diff {md:.0f} LSB, "
            f"TPU peak {pk:.1f} Hz")
        ok &= s >= 90.0 and md <= 2.0 and abs(pk - 1000.0) < 10

    # ---- 2. bit-exact integer audio tier -------------------------------
    i_t, i_c = os.path.join(WORK, "ia_tpu.pcm"), os.path.join(WORK, "ia_cpu.pcm")
    run_cli("rx_fm", fm_args + ["--int-audio", i_t])
    run_cli("rx_fm", fm_args + ["--int-audio", i_c], platform="cpu")
    same = open(i_t, "rb").read() == open(i_c, "rb").read()
    log(f"--int-audio byte-identical: {same} "
        f"({os.path.getsize(i_t)} bytes)")
    ok &= same and os.path.getsize(i_t) > 0

    # ---- 3. bit-exact integer FFT tier ---------------------------------
    p_t, p_c = os.path.join(WORK, "p_tpu.csv"), os.path.join(WORK, "p_cpu.csv")
    psrc = ("synth=tone,det=1,noise=0.01,seed=5,"
            "carrier=91M|93.5M|96M,amp=0.5|0.3|0.2")
    pargs = ["-f", "90M:98M:125k", "-1", "-S", "0", "--int-fft", "-d", psrc]
    run_cli("rx_power", pargs + [p_t])
    run_cli("rx_power", pargs + [p_c], platform="cpu")

    def body(path):
        return [l.split(", ")[2:] for l in open(path)]
    same = body(p_t) == body(p_c)
    log(f"--int-fft CSV identical (minus timestamps): {same} "
        f"({len(body(p_t))} rows)")
    ok &= same and len(body(p_t)) > 0

    # ---- 4. time-major PFB channelizer ---------------------------------
    ch_t, ch_c = os.path.join(WORK, "ch_tpu"), os.path.join(WORK, "ch_cpu")
    for d_ in (ch_t, ch_c):
        shutil.rmtree(d_, ignore_errors=True)
    csrc = ("synth=fm,det=1,seed=9,carrier=100.192M,audio=1k,"
            "dev=15k,amp=0.8")
    cargs = ["-f", "100M", "-s", "1024k", "-n", "16", "-M", "fm",
             "-A", "fast", "-c", "us", "-r", "32k", "-e", "1", "-d", csrc]
    run_cli("rx_channels", cargs + [ch_t])
    run_cli("rx_channels", cargs + [ch_c], platform="cpu")
    import glob
    ft = sorted(glob.glob(os.path.join(ch_t, "ch*.s16")))
    fc = sorted(glob.glob(os.path.join(ch_c, "ch*.s16")))
    worst = 0.0
    chan_ok = len(ft) == len(fc) == 16
    for a, b in zip(ft, fc):
        x = np.fromfile(a, np.int16).astype(np.float64)
        y = np.fromfile(b, np.int16).astype(np.float64)
        if x.size != y.size or x.size < 1000:
            chan_ok = False
            continue
        worst = max(worst, float(np.max(np.abs(x - y))))
    log(f"rx_channels PFB: {len(ft)} channels, worst TPU-vs-CPU diff "
        f"{worst:.0f} LSB")
    ok &= chan_ok and worst <= 2.0

    log("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
