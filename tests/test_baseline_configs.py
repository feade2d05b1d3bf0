"""End-to-end runs of the five BASELINE.json benchmark configs through the
CLIs — the exact scenarios the driver's north star names."""

import numpy as np
import pytest

from rx_tools_tpu.apps import rx_fm, rx_power, rx_sdr


@pytest.fixture(autouse=True)
def _cpu(monkeypatch):
    monkeypatch.setenv("RX_PLATFORM", "cpu")


def _tone_of(path, rate, skip):
    a = np.fromfile(path, np.int16)[skip:].astype(np.float64)
    a -= a.mean()
    sp = np.abs(np.fft.rfft(a * np.hanning(a.size))) ** 2
    return np.fft.rfftfreq(a.size, 1.0 / rate)[np.argmax(sp)], a.size


def _record(tmp_path, name, rate, secs, f="100M", **synth):
    kw = ",".join(f"{k}={v}" for k, v in synth.items())
    cap = tmp_path / name
    n = int(rate * secs)
    rc = rx_sdr.main(["-d", kw, "-f", f, "-s", str(int(rate)),
                      "-n", str(n), "-F", "CS16", str(cap)])
    assert rc == 0
    return cap


def test_config1_wbfm_mono(tmp_path):
    """#1: u8-era I/Q @ 2.4 Msps -> decimate -> atan2 disc -> deemph -> 32k."""
    # wbfm tunes freq+16k; synth carrier must sit at the station
    # wbfm: demod rate 170k (post_downsample=1, faithful to the reference's
    # commented-out `demod.post_downsample = 4`, rtl_fm.c:1339) -> downsample
    # 1M/170k+1 = 6 -> capture 1.02M; file must be captured at
    # capture_freq = station + 16k + rate/4 (station lands at -fs/4 in
    # the file; the chain's derotation recovers it)
    cap = _record(tmp_path, "c1.cs16", 1_020_000, 0.4,
                  synth="fm", audio="1k", dev="75k", amp="0.8",
                  carrier="100.016M", f="100.271M")
    out = tmp_path / "a1.raw"
    rc = rx_fm.main(["-f", "100M", "-M", "wbfm", "-A", "std",
                     "-d", f"file={cap},format=CS16,rate=1020k", str(out)])
    assert rc == 0
    tone, n = _tone_of(out, 32000, 2000)
    assert n > 5000 and abs(tone - 1000) < 10


def test_config2_nbfm_squelch_fifth_order_48k(tmp_path):
    """#2: NBFM, squelch, fifth-order cascade (-F 9), resample to 48k."""
    # -s 96k -F 9: downsample resolved to 16 (power of two) -> capture
    # 1.536M; capture_freq = 100M + 1.536M/4 = 100.384M
    cap = _record(tmp_path, "c2.cs16", 1_536_000, 0.4,
                  synth="fm", audio="800", dev="5k", amp="0.8",
                  carrier="100M", f="100.384M")
    out = tmp_path / "a2.raw"
    rc = rx_fm.main(["-f", "100M", "-M", "nbfm", "-s", "96k", "-r", "48k",
                     "-F", "9", "-l", "10",
                     "-d", f"file={cap},format=CS16,rate=1536k", str(out)])
    assert rc == 0
    tone, n = _tone_of(out, 48000, 4000)
    assert n > 8000 and abs(tone - 800) < 10


def test_config3_am_usb_lsb_dc_block(tmp_path):
    """#3: AM product detection with DC block and offset-tuning path."""
    cap = _record(tmp_path, "c3.cs16", 1_024_000, 0.4,
                  synth="am", audio="600", amp="0.5", carrier="100M")
    out = tmp_path / "a3.raw"
    rc = rx_fm.main(["-f", "100M", "-M", "am", "-s", "24k",
                     "-E", "dc", "-E", "offset",
                     "-d", f"file={cap},format=CS16,rate=1024k", str(out)])
    assert rc == 0
    tone, n = _tone_of(out, 24000, 2000)
    assert n > 4000 and abs(tone - 600) < 10
    # DC block: once its (9/10)-per-block average converges, the mean is
    # near zero despite AM's carrier envelope (the early transient is the
    # reference's own exponential ramp, rtl_fm.c:684-697)
    a = np.fromfile(out, np.int16).astype(np.float64)
    settled = a[3 * a.size // 4:]
    # without the DC block the mean would sit at the full envelope
    # (~0.9x max); with it the residual decays to a few percent
    assert abs(settled.mean()) < 0.05 * np.abs(settled).max()


def test_config4_power_single_span_2048_bins(tmp_path):
    """#4: single-span 2048-bin windowed FFT, boxcar integration, CSV."""
    out = tmp_path / "c4.csv"
    rc = rx_power.main(["-f", "100M:102M:1k", "-1", "-w", "hamming",
                        "-d", "synth=tone,carrier=100.7M,amp=0.5,noise=0.01",
                        str(out)])
    assert rc == 0
    row = out.read_text().splitlines()[0].split(", ")
    dbms = np.array([float(x) for x in row[6:]])
    assert dbms.size == 2048 + 1          # bins + trailing dup quirk
    peak = float(row[2]) + np.argmax(dbms[:-1]) * float(row[4])
    assert abs(peak - 100.7e6) < 3 * float(row[4])


def test_config5_multi_hop_sweep_crop_stitch(tmp_path):
    """#5: multi-hop wide sweep with retune scheduling, crop + stitch."""
    out = tmp_path / "c5.csv"
    rc = rx_power.main(["-f", "100M:120M:100k", "-1", "-c", "20%",
                        "-d", "synth=tone,carrier=111.4M,amp=0.5,noise=0.01",
                        str(out)])
    assert rc == 0
    rows = [l.split(", ") for l in out.read_text().splitlines()]
    assert len(rows) >= 8                 # multiple hops
    # stitch: find the global peak across all hops
    best = (-1e9, None)
    for r in rows:
        dbms = np.array([float(x) for x in r[6:-1]])
        i = int(np.argmax(dbms))
        f = float(r[2]) + i * float(r[4])
        if dbms[i] > best[0]:
            best = (dbms[i], f)
    assert abs(best[1] - 111.4e6) < 5 * float(rows[0][4])
    # crop: each row logs fewer bins than the FFT size
    n_bins = len(rows[0]) - 7
    assert n_bins < 1 << 11