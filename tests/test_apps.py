"""CLI end-to-end tests: the three tools driven through their main()."""

import os
import sys

import numpy as np
import pytest

from rx_tools_tpu.apps import rx_fm, rx_power, rx_sdr


@pytest.fixture(autouse=True)
def _cpu_platform(monkeypatch):
    monkeypatch.setenv("RX_PLATFORM", "cpu")


def test_rx_sdr_record_cu8(tmp_path):
    out = tmp_path / "cap.cu8"
    rc = rx_sdr.main(["-d", "synth=tone,amp=0.5", "-f", "100M", "-s", "1024k",
                      "-n", "4096", "-F", "CU8", str(out)])
    assert rc == 0
    blob = out.read_bytes()
    assert len(blob) == 2 * 4096
    # CU8 bias: mid-scale is 127/128
    arr = np.frombuffer(blob, np.uint8)
    assert 100 < arr.mean() < 160


def test_rx_sdr_bad_conversion(tmp_path):
    rc = rx_sdr.main(["-I", "CU8", "-F", "CS16", str(tmp_path / "x")])
    assert rc == 1


def test_rx_sdr_requires_filename():
    with pytest.raises(SystemExit):
        rx_sdr.main(["-f", "100M"])


def test_rx_power_single_shot(tmp_path):
    out = tmp_path / "sweep.csv"
    rc = rx_power.main(["-f", "100M:102M:10k", "-1",
                        "-d", "synth=tone,carrier=101.3M,amp=0.5,noise=0.01",
                        str(out)])
    assert rc == 0
    rows = [l.split(", ") for l in out.read_text().splitlines()]
    assert len(rows) == 1
    lo, hi, step = float(rows[0][2]), float(rows[0][3]), float(rows[0][4])
    assert lo == 100000000 and hi == 102000000
    dbms = np.array([float(x) for x in rows[0][6:]])
    peak_freq = lo + np.argmax(dbms) * step
    assert abs(peak_freq - 101.3e6) < 2 * step
    assert dbms.max() - np.median(dbms) > 20


def test_rx_power_needs_range():
    with pytest.raises(SystemExit):
        rx_power.main([])


def test_rx_fm_wbfm_from_file(tmp_path):
    # record a short FM capture with rx_sdr, demodulate with rx_fm
    cap = tmp_path / "cap.cs16"
    # wbfm plans capture at 1.02M (demod 170k x downsample 6, rtl_fm.c:968,
    # 1331-1341 with post_downsample commented out); station at -fs/4 of the
    # file center so the chain's derotation recenters it.
    rc = rx_sdr.main(["-d", "synth=fm,audio=1k,dev=75k,amp=0.8,noise=0.001,carrier=100.3M",
                      "-f", "100.555M", "-s", "1020k", "-n", "510k",
                      "-F", "CS16", str(cap)])
    assert rc == 0
    audio = tmp_path / "audio.raw"
    rc = rx_fm.main(["-f", "100.3M", "-M", "wbfm",
                     "-d", f"file={cap},format=CS16,rate=1020k", str(audio)])
    assert rc == 0
    pcm = np.fromfile(audio, np.int16)
    assert pcm.size > 10000          # ~0.5 s at 32k
    a = pcm[2000:].astype(np.float64)
    a -= a.mean()
    sp = np.abs(np.fft.rfft(a * np.hanning(a.size))) ** 2
    fr = np.fft.rfftfreq(a.size, 1 / 32000)
    assert abs(fr[np.argmax(sp)] - 1000.0) < 10


def test_rx_fm_scan_requires_squelch():
    rc = rx_fm.main(["-f", "100M", "-f", "101M"])
    assert rc == 1


def test_rx_fm_raw_mode(tmp_path):
    """-M raw outputs 2x16-bit I/Q pairs at the decimated rate."""
    cap = tmp_path / "cap.cs16"
    rx_sdr.main(["-d", "synth=tone,amp=0.3", "-f", "100M", "-s", "1024k",
                 "-n", "96k", "-F", "CS16", str(cap)])
    out = tmp_path / "iq.raw"
    rc = rx_fm.main(["-f", "100M", "-M", "raw", "-s", "24k",
                     "-d", f"file={cap},format=CS16,rate=1024k", str(out)])
    assert rc == 0
    data = np.fromfile(out, np.int16)
    assert data.size % 2 == 0 and data.size > 1000
    # decimation 1024k -> >=1Ms capture floor => downsample 42 -> ~2285
    # complex pairs per 96k input (plus up to one zero-padded tail block)
    assert abs(data.size // 2 - 96_000 // 42) < 150


def test_rx_fm_wav_header(tmp_path):
    cap = tmp_path / "cap.cs16"
    rx_sdr.main(["-d", "synth=tone", "-f", "100M", "-s", "1024k",
                 "-n", "100k", "-F", "CS16", str(cap)])
    audio = tmp_path / "a.wav"
    rc = rx_fm.main(["-f", "100M", "-M", "am", "-s", "24k", "-E", "wav",
                     "-d", f"file={cap},format=CS16,rate=1024k", str(audio)])
    assert rc == 0
    hdr = audio.read_bytes()[:44]
    assert hdr[:4] == b"RIFF" and hdr[8:12] == b"WAVE"


def test_driver_query_without_soapy_lib():
    """-d driver=... on a machine without libSoapySDR: clean exit."""
    from rx_tools_tpu.iq import soapy
    if soapy.available():
        pytest.skip("SoapySDR present")
    with pytest.raises(SystemExit):
        rx_fm.main(["-f", "100M", "-d", "driver=rtlsdr", "-"])


def test_activation_chatter_stays_off_data_plane(monkeypatch, capfdbinary):
    """A driver that writes to stdout during stream activation must not
    corrupt the sample stream: activation happens inside the suppression
    window (rtl_fm.c:880, convenience.c:447-466)."""
    from rx_tools_tpu.iq import sources

    def noisy_activate(self):
        os.write(1, b"CHATTER-FROM-DRIVER\n")

    monkeypatch.setattr(sources.SynthSource, "activate", noisy_activate)
    rc = rx_sdr.main(["-d", "synth=tone,amp=0.5", "-f", "100M",
                      "-s", "1024k", "-n", "2048", "-F", "CS16", "-"])
    assert rc == 0
    cap = capfdbinary.readouterr()
    assert b"CHATTER" not in cap.out          # data plane clean
    assert len(cap.out) == 2 * 2 * 2048       # exactly the CS16 samples
    assert b"CHATTER" in cap.err              # rerouted to the log plane


def test_rx_fm_level_meter(tmp_path, capsys):
    """-L N prints 'mean, max, maxmax, squelch' per N demod passes on
    stderr, first line after the very first pass (rtl_fm.c:96,792-807)."""
    cap = tmp_path / "cap.cs16"
    rx_sdr.main(["-d", "synth=tone,amp=0.3", "-f", "100M", "-s", "1024k",
                 "-n", "512k", "-F", "CS16", str(cap)])
    rc = rx_fm.main(["-f", "100M", "-M", "am", "-s", "24k", "-L", "5",
                     "-d", f"file={cap},format=CS16,rate=1024k",
                     str(tmp_path / "a.raw")])
    assert rc == 0
    lines = [l for l in capsys.readouterr().err.splitlines()
             if l.count(", ") == 3 and l.split(", ")[3] == "0"]
    assert len(lines) >= 2
    first = lines[0].split(", ")
    # mean column is a %f float; max/maxmax/squelch are ints
    assert "." in first[0] and all("." not in c for c in first[1:])
    # first line fires after ONE pass, so its 'mean' is max/interval
    assert abs(float(first[0]) - int(first[1]) / 5.0) < 1e-6
    # maxmax is cumulative: never decreases across lines
    mm = [int(l.split(", ")[2]) for l in lines]
    assert all(b >= a for a, b in zip(mm, mm[1:]))
