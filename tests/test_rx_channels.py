"""rx_channels CLI: PFB and mixer engines end to end from a synth scene."""

import numpy as np
import pytest

from rx_tools_tpu.apps import rx_channels


@pytest.fixture(autouse=True)
def _cpu(monkeypatch):
    monkeypatch.setenv("RX_PLATFORM", "cpu")


def _peak_hz(path, fs):
    a = np.fromfile(path, np.int16).astype(np.float64)
    assert a.size > 4000, path
    a = a[a.size // 4:]
    spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    return np.fft.rfftfreq(a.size, 1.0 / fs)[np.argmax(spec[1:]) + 1]


def test_pfb_engine_recovers_station(tmp_path):
    out = tmp_path / "out"
    # station exactly on channel 3 of a 16-channel PFB over 1.024 MS/s
    fs, d, k = 1_024_000, 16, 3
    station = 100e6 + k * fs / d
    rc = rx_channels.main([
        "-f", "100M", "-s", str(fs), "-n", str(d), "-M", "fm", "-A", "std",
        "-c", "off", "-r", "32k", "-e", "1",
        "-d", f"synth=fm,carrier={station:.0f},audio=1k,dev=15k,amp=0.8",
        str(out)])
    assert rc == 0
    chans = sorted(out.glob("ch*.s16"))
    assert len(chans) == d
    target = [p for p in chans if f"_{int(station)}" in p.name]
    assert len(target) == 1
    assert abs(_peak_hz(target[0], 32000) - 1000.0) < 30


def test_mixer_engine_recovers_station(tmp_path):
    out = tmp_path / "out"
    rc = rx_channels.main([
        "-f", "100M", "-s", "1024k", "-k", "100.2M,100.35M", "-D", "16",
        "-M", "fm", "-A", "std", "-c", "off", "-r", "32k", "-e", "1",
        "-d", "synth=fm,carrier=100.2M,audio=1k,dev=15k,amp=0.8",
        str(out)])
    assert rc == 0
    chans = sorted(out.glob("ch*.s16"))
    assert len(chans) == 2
    assert abs(_peak_hz(chans[0], 32000) - 1000.0) < 30


def test_validation():
    assert rx_channels.main(["-f", "100M", "-n", "8", "-k", "100M", "x"]) == 1
    assert rx_channels.main(["-f", "100M", "-s", "1024k", "-k", "101M",
                             "x"]) == 1          # outside capture bw
    with pytest.raises(SystemExit):
        rx_channels.main([])                     # no outdir / freq
