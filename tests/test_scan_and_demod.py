"""The scan -> detect -> demodulate pipeline (examples/scan_and_demod.py)
finds both synthetic stations and recovers both audio tones."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "examples"))


@pytest.fixture(autouse=True)
def _cpu(monkeypatch):
    monkeypatch.setenv("RX_PLATFORM", "cpu")


def _peak_hz(path, fs=32000):
    a = np.fromfile(path, np.int16).astype(np.float64)
    assert a.size > 4000, (path, a.size)
    a = a[a.size // 4:]
    spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    return np.fft.rfftfreq(a.size, 1.0 / fs)[np.argmax(spec[1:]) + 1]


def test_scan_and_demod_two_stations(tmp_path):
    import scan_and_demod
    out = tmp_path / "stations"
    scene = ("synth=fm,carrier=100.2M|100.75M,audio=1k|440,"
             "dev=50k|50k,amp=0.6|0.6,noise=0.005")
    rc = scan_and_demod.main(["100M:101M", scene, str(out)])
    assert rc == 0
    files = sorted(out.glob("ch*.s16"))
    assert len(files) == 2
    peaks = sorted(_peak_hz(f) for f in files)
    assert abs(peaks[0] - 440.0) < 20, peaks
    assert abs(peaks[1] - 1000.0) < 20, peaks


def test_find_stations_peak_picking(tmp_path):
    import scan_and_demod
    csv = tmp_path / "s.csv"
    row = ["-20"] * 100
    row[30] = "5"
    row[31] = "3"          # shoulder of the same station: merged by min_sep
    row[70] = "2"
    csv.write_text("2026-08-18, 10:00:00, 100000000, 101000000, 10000, 32, "
                   + ", ".join(row) + "\n")
    st = scan_and_demod.find_stations(str(csv), min_snr_db=10, min_sep=150e3)
    assert len(st) == 2
    assert abs(st[0] - (100e6 + 30.5 * 10e3)) < 5e3
    assert abs(st[1] - (100e6 + 70.5 * 10e3)) < 5e3
