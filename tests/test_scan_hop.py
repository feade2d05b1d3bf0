"""Frequency scanning E2E: rx_fm with two -f frequencies and a squelch
hops off the quiet frequency and captures the station on the other
(controller semantics, rtl_fm.c:928-932, 999-1050)."""

import functools

import numpy as np
import pytest

from rx_tools_tpu.apps import rx_fm
from rx_tools_tpu.stream import chunked


@pytest.fixture(autouse=True)
def _cpu(monkeypatch):
    monkeypatch.setenv("RX_PLATFORM", "cpu")


def _limit_blocks(monkeypatch, n):
    orig = chunked.ChunkedFmRunner.run
    monkeypatch.setattr(chunked.ChunkedFmRunner, "run",
                        functools.partialmethod(orig, max_blocks=n))


def test_scan_hops_to_station(tmp_path, monkeypatch):
    """Scan starts on 100.1M (silence -> squelched, start muted per
    rtl_fm.c:1089-1091), hops to 100.9M, and the station's 1 kHz tone
    shows up in the audio output."""
    _limit_blocks(monkeypatch, 400)
    out = tmp_path / "scan.s16"
    rc = rx_fm.main([
        "-f", "100.1M", "-f", "100.9M", "-M", "wbfm", "-l", "150",
        "-d", "synth=fm,carrier=100.9M,audio=1k,amp=0.8,noise=0.005",
        str(out)])
    assert rc == 0
    a = np.fromfile(out, np.int16).astype(np.float64)
    assert a.size > 8000, a.size           # audio WAS captured post-hop
    a = a[a.size // 4:]
    spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    peak = np.fft.rfftfreq(a.size, 1 / 32000.0)[np.argmax(spec[1:]) + 1]
    assert abs(peak - 1000.0) < 20, peak


def test_exit_on_squelch(tmp_path, monkeypatch):
    """-t negative = terminate_on_squelch (rtl_fm.c:1269-1275, 925-927):
    a quiet frequency ends the run without the block limit tripping."""
    _limit_blocks(monkeypatch, 4000)
    out = tmp_path / "quiet.s16"
    rc = rx_fm.main([
        "-f", "100.1M", "-M", "wbfm", "-l", "150", "-t", "-2",
        "-d", "synth=fm,carrier=100.9M,amp=0.8,noise=0.005",
        str(out)])
    assert rc == 0
    a = np.fromfile(out, np.int16)
    assert a.size == 0                     # squelched the whole time
