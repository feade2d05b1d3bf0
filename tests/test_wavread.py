"""WAV capture replay: header auto-detection in the file source."""

import io

import numpy as np
import pytest

from rx_tools_tpu.iq import wavread
from rx_tools_tpu.iq.sources import make_source
from rx_tools_tpu.utils.wav import wav_header


def _wav_file(tmp_path, rate=1_024_000, payload=None, stereo=True):
    p = tmp_path / "cap.wav"
    data = wav_header(rate, stereo=stereo)
    if payload is not None:
        data += payload.tobytes()
    p.write_bytes(data)
    return p


def test_wav_auto_detected(tmp_path):
    rng = np.random.default_rng(0)
    iq = rng.integers(-30000, 30000, 2 * 500).astype(np.int16)
    p = _wav_file(tmp_path, rate=1_024_000, payload=iq)
    src = make_source(f"file={p}")
    assert src.sample_rate == 1_024_000.0        # taken from the header
    n, buf = src.read_stream(500)
    assert n == 500
    np.testing.assert_array_equal(buf, iq)
    src.close()


def test_explicit_format_disables_probe(tmp_path):
    """format=CS16 pins the wire format: the header bytes ARE the data."""
    p = _wav_file(tmp_path, payload=np.zeros(4, np.int16))
    src = make_source(f"file={p},format=CS16,rate=2048k")
    n, buf = src.read_stream(4)
    hdr = np.frombuffer(wav_header(1_024_000, stereo=True)[:16], np.int16)
    np.testing.assert_array_equal(buf[:8], hdr[:8])
    src.close()


def test_non_wav_file_unchanged(tmp_path):
    iq = np.arange(64, dtype=np.int16)
    p = tmp_path / "cap.cs16"
    p.write_bytes(iq.tobytes())
    src = make_source(f"file={p}")
    n, buf = src.read_stream(32)
    assert n == 32
    np.testing.assert_array_equal(buf, iq)
    src.close()


def test_mono_wav_rejected(tmp_path):
    p = _wav_file(tmp_path, payload=np.zeros(8, np.int16), stereo=False)
    with pytest.raises(ValueError, match="needs 2"):
        make_source(f"file={p}")


def test_parse_wav_skips_extra_chunks():
    blob = (b"RIFF\xff\xff\xff\xffWAVE"
            b"LIST" + (4).to_bytes(4, "little") + b"INFO"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
            + (48000).to_bytes(4, "little") + (192000).to_bytes(4, "little")
            + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
            + b"data\xff\xff\xff\xff")
    f = io.BytesIO(blob + b"PAYLOAD")
    info, consumed = wavread.parse_wav(f.read)
    assert info == wavread.WavInfo(48000, 2, 16)
    assert consumed == blob
    assert f.read() == b"PAYLOAD"


def test_parse_non_wav_returns_consumed():
    f = io.BytesIO(b"\x01\x02\x03\x04 definitely not a wav....")
    info, consumed = wavread.parse_wav(f.read)
    assert info is None
    assert consumed == b"\x01\x02\x03\x04 definit"[:12]


def test_wav_loop_mode_skips_header_on_wrap(tmp_path):
    """Loop mode must rewind to the data chunk, not byte 0: otherwise
    every pass after the first streams the RIFF header as I/Q samples."""
    iq = np.full(2 * 100, 1234, np.int16)
    p = _wav_file(tmp_path, rate=1_024_000, payload=iq)
    src = make_source(f"file={p},loop=1")
    n, buf = src.read_stream(350)           # 3.5 passes over the payload
    assert n == 350
    np.testing.assert_array_equal(buf, np.full(2 * 350, 1234, np.int16))
    src.close()
