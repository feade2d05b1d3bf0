"""rx_heatmap: CSV parsing/stitching, PNG validity, and the tone showing
up as the hottest column — E2E from a real rx_power sweep."""

import struct
import zlib

import numpy as np
import pytest

from rx_tools_tpu.apps import rx_heatmap


def _decode_png(path):
    blob = open(path, "rb").read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, {}
    while pos < len(blob):
        (ln,), tag = struct.unpack(">I", blob[pos:pos+4]), blob[pos+4:pos+8]
        chunks.setdefault(tag, b"")
        chunks[tag] += blob[pos+8:pos+8+ln]
        pos += 12 + ln
    w, h, depth, ctype = struct.unpack(">IIBB", chunks[b"IHDR"][:10])
    assert depth == 8 and ctype == 2
    raw = zlib.decompress(chunks[b"IDAT"])
    rows = np.frombuffer(raw, np.uint8).reshape(h, 1 + 3 * w)
    assert (rows[:, 0] == 0).all()           # filter 0 per row
    return rows[:, 1:].reshape(h, w, 3)


def test_parse_stitches_hops():
    lines = [
        "2026-08-18, 10:00:00, 100000000, 100000400, 100.0, 32, 1, 2, 3, 4",
        "2026-08-18, 10:00:00, 100000400, 100000800, 100.0, 32, 5, 6, 7, 8",
        "2026-08-18, 10:00:10, 100000000, 100000400, 100.0, 32, 9, 9, 9, 9",
    ]
    times, f_lo, step, data = rx_heatmap.parse_csv(lines)
    assert times == ["2026-08-18 10:00:00", "2026-08-18 10:00:10"]
    assert f_lo == 100000000 and step == 100.0
    assert data.shape == (2, 8)
    np.testing.assert_array_equal(data[0], [1, 2, 3, 4, 5, 6, 7, 8])
    assert np.isnan(data[1, 4:]).all()


def test_png_roundtrip(tmp_path):
    rgb = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    p = tmp_path / "x.png"
    rx_heatmap.write_png(str(p), rgb)
    np.testing.assert_array_equal(_decode_png(p), rgb)


def test_e2e_tone_is_hottest_column(tmp_path, monkeypatch):
    monkeypatch.setenv("RX_PLATFORM", "cpu")
    from rx_tools_tpu.apps import rx_power
    csv = tmp_path / "sweep.csv"
    rc = rx_power.main(["-f", "100M:101M:25k", "-1",
                        "-d", "synth=tone,carrier=100.4M,amp=0.5",
                        str(csv)])
    assert rc == 0
    png = tmp_path / "sweep.png"
    rc = rx_heatmap.main([str(csv), str(png)])
    assert rc == 0
    rgb = _decode_png(png)
    # hottest column (by red-channel heat) must sit at the tone's bin
    times, f_lo, step, data = rx_heatmap.parse_csv(open(csv))
    col = int(np.argmax(np.nan_to_num(data[0], nan=-1e9)))
    heat = rgb[0, :, 0].astype(int) * 2 + rgb[0, :, 1].astype(int)
    assert abs(int(np.argmax(heat)) - col) <= 1
    assert rgb.shape[1] == data.shape[1]


def test_width_pooling_keeps_peak(tmp_path):
    lines = ["2026-08-18, 10:00:00, 100000000, 100003200, 100.0, 32, " +
             ", ".join("0" if i != 17 else "40" for i in range(32))]
    times, f_lo, step, data = rx_heatmap.parse_csv(lines)
    png = tmp_path / "w.png"
    import sys
    rc = rx_heatmap.main(["--width", "8", "--db", "0:40",
                          str(_write_csv(tmp_path, lines)), str(png)])
    assert rc == 0
    rgb = _decode_png(png)
    assert rgb.shape[1] <= 8
    # the 40 dB spike survives max-pooling: its pooled column is hottest
    heat = rgb[0, :, 0].astype(int) * 2 + rgb[0, :, 1].astype(int)
    assert np.argmax(heat) == 17 // 4


def _write_csv(tmp_path, lines):
    p = tmp_path / "in.csv"
    p.write_text("\n".join(lines) + "\n")
    return p
