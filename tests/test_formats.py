"""Format conversions vs the reference's exact narrowing semantics
(rtl_sdr.c:348-391) and round-trip properties."""

import numpy as np
import pytest

from rx_tools_tpu.iq import formats
from oracles import c_ref


def _all16():
    # dense sweep of int16 space incl. edges
    return np.concatenate([
        np.arange(-32768, -32700), np.arange(-130, 130),
        np.arange(32700, 32768), np.array([0, 1, -1, 16384, -16384])
    ]).astype(np.int16)


def test_cs16_to_cs8_matches_c():
    x = _all16()
    ref = np.array([c_ref.i8(c_ref.ctrunc(int(v) / 32767.0 * 128.0 + 0.4))
                    for v in x], dtype=np.int8)
    got = formats.cs16_to_cs8(x)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_cs16_to_cu8_matches_c():
    x = _all16()
    ref = np.array([c_ref.ctrunc(int(v) / 32767.0 * 128.0 + 127.4) & 0xFF
                    for v in x], dtype=np.uint8)
    got = formats.cs16_to_cu8(x)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_cs16_rescale8_matches_c():
    x = _all16()
    ref = np.array(c_ref.rescale_cs16_to_8bit(x), dtype=np.int16)
    got = formats.cs16_rescale8(x)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_cs16_to_cf32():
    x = _all16()
    np.testing.assert_allclose(formats.cs16_to_cf32(x), x / 32767.0, rtol=1e-6)


def test_cs12_unpack_matches_c():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=3 * 1000, dtype=np.uint8)
    got = formats.cs12_to_cs16(raw)
    # C loop semantics
    ref = np.empty(2000, np.int16)
    b = raw.reshape(-1, 3).astype(int)
    for i, (b0, b1, b2) in enumerate(b):
        ref[2 * i] = c_ref.i16((b1 << 12) | (b0 << 4))
        ref[2 * i + 1] = c_ref.i16((b2 << 8) | (b1 & 0xF0))
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_cs12_roundtrip():
    rng = np.random.default_rng(1)
    # true 12-bit data: low nibble zero
    x = (rng.integers(-2048, 2048, size=2000, dtype=np.int16) << 4).astype(np.int16)
    packed = formats.cs16_to_cs12(x)
    np.testing.assert_array_equal(np.asarray(formats.cs12_to_cs16(packed)), x)


def test_convert_matrix_shapes():
    rng = np.random.default_rng(2)
    x = rng.integers(-32768, 32767, size=256, dtype=np.int16)
    for out in formats.FORMATS:
        y = formats.convert(x, "CS16", out)
        blob = formats.array_to_bytes(np.asarray(y), out)
        assert len(blob) == 128 * formats.ELEM_BYTES[out]


def test_parse_fmt():
    assert formats.parse_fmt("cs16") == "CS16"
    with pytest.raises(ValueError):
        formats.parse_fmt("CF64")
