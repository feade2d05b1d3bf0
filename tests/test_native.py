"""Native C++ codecs/feeder vs the NumPy reference paths."""

import os

import numpy as np
import pytest

from rx_tools_tpu import native
from oracles import c_ref

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="librx_native.so not built")


def _all16():
    return np.arange(-32768, 32768, dtype=np.int16)


def test_cs8_cu8_rescale_match_oracle_dense():
    """Full int16 sweep vs the C oracle (double math, trunc-to-zero)."""
    x = _all16()
    ref8 = np.array([c_ref.i8(c_ref.ctrunc(int(v) / 32767.0 * 128.0 + 0.4))
                     for v in x], np.int8)
    np.testing.assert_array_equal(native.cs16_to_cs8(x), ref8)
    refu = np.array([c_ref.ctrunc(int(v) / 32767.0 * 128.0 + 127.4) & 0xFF
                     for v in x], np.uint8)
    np.testing.assert_array_equal(native.cs16_to_cu8(x), refu)
    refr = np.array([c_ref.i16(c_ref.ctrunc(int(v) / 32767.0 * 128.0 + 0.4))
                     for v in x], np.int16)
    np.testing.assert_array_equal(native.cs16_rescale8(x), refr)


def test_cs12_roundtrip_and_oracle():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, 3 * 1000, dtype=np.uint8)
    got = native.cs12_to_cs16(raw)
    ref = np.empty(2000, np.int16)
    b = raw.reshape(-1, 3).astype(int)
    for i, (b0, b1, b2) in enumerate(b):
        ref[2 * i] = c_ref.i16((b1 << 12) | (b0 << 4))
        ref[2 * i + 1] = c_ref.i16((b2 << 8) | (b1 & 0xF0))
    np.testing.assert_array_equal(got, ref)
    x12 = (rng.integers(-2048, 2048, 2000, dtype=np.int16) << 4).astype(np.int16)
    np.testing.assert_array_equal(native.cs12_to_cs16(native.cs16_to_cs12(x12)), x12)


def test_feeder_lossless_file(tmp_path):
    data = np.random.default_rng(1).integers(0, 256, 123457, dtype=np.uint8)
    path = tmp_path / "blob"
    path.write_bytes(data.tobytes())
    fd = os.open(str(path), os.O_RDONLY)
    try:
        f = native.Feeder(fd, 4096, depth=3, drop_on_full=False)
        chunks = []
        while True:
            b = f.read_block(timeout_ms=5000)
            if b is None:
                break
            chunks.append(b)
        got = np.concatenate(chunks)
        np.testing.assert_array_equal(got, data)
        assert f.overflows == 0
        f.close()
    finally:
        os.close(fd)


def test_formats_dispatch_uses_native():
    """The formats layer must give identical bits with/without native."""
    from rx_tools_tpu.iq import formats
    rng = np.random.default_rng(2)
    x = rng.integers(-32768, 32767, 4096).astype(np.int16)
    via_native = np.asarray(formats.cs16_to_cu8(x))
    # force the numpy path via a jax array
    import jax.numpy as jnp
    via_np = np.asarray(formats.cs16_to_cu8(jnp.asarray(x)))
    np.testing.assert_array_equal(via_native, via_np)
