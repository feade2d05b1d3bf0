"""I/Q sample formats and conversions.

The five wire formats of the reference (``src/rtl_sdr.c:73-95``):

========  =============================  ==========================
name      storage                        one complex sample
========  =============================  ==========================
CU8       uint8 interleaved              2 bytes
CS8       int8 interleaved               2 bytes
CS12      packed 12-bit signed           3 bytes
CS16      int16 interleaved              4 bytes
CF32      float32 interleaved            8 bytes
========  =============================  ==========================

Narrowing conversions replicate the reference bit-for-bit
(``src/rtl_sdr.c:348-391``), including the ``+0.4`` / ``+127.4`` rounding
biases with C truncation-toward-zero, and the CS12 3-bytes-to-2-samples
unpack (``src/rtl_sdr.c:354-366``).  The reference never widens (its device
always delivers CS16); the widening conversions here are the framework's own,
chosen to be exact left-inverses of the narrowing ones where possible.

Functions take either NumPy or JAX arrays and stay in the matching namespace,
so the same code path serves the host feeder and the on-device pipelines.
"""

from __future__ import annotations

import numpy as np

try:  # allow host-only use without jax present
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jax = None
    jnp = None

from rx_tools_tpu import native as _native


def _use_native(x) -> bool:
    """Host numpy arrays go through the C++ codecs when built (parity is
    golden-tested both ways in tests/test_native.py)."""
    return isinstance(x, np.ndarray) and _native.available()

FORMATS = ("CU8", "CS8", "CS12", "CS16", "CF32")

#: bytes per complex sample (I+Q element), rtl_sdr.c "elem size"
ELEM_BYTES = {"CU8": 2, "CS8": 2, "CS12": 3, "CS16": 4, "CF32": 8}

_NP_DTYPE = {"CU8": np.uint8, "CS8": np.int8, "CS16": np.int16, "CF32": np.float32}


def _xp(x):
    if jnp is not None and isinstance(x, jax.Array):
        return jnp
    return np


def parse_fmt(fmt: str) -> str:
    """Case-insensitive format name validation (rtl_sdr.c:73-95)."""
    f = fmt.upper()
    if f not in FORMATS:
        raise ValueError(f"Unsupported format: {fmt}")
    return f


def _trunc(x):
    """C double->int conversion: truncate toward zero."""
    xp = _xp(x)
    return xp.trunc(x)


# ---------------------------------------------------------------------------
# Narrowing (CS16 -> smaller), bit-faithful to rtl_sdr.c / rtl_fm.c
# ---------------------------------------------------------------------------

def cs16_to_cs8(x):
    """``(int16)v / 32767.0 * 128.0 + 0.4`` truncated (rtl_sdr.c:367-374)."""
    if _use_native(x):
        return _native.cs16_to_cs8(x.ravel()).reshape(x.shape)
    xp = _xp(x)
    v = _trunc(x.astype(xp.float32) / np.float32(32767.0) * np.float32(128.0)
               + np.float32(0.4))
    return v.astype(xp.int8)


def cs16_to_cu8(x):
    """``(int16)v / 32767.0 * 128.0 + 127.4`` truncated (rtl_sdr.c:375-382)."""
    if _use_native(x):
        return _native.cs16_to_cu8(x.ravel()).reshape(x.shape)
    xp = _xp(x)
    v = _trunc(x.astype(xp.float32) / np.float32(32767.0) * np.float32(128.0)
               + np.float32(127.4))
    return v.astype(xp.uint8)


def cs16_to_cf32(x):
    """``v / SHRT_MAX`` (rtl_sdr.c:383-391)."""
    if _use_native(x):
        return _native.cs16_to_cf32(x.ravel()).reshape(x.shape)
    xp = _xp(x)
    return x.astype(xp.float32) / np.float32(32767.0)


def cs16_rescale8(x):
    """rx_fm capture rescale: int16 full-scale -> ±128-range **int16**.

    ``(int16_t)(buf[i] / 32767.0 * 128.0 + 0.4)`` — reference
    ``src/rtl_fm.c:845-848``.  Keeps rtl_fm's legacy 8-bit numerics while
    staying in int16 storage.
    """
    if _use_native(x):
        return _native.cs16_rescale8(x.ravel()).reshape(x.shape)
    xp = _xp(x)
    v = _trunc(x.astype(xp.float32) / np.float32(32767.0) * np.float32(128.0)
               + np.float32(0.4))
    return v.astype(xp.int16)


def cs12_to_cs16(raw):
    """Unpack CS12: 3 bytes -> 2 int16 samples (rtl_sdr.c:354-366).

    ``s0 = (b1 << 12) | (b0 << 4)``; ``s1 = (b2 << 8) | (b1 & 0xf0)`` with
    int16 wraparound.  ``raw`` is a uint8 array of length divisible by 3.
    """
    if _use_native(raw):
        return _native.cs12_to_cs16(raw.ravel())
    xp = _xp(raw)
    b = raw.reshape(-1, 3).astype(xp.int32)
    s0 = (b[:, 1] << 12) | (b[:, 0] << 4)
    s1 = (b[:, 2] << 8) | (b[:, 1] & 0xF0)
    out = xp.stack([s0, s1], axis=-1).reshape(-1)
    return out.astype(xp.int16)  # wraps mod 2^16, matching C int16 store


def cs16_to_cs12(x):
    """Pack int16 pairs -> CS12 bytes; left-inverse of :func:`cs12_to_cs16`
    for values whose low 4 bits are zero (true 12-bit data)."""
    if _use_native(x):
        return _native.cs16_to_cs12(x.ravel())
    xp = _xp(x)
    v = x.reshape(-1, 2).astype(xp.int32) & 0xFFFF
    b0 = (v[:, 0] >> 4) & 0xFF
    b1 = ((v[:, 0] >> 12) & 0x0F) | (v[:, 1] & 0xF0)
    b2 = (v[:, 1] >> 8) & 0xFF
    return xp.stack([b0, b1, b2], axis=-1).reshape(-1).astype(xp.uint8)


# ---------------------------------------------------------------------------
# Widening (-> CS16).  Framework-defined: CU8/CS8 use the rtl-sdr driver
# idiom ((v - 128) << 8 / v << 8) for ecosystem compatibility with files
# produced by stock drivers.  NOTE this makes CU8 -> CS16 -> CU8 round
# trips off by at most 1 LSB against the reference's +127.4-biased
# narrowing (which its hardware-fed pipeline never composes with a widen);
# CS12 and CF32 round-trip exactly.
# ---------------------------------------------------------------------------

def cu8_to_cs16(x):
    """uint8 -> int16 full scale: ``(v - 128) << 8`` (rtl-sdr driver idiom)."""
    if _use_native(x):
        return _native.cu8_to_cs16(x.ravel()).reshape(x.shape)
    xp = _xp(x)
    return ((x.astype(xp.int16) - 128) << 8).astype(xp.int16)


def cs8_to_cs16(x):
    if _use_native(x):
        return _native.cs8_to_cs16(x.ravel()).reshape(x.shape)
    xp = _xp(x)
    return (x.astype(xp.int16) << 8).astype(xp.int16)


def cf32_to_cs16(x):
    if _use_native(x):
        return _native.cf32_to_cs16(x.ravel()).reshape(x.shape)
    xp = _xp(x)
    v = xp.clip(xp.round(x * np.float32(32767.0)), -32768, 32767)
    return v.astype(xp.int16)


# ---------------------------------------------------------------------------
# Float internal representation (the fast TPU path)
#
# Internally the fast pipelines use float32 in the ±128 "8-bit" range so all
# reference magnitudes (squelch levels, output_scale, discriminator scaling)
# carry over unchanged.
# ---------------------------------------------------------------------------

def to_float(x, fmt: str):
    """Decode a raw buffer of ``fmt`` into interleaved float32, ±128 range."""
    xp = _xp(x)
    fmt = parse_fmt(fmt)
    if fmt == "CU8":
        return x.astype(xp.float32) - np.float32(127.4)
    if fmt == "CS8":
        return x.astype(xp.float32)
    if fmt == "CS16":
        return x.astype(xp.float32) * np.float32(128.0 / 32767.0)
    if fmt == "CF32":
        return x.astype(xp.float32) * np.float32(128.0)
    if fmt == "CS12":
        return cs12_to_cs16(x).astype(xp.float32) * np.float32(128.0 / 32767.0)
    raise ValueError(fmt)


def convert(x, in_fmt: str, out_fmt: str):
    """General format conversion.

    The reference restricts pairs to {identity, CS16->anything, CS12->CS16}
    (rtl_sdr.c:202-208); this framework supports the full matrix by widening
    through CS16 first.  The restricted pairs reproduce the reference output
    bit-for-bit.
    """
    in_fmt, out_fmt = parse_fmt(in_fmt), parse_fmt(out_fmt)
    if in_fmt == out_fmt:
        return x
    wide = {"CU8": cu8_to_cs16, "CS8": cs8_to_cs16, "CS12": cs12_to_cs16,
            "CF32": cf32_to_cs16, "CS16": lambda v: v}[in_fmt](x)
    return {"CU8": cs16_to_cu8, "CS8": cs16_to_cs8, "CS12": cs16_to_cs12,
            "CF32": cs16_to_cf32, "CS16": lambda v: v}[out_fmt](wide)


def bytes_to_array(buf: bytes, fmt: str) -> np.ndarray:
    """Raw bytes -> interleaved sample array (host side)."""
    fmt = parse_fmt(fmt)
    if fmt == "CS12":
        return np.frombuffer(buf, dtype=np.uint8)
    return np.frombuffer(buf, dtype=_NP_DTYPE[fmt])


def array_to_bytes(x: np.ndarray, fmt: str) -> bytes:
    fmt = parse_fmt(fmt)
    want = np.uint8 if fmt == "CS12" else _NP_DTYPE[fmt]
    return np.asarray(x, dtype=want).tobytes()
