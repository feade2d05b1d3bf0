"""Envelope and product detectors (AM / USB / LSB / raw).

Reference: ``am_demod`` (``src/rtl_fm.c:617-632``), ``usb_demod``
(``:634-644``), ``lsb_demod`` (``:646-656``), ``raw_demod`` (``:658-665``).
All are single fused elementwise passes; ``output_scale`` is the reference's
``(1<<15) / (128 * downsample)`` gain restore (``rtl_fm.c:988-992``).
"""

from __future__ import annotations

import jax.numpy as jnp


def am_demod(x, output_scale: float = 1.0):
    """Envelope: ``sqrt(I^2 + Q^2) * scale``; (N, 2) -> (N,)."""
    p = x[:, 0] * x[:, 0] + x[:, 1] * x[:, 1]
    return jnp.sqrt(p) * jnp.float32(output_scale)


def usb_demod(x, output_scale: float = 1.0):
    """Product detection, upper sideband: ``(I + Q) * scale``."""
    return (x[:, 0] + x[:, 1]) * jnp.float32(output_scale)


def lsb_demod(x, output_scale: float = 1.0):
    """Product detection, lower sideband: ``(I - Q) * scale``."""
    return (x[:, 0] - x[:, 1]) * jnp.float32(output_scale)
