"""Windowed power-spectrum kernels (the rx_power compute path).

The reference's per-hop hot loop (``scanner``, ``src/rtl_power.c:670-772``)
windows each ``bin_len`` segment with int coefficients, runs a fixed-point
radix-2 FFT (``fix_fft``, ``rtl_power.c:264-320``) with an unconditional
``>>1`` per stage (net ``1/n`` scaling), and accumulates ``|X|^2`` into
int64 bins.  TPU re-design:

- all segments of a block are batched into one ``(n_segments, bin_len)``
  complex FFT — the reference's serial ``offset`` loop becomes a batch
  dimension (SURVEY.md §2.6 "Batched-FFT parallel within a hop");
- the FFT is float (complex64) with an explicit ``1/n`` to match the
  fix_fft scaling, and ``|X|^2`` is pre-scaled by ``2^16`` so accumulator
  units match the reference's (its int window coefs carry a ×256 gain:
  ``rtl_power.c:1036``, window multiply ``:747-758``);
- input is expected in the ±128 "8-bit" float range.  (Feeding raw
  full-scale CS16 through the reference's int16 window multiply *wraps* —
  a latent reference bug inherited from 8-bit rtl_power; the float path
  fixes it while keeping identical dBm calibration for in-contract data.)

The CSV-side quirks of ``csv_dbm`` (``rtl_power.c:774-817``) — DC-bin nuke,
fftshift, crop, trailing duplicate bin — live in :func:`fftshift_quirks` /
:func:`power_to_dbm` so the CLI can reproduce reference output exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

#: |X_int|^2 / |X_float|^2 for the reference's ×256 integer window coefs
COEF_GAIN_SQ = np.float32(65536.0)


def remove_dc(x):
    """Per-component mean removal (``remove_dc``, rtl_power.c:609-624)."""
    return x - jnp.mean(x, axis=-2, keepdims=True)


def segmented_power_spectrum(x, win, avg, samples, downsample: int,
                             peak_hold: bool = False):
    """Window + batched FFT + |X|^2 accumulate.

    ``x``: (n_segments, bin_len, 2) float32 I/Q in ±128 range (already
    decimated).  ``win``: (bin_len,) float window.  ``avg``: (bin_len,)
    accumulator carried across integration intervals; ``samples``: () int32
    sample counter (reference counts ``+= downsample`` per segment,
    rtl_power.c:769).

    Returns ``(avg, samples)`` updated.
    """
    z = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
    zw = z * win.astype(jnp.float32)[None, :]
    n = x.shape[-2]
    X = jnp.fft.fft(zw, axis=-1) * jnp.float32(1.0 / n)
    p = (jnp.real(X) ** 2 + jnp.imag(X) ** 2) * COEF_GAIN_SQ
    if peak_hold:
        avg = jnp.maximum(avg, jnp.max(p, axis=0))
    else:
        avg = avg + jnp.sum(p, axis=0)
    samples = samples + jnp.int32(x.shape[0] * downsample)
    return avg, samples


def total_power(x):
    """Giant-bin (bin_e == 0) path: pooled sum of squares with DC
    correction (``rms_power``, rtl_power.c:403-429).  ``x``: (N, 2)."""
    v = x.reshape(-1)
    n = v.shape[0]
    t = jnp.sum(v)
    p = jnp.sum(v * v)
    dc = t / n
    err = t * 2.0 * dc - dc * dc * n
    return p - err


def fftshift_quirks(avg):
    """csv_dbm pre-output fixups (rtl_power.c:782-791): nuke the DC bin by
    copying bin 1, then rotate by N/2 (the FFT "translated by 180°")."""
    avg = avg.at[0].set(avg[1]) if hasattr(avg, "at") else _np_set0(avg)
    half = avg.shape[0] // 2
    return jnp.concatenate([avg[half:], avg[:half]]) if hasattr(avg, "at") \
        else np.concatenate([avg[half:], avg[:half]])


def _np_set0(avg):
    avg = np.array(avg)
    avg[0] = avg[1]
    return avg


def power_to_dbm(avg, rate: float, samples: int):
    """``10*log10(avg / rate / samples)`` (rtl_power.c:800-806)."""
    xp = jnp if hasattr(avg, "at") else np
    return 10.0 * xp.log10(avg / rate / max(int(samples), 1))
