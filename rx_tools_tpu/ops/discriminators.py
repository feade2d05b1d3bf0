"""FM discriminators (quadrature demodulation).

The reference offers four per-sample discriminators selected by ``-A``
(``fm_demod`` dispatch, ``src/rtl_fm.c:584-615``); all compute the angle of
``s[n] * conj(s[n-1])`` in units where pi == ``1<<14``, using the literal
3.14159 (not M_PI) as the scale divisor (``src/rtl_fm.c:482``) — that literal
is preserved here for output parity.

- ``std``  — true atan2 (``polar_discriminant``, ``rtl_fm.c:476-483``)
- ``fast`` — octant linear-blend approximation (``fast_atan2``,
  ``rtl_fm.c:485-506``), reproduced in float arithmetic
- ``lut``  — the reference's 512 KB atan LUT (``rtl_fm.c:515-564``),
  reproduced bit-faithfully: the identical table (host-built with libm
  ``atan`` exactly like ``atan_lut_init``) lives device-resident and the
  index arithmetic keeps C truncating integer division — including the
  reference's x==0 quirk where a tiny SAME-sign phase delta returns
  ``1<<14`` (pi) instead of ~0 because the else-branch fires with
  ``atan_lut[0] == 0`` (``rtl_fm.c:557-561``); golden-tested bit-exact
  against the oracle
- ``ale``  — the atan-free Esbensen discriminator (``rtl_fm.c:566-582``)

Block-vectorized: the per-sample C loop becomes one fused elementwise pass
over the block; ``prev`` (the reference's ``pre_r/pre_j``) is the one-sample
carried state.  Quirk kept: sample 0 of every block uses the *std* atan2
regardless of mode — exactly what ``fm_demod`` does for the seam sample
(``rtl_fm.c:588-590``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

DISC_STD, DISC_FAST, DISC_LUT, DISC_ALE = 0, 1, 2, 3
_NAMES = {"std": DISC_STD, "fast": DISC_FAST, "lut": DISC_LUT, "ale": DISC_ALE}

_PI_REF = np.float32(3.14159)       # the reference's scale constant
_SCALE = np.float32(1 << 14)


def disc_mode(name: str) -> int:
    return _NAMES[name]


def polar_discriminant(cr, cj):
    """angle(c) scaled so pi -> 1<<14, via true atan2."""
    return jnp.arctan2(cj, cr) / _PI_REF * _SCALE


def fast_atan2(y, x):
    """Float port of the integer octant approximation (rtl_fm.c:485-506).

    pi4 = 1<<12, pi34 = 3<<12; linear blend on (x-|y|)/(x+|y|).
    """
    pi4 = np.float32(1 << 12)
    pi34 = np.float32(3 * (1 << 12))
    yabs = jnp.abs(y)
    pos = pi4 - pi4 * (x - yabs) / (x + yabs)
    neg = pi34 - pi4 * (x + yabs) / (yabs - x)
    angle = jnp.where(x >= 0, pos, neg)
    angle = jnp.where((x == 0) & (y == 0), 0.0, angle)
    return jnp.where(y < 0, -angle, angle)


def polar_disc_fast(cr, cj):
    return fast_atan2(cj, cr)


_ATAN_LUT_COEF = 8                       # rtl_fm.c:92
_ATAN_LUT_SIZE = 131072                  # rtl_fm.c:93
_atan_lut_cache = None


def _atan_lut_host():
    """The reference's LUT, built exactly like ``atan_lut_init``
    (rtl_fm.c:515-526): libm double atan, the 3.14159 literal, C int cast
    (truncation; entries are non-negative so == floor). 512 KB as int32 in
    the reference; values fit int16 but int32 is kept for a cheap gather."""
    global _atan_lut_cache
    if _atan_lut_cache is None:
        import math
        _atan_lut_cache = np.array(
            [int(math.atan(i / (1 << _ATAN_LUT_COEF)) / 3.14159 * (1 << 14))
             for i in range(_ATAN_LUT_SIZE)], np.int32)
    return _atan_lut_cache


def polar_disc_lut(cr, cj):
    """Bit-faithful LUT discriminator (``polar_disc_lut``, rtl_fm.c:528-564).

    Inputs are rounded to int32 first: the reference's ``lp[]`` is int16 so
    its ``cr``/``cj`` are exact integers, and the LUT output is itself
    quantized to pi/2**14 — rounding is the closest float-chain analog of
    that integer domain. Valid domain |cj| <= 2**23 (so ``cj << 8`` fits
    int32), which covers the reference's own assumption ("absolute maximum
    2097152", rtl_fm.c:548).

    Quirks reproduced on purpose (all golden-tested):
      - C truncating division in ``x = (cj << 8) / cr``;
      - the x==0 else-branch: a same-sign pair with |angle| < atan(1/256)
        returns ``1<<14`` (cj>0) or 0 (cj<0) — rtl_fm.c:557-561;
      - saturation to +/-(1<<13) when |x| >= the table size;
      - the cr==0 / cj==0 special-case ladder (rtl_fm.c:535-546).

    Pass INTEGER ``cr``/``cj`` for bit-exactness over the reference's full
    domain: float32 products are only integer-exact below 2**24, so
    :func:`fm_discriminate` computes the complex products for this mode in
    int32 from the rounded I/Q stream (advisor finding, round 2).  Float
    inputs are still accepted (rounded) for callers in the small-signal
    domain.
    """
    lut = jnp.asarray(_atan_lut_host())
    if jnp.issubdtype(jnp.asarray(cr).dtype, jnp.integer):
        cri = jnp.asarray(cr, jnp.int32)
        cji = jnp.asarray(cj, jnp.int32)
    else:
        cri = jnp.round(cr).astype(jnp.int32)
        cji = jnp.round(cj).astype(jnp.int32)
    num = cji << _ATAN_LUT_COEF
    den = jnp.where(cri == 0, 1, cri)               # guarded; masked below
    # C '/' truncates toward zero
    x = jnp.sign(num) * jnp.sign(den) * (jnp.abs(num) // jnp.abs(den))
    x_abs = jnp.abs(x)
    l = lut[jnp.clip(x_abs, 0, _ATAN_LUT_SIZE - 1)]
    pos = jnp.where(cji > 0, l, l - (1 << 14))
    neg = jnp.where(cji > 0, (1 << 14) - l, -l)
    r = jnp.where(x > 0, pos, neg)
    r = jnp.where(x_abs >= _ATAN_LUT_SIZE,
                  jnp.where(cji > 0, 1 << 13, -(1 << 13)), r)
    r = jnp.where((cji == 0) & (cri > 0), 0, r)
    r = jnp.where((cji == 0) & (cri < 0), 1 << 14, r)
    r = jnp.where((cri == 0) & (cji > 0), 1 << 13, r)
    r = jnp.where((cri == 0) & (cji < 0), -(1 << 13), r)
    r = jnp.where((cri == 0) & (cji == 0), 0, r)
    return r.astype(jnp.float32)


def esbensen_disc(ar, aj, br, bj):
    """Atan-free: ``imag(ds * conj(s)) / |s|^2`` (rtl_fm.c:566-582).

    ``(ar,aj)`` = current sample, ``(br,bj)`` = previous (note: the
    reference's +1 in the denominator guards integer div-by-zero; kept for
    value parity).
    """
    scaled_pi = np.float32(2608.0)   # (1<<14) / (2*pi), reference constant
    dr = (br - ar) * 2.0
    dj = (bj - aj) * 2.0
    cj = bj * dr - br * dj
    return scaled_pi * cj / (ar * ar + aj * aj + 1.0)


def fm_discriminate_batch(prev, x, mode: int):
    """Batched discriminator over a channel stack: ``prev`` (C, 2),
    ``x`` (C, M, 2) -> ``(new_prev (C, 2), d (C, M))``.

    Same semantics as vmapping :func:`fm_discriminate`, but the per-block
    seam sample (std atan2 at index 0, rtl_fm.c:588-590) is written with a
    batched concatenate instead of C scattered 1-element updates — scatters
    in a vmapped tail measurably dominate the channelizers (docs/PERF.md).
    """
    xs = jnp.concatenate([prev[:, None, :], x], axis=1)    # (C, M+1, 2)
    ar, aj = x[..., 0], x[..., 1]
    br, bj = xs[:, :-1, 0], xs[:, :-1, 1]
    cr = ar * br + aj * bj
    cj = aj * br - ar * bj
    if mode == DISC_STD:
        d = polar_discriminant(cr, cj)
    elif mode in (DISC_FAST, DISC_LUT, DISC_ALE):
        if mode == DISC_LUT:
            # int32 products — full-domain exactness (see fm_discriminate)
            ai, ji = jnp.round(ar).astype(jnp.int32), jnp.round(aj).astype(jnp.int32)
            bi, qi = jnp.round(br).astype(jnp.int32), jnp.round(bj).astype(jnp.int32)
            d = polar_disc_lut(ai * bi + ji * qi, ji * bi - ai * qi)
        else:
            d = (polar_disc_fast(cr, cj) if mode == DISC_FAST
                 else esbensen_disc(ar, aj, br, bj))
        d = jnp.concatenate(
            [polar_discriminant(cr[:, :1], cj[:, :1]), d[:, 1:]], axis=1)
    else:
        raise ValueError(f"bad discriminator mode {mode}")
    return x[:, -1, :], d


def fm_discriminate_batch_planar(prev, zi, zq, mode: int):
    """Planar batched discriminator: ``zi``/``zq`` (C, M), ``prev`` (C, 2).

    Planar twin of :func:`fm_discriminate_batch` (same semantics incl.
    the per-block std-atan seam at column 0); consumes channel-planar
    streams so nothing slices a 2-wide trailing axis at rate
    (docs/PERF.md round-3 construct rules).  Returns
    ``(new_prev (C, 2), d (C, M))``.
    """
    ar, aj = zi, zq
    br = jnp.concatenate([prev[:, 0][:, None], zi[:, :-1]], axis=1)
    bj = jnp.concatenate([prev[:, 1][:, None], zq[:, :-1]], axis=1)
    cr = ar * br + aj * bj
    cj = aj * br - ar * bj
    if mode == DISC_STD:
        d = polar_discriminant(cr, cj)
    elif mode in (DISC_FAST, DISC_LUT, DISC_ALE):
        if mode == DISC_LUT:
            ai, ji = jnp.round(ar).astype(jnp.int32), jnp.round(aj).astype(jnp.int32)
            bi, qi = jnp.round(br).astype(jnp.int32), jnp.round(bj).astype(jnp.int32)
            d = polar_disc_lut(ai * bi + ji * qi, ji * bi - ai * qi)
        else:
            d = (polar_disc_fast(cr, cj) if mode == DISC_FAST
                 else esbensen_disc(ar, aj, br, bj))
        d = jnp.concatenate(
            [polar_discriminant(cr[:, :1], cj[:, :1]), d[:, 1:]], axis=1)
    else:
        raise ValueError(f"bad discriminator mode {mode}")
    return jnp.stack([zi[:, -1], zq[:, -1]], axis=-1), d


def fm_discriminate_planar(prev, zi, zq, mode: int,
                           seam_stride: int | None = None):
    """Planar-I/Q FM discriminator: ``zi``/``zq`` (K,) float32.

    Same semantics as :func:`fm_discriminate` on ``stack([zi, zq], -1)``
    (incl. the per-buffer std-atan seam quirk, ``fm_demod``
    rtl_fm.c:588-590), but consuming planar streams: the previous sample
    is a contiguous concat+shift, never a 2-wide-axis slice — the
    construct distinction worth 60x on TPU (docs/PERF.md round-3
    campaign).  Returns ``(new_prev (2,), d (K,))``.
    """
    ar, aj = zi, zq
    br = jnp.concatenate([prev[0][None], zi[:-1]])
    bj = jnp.concatenate([prev[1][None], zq[:-1]])
    cr = ar * br + aj * bj
    cj = aj * br - ar * bj
    if mode == DISC_STD:
        d = polar_discriminant(cr, cj)
    elif mode in (DISC_FAST, DISC_LUT, DISC_ALE):
        if mode == DISC_FAST:
            d = polar_disc_fast(cr, cj)
        elif mode == DISC_LUT:
            # int32 products — full-domain exactness (see fm_discriminate)
            ai, ji = jnp.round(ar).astype(jnp.int32), jnp.round(aj).astype(jnp.int32)
            bi, qi = jnp.round(br).astype(jnp.int32), jnp.round(bj).astype(jnp.int32)
            d = polar_disc_lut(ai * bi + ji * qi, ji * bi - ai * qi)
        else:
            d = esbensen_disc(ar, aj, br, bj)
        if seam_stride is None:
            d = d.at[0].set(polar_discriminant(cr[0], cj[0]))
        else:
            idx = jnp.arange(0, d.shape[0], seam_stride)
            d = d.at[idx].set(polar_discriminant(cr[idx], cj[idx]))
    else:
        raise ValueError(f"bad discriminator mode {mode}")
    return jnp.stack([zi[-1], zq[-1]]), d


def fm_discriminate(prev, x, mode: int, seam_stride: int | None = None):
    """Vectorized FM discriminator over a block (or a whole flat chunk).

    ``prev``: (2,) previous complex sample (carried).  ``x``: (N, 2).
    Returns ``(new_prev, d)`` with ``d`` shape (N,) in pi==1<<14 units.

    The reference computes sample 0 of *every read buffer* with the std
    atan2 regardless of ``-A`` mode (``fm_demod``, rtl_fm.c:588-590).
    Per-block callers get that from the default (seam at index 0);
    flat-chunk callers pass ``seam_stride`` = samples per block so every
    interior block seam keeps the same quirk and the two engines agree
    bit-for-bit.
    """
    xs = jnp.concatenate([prev[None, :], x], axis=0)   # (N+1, 2)
    ar, aj = x[:, 0], x[:, 1]
    br, bj = xs[:-1, 0], xs[:-1, 1]
    # c = a * conj(b)
    cr = ar * br + aj * bj
    cj = aj * br - ar * bj
    if mode == DISC_STD:
        d = polar_discriminant(cr, cj)
    elif mode in (DISC_FAST, DISC_LUT, DISC_ALE):
        if mode == DISC_FAST:
            d = polar_disc_fast(cr, cj)
        elif mode == DISC_LUT:
            # products in int32 from the rounded stream: float32 products
            # are integer-exact only below 2**24, which would flip the
            # LUT's truncating division at the reference's full lp range
            # (advisor finding, round 2)
            ai, ji = jnp.round(ar).astype(jnp.int32), jnp.round(aj).astype(jnp.int32)
            bi, qi = jnp.round(br).astype(jnp.int32), jnp.round(bj).astype(jnp.int32)
            d = polar_disc_lut(ai * bi + ji * qi, ji * bi - ai * qi)
        else:
            d = esbensen_disc(ar, aj, br, bj)
        if seam_stride is None:
            d = d.at[0].set(polar_discriminant(cr[0], cj[0]))
        else:
            idx = jnp.arange(0, d.shape[0], seam_stride)
            d = d.at[idx].set(polar_discriminant(cr[idx], cj[idx]))
    else:
        raise ValueError(f"bad discriminator mode {mode}")
    return x[-1], d
