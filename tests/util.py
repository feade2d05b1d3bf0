"""Shared test helpers."""

from __future__ import annotations

import numpy as np


def snr_db(ref, test) -> float:
    """Signal-to-error ratio of ``test`` against reference ``ref`` in dB."""
    ref = np.asarray(ref, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    assert ref.shape == test.shape, (ref.shape, test.shape)
    err = ref - test
    p_sig = float(np.sum(ref * ref))
    p_err = float(np.sum(err * err))
    if p_err == 0:
        return float("inf")
    if p_sig == 0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_err)


def make_fm_cs16(n: int, fs: float = 1_020_000.0, audio_hz: float = 1000.0,
                 deviation: float = 75_000.0, offset_hz: float | None = None,
                 amp: float = 0.9, noise: float = 0.002, seed: int = 0,
                 eight_bit: bool = False) -> np.ndarray:
    """Synthetic FM carrier as interleaved CS16, optionally at the +fs/4
    capture offset the rotate stage undoes.  ``eight_bit`` quantizes to the
    ±128-in-int16 contract that rx_power expects."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    audio = np.sin(2 * np.pi * audio_hz * t)
    phase = 2 * np.pi * deviation * np.cumsum(audio) / fs
    if offset_hz is None:
        offset_hz = fs / 4
    z = amp * np.exp(1j * (phase + 2 * np.pi * offset_hz * t))
    z = z + noise * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    out = np.empty(2 * n, np.int16)
    scale, lim = (127.0, 127) if eight_bit else (32000.0, 32767)
    out[0::2] = np.clip(np.round(z.real * scale), -lim, lim).astype(np.int16)
    out[1::2] = np.clip(np.round(z.imag * scale), -lim, lim).astype(np.int16)
    return out


def make_tone_cs16(n: int, fs: float, tone_hz: float, amp: float = 0.5,
                   noise: float = 0.001, seed: int = 1,
                   eight_bit: bool = True) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    z = amp * np.exp(2j * np.pi * tone_hz * t)
    z = z + noise * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    out = np.empty(2 * n, np.int16)
    scale, lim = (127.0, 127) if eight_bit else (32000.0, 32767)
    out[0::2] = np.clip(np.round(z.real * scale), -lim, lim).astype(np.int16)
    out[1::2] = np.clip(np.round(z.imag * scale), -lim, lim).astype(np.int16)
    return out
