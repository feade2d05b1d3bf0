"""Multi-channel demodulation: several FM stations in one wideband capture,
all recovered simultaneously; per-channel result matches a single-channel
chain run at that offset."""

import math

import numpy as np
import jax.numpy as jnp

from rx_tools_tpu.models import channelizer


def _scene(fs, n, stations, seed=0):
    """stations: list of (offset_hz, audio_hz, dev_hz, amp)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    z = np.zeros(n, np.complex128)
    for off, tone, dev, amp in stations:
        dphi = 2 * np.pi * dev * np.sin(2 * np.pi * tone * t) / fs
        z += amp * np.exp(1j * (2 * np.pi * off * t + np.cumsum(dphi)))
    z += 0.001 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    iq = np.empty(2 * n, np.int16)
    iq[0::2] = np.clip(np.round(np.real(z) * 16000), -32768, 32767)
    iq[1::2] = np.clip(np.round(np.imag(z) * 16000), -32768, 32767)
    return iq


def _tone_of(audio, rate):
    a = np.asarray(audio, np.float64)
    a = a - a.mean()
    sp = np.abs(np.fft.rfft(a * np.hanning(a.size))) ** 2
    return np.fft.rfftfreq(a.size, 1.0 / rate)[np.argmax(sp)]


def test_three_stations_at_once():
    fs = 1_024_000
    stations = [(-300e3, 700.0, 5e3, 0.4),
                (0.0,    1100.0, 5e3, 0.4),
                (250e3,  1700.0, 5e3, 0.4)]
    cfg = channelizer.ChannelizerConfig(
        capture_rate=fs, offsets=(-300e3, 0.0, 250e3), downsample=32,
        custom_atan=1)
    n = channelizer.block_samples(cfg, target=fs // 4)
    iq = _scene(fs, 4 * n, stations)
    st = channelizer.init_state(cfg)
    parts = []
    for k in range(4):
        st, audio, nv = channelizer.channelize_step(
            cfg, st, jnp.asarray(iq[k * 2 * n:(k + 1) * 2 * n]))
        parts.append(np.asarray(audio))
    audio = np.concatenate(parts, axis=1)        # (C, total)
    ch_rate = cfg.channel_rate
    for c, (_, tone, _, _) in enumerate(stations):
        got = _tone_of(audio[c, ch_rate // 100:], ch_rate)
        assert abs(got - tone) < 20, (c, got, tone)


def test_block_seam_continuity():
    """Two carried blocks == one concatenated block (NCO phase carry)."""
    fs = 512_000
    cfg = channelizer.ChannelizerConfig(
        capture_rate=fs, offsets=(100e3,), downsample=16, custom_atan=0)
    n = channelizer.block_samples(cfg, target=8192)
    iq = _scene(fs, 2 * n, [(100e3, 900.0, 4e3, 0.5)], seed=1)
    st = channelizer.init_state(cfg)
    _, a_full, _ = channelizer.channelize_step(cfg, st, jnp.asarray(iq))

    st2 = channelizer.init_state(cfg)
    st2, c1, _ = channelizer.channelize_step(cfg, st2, jnp.asarray(iq[: 2 * n]))
    st2, c2, _ = channelizer.channelize_step(cfg, st2, jnp.asarray(iq[2 * n:]))
    split = np.concatenate([np.asarray(c1)[0], np.asarray(c2)[0]])
    np.testing.assert_allclose(split, np.asarray(a_full)[0], atol=2.0)
