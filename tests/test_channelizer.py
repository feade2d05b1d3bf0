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


# ---------------------------------------------------------------------------
# Round-5 time-major mixer (integer NCO + fold-the-mix-into-the-decimator)
# ---------------------------------------------------------------------------

def test_mixer_tmaj_matches_channel_major():
    """channelize_step_tmaj == channelize_step (audio transposed) while
    streaming: the mix+decimate dot and the exact integer NCO change
    association/phase representation only."""
    import jax.numpy as jnp
    from rx_tools_tpu.models import channelizer as chan
    fs, d = 1_024_000, 16
    cfg = chan.ChannelizerConfig(
        capture_rate=fs, offsets=(192_000.0, -64_000.0, 17_000.0),
        downsample=d, mode="fm", custom_atan=1, deemph_a=7,
        rate_out2=32_000)
    n = chan.block_samples(cfg, target=32768)
    assert chan.tmaj_supported(cfg, n)
    rng = np.random.default_rng(3)
    # structured scene (an FM carrier near each station + mild noise):
    # the discriminator of near-zero NOISE vectors is chaotic, so raw
    # random input would amplify the two engines' ~1e-6 mix differences
    t_all = np.arange(3 * n)
    z = np.zeros(3 * n, np.complex128)
    for off in (192_000, -64_000, 17_000):
        au = np.sin(2 * np.pi * (700 + off % 997) * t_all / fs)
        ph = 2 * np.pi * off * t_all / fs + \
            2 * np.pi * 12e3 * np.cumsum(au) / fs
        z += 40 * np.exp(1j * ph)
    z += rng.normal(0, 0.5, 3 * n) + 1j * rng.normal(0, 0.5, 3 * n)
    iq_all = np.empty(2 * 3 * n, np.int16)
    iq_all[0::2] = np.round(np.real(z) * 64)
    iq_all[1::2] = np.round(np.imag(z) * 64)
    st_cm = chan.init_state(cfg)
    st_tm = chan.init_state_tmaj(cfg)
    for b in range(3):
        blk = iq_all[b * 2 * n: (b + 1) * 2 * n]
        st_cm, a_cm, nv_cm = chan.channelize_step(cfg, st_cm,
                                                  jnp.asarray(blk))
        st_tm, a_tm, nv_tm = chan.channelize_step_tmaj(cfg, st_tm,
                                                       jnp.asarray(blk))
        assert int(nv_cm[0]) == int(nv_tm)
        got = np.asarray(a_tm).T[:, : int(nv_tm)]
        want = np.asarray(a_cm)[:, : int(nv_tm)]
        scale = max(1.0, float(np.abs(want).max()))
        np.testing.assert_allclose(got / scale, want / scale,
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"block {b}")


def test_mixer_tmaj_recovers_fm_station():
    """A station at +192 kHz demodulates to its 1 kHz tone through the
    time-major mixer (3 chained blocks; exact NCO keeps phase across)."""
    import jax.numpy as jnp
    from rx_tools_tpu.models import channelizer as chan
    fs, d, off = 1_024_000, 16, 192_000
    cfg = chan.ChannelizerConfig(
        capture_rate=fs, offsets=(float(off), -200_000.0),
        downsample=d, mode="fm", custom_atan=0, deemph_a=0,
        rate_out2=32_000)
    n = chan.block_samples(cfg, target=65536)
    t = np.arange(3 * n)
    audio = np.sin(2 * np.pi * 1000 * t / fs)
    phase = 2 * np.pi * off * t / fs + \
        2 * np.pi * 15e3 * np.cumsum(audio) / fs
    z = 90 * np.exp(1j * phase)
    iq = np.empty(2 * 3 * n, np.int16)
    iq[0::2] = np.round(np.real(z) * 256)
    iq[1::2] = np.round(np.imag(z) * 256)
    st = chan.init_state_tmaj(cfg)
    outs = []
    for b in range(3):
        st, a, nv = chan.channelize_step_tmaj(
            cfg, st, jnp.asarray(iq[b * 2 * n: (b + 1) * 2 * n]))
        outs.append(np.asarray(a)[: int(nv), 0])
    a = np.concatenate(outs)[500:]
    spec = np.abs(np.fft.rfft((a - a.mean()) * np.hanning(a.size)))
    pk = np.fft.rfftfreq(a.size, 1 / 32000)[np.argmax(spec[1:]) + 1]
    assert abs(pk - 1000.0) < 20


def test_fuzz_channelizer_engines():
    """Differential fuzz: random mixer configs through the channel-major
    and time-major engines on structured scenes (an FM carrier near every
    station) must agree — catches phase/seam/ratio interactions across
    the (offsets x D x mode x deemph x resample) space."""
    import jax.numpy as jnp
    from rx_tools_tpu.models import channelizer as chan
    rng = np.random.default_rng(77)
    fs = 1_024_000
    for trial in range(12):
        d = int(rng.choice([8, 16, 32]))
        n_ch = int(rng.integers(2, 5))
        offs = tuple(float(v) for v in rng.choice(
            np.arange(-fs // 2 + 30000, fs // 2 - 30000, 1000),
            n_ch, replace=False))
        mode = str(rng.choice(["fm", "fm", "am", "usb", "lsb"]))
        cfg = chan.ChannelizerConfig(
            capture_rate=fs, offsets=offs, downsample=d, mode=mode,
            custom_atan=int(rng.choice([0, 1, 3])) if mode == "fm" else 0,
            deemph_a=int(rng.choice([0, 7])) if mode == "fm" else 0,
            rate_out2=int(rng.choice([-1, 32000, 24000])))
        n = chan.block_samples(cfg, target=16384)
        if (n // d) % 128 or not chan.tmaj_supported(cfg, n):
            continue
        t = np.arange(2 * n)
        z = np.zeros(2 * n, np.complex128)
        for off in offs:
            au = np.sin(2 * np.pi * (500 + abs(off) % 800) * t / fs)
            ph = (2 * np.pi * off * t / fs
                  + 2 * np.pi * 9e3 * np.cumsum(au) / fs)
            z += 35 * np.exp(1j * ph)
        z += rng.normal(0, 0.3, 2 * n) + 1j * rng.normal(0, 0.3, 2 * n)
        iq = np.empty(4 * n, np.int16)
        iq[0::2] = np.round(np.real(z) * 64)
        iq[1::2] = np.round(np.imag(z) * 64)
        st_cm, st_tm = chan.init_state(cfg), chan.init_state_tmaj(cfg)
        for b in range(2):
            blk = jnp.asarray(iq[b * 2 * n: (b + 1) * 2 * n])
            st_cm, a_cm, nv_cm = chan.channelize_step(cfg, st_cm, blk)
            st_tm, a_tm, nv_tm = chan.channelize_step_tmaj(cfg, st_tm, blk)
            assert int(nv_cm[0]) == int(nv_tm), (trial, b, cfg)
            got = np.asarray(a_tm).T[:, : int(nv_tm)]
            want = np.asarray(a_cm)[:, : int(nv_tm)]
            scale = max(1.0, float(np.abs(want).max()))
            np.testing.assert_allclose(
                got / scale, want / scale, rtol=2e-3, atol=6e-3,
                err_msg=f"trial {trial} blk {b} {cfg}")
