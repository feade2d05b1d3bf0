"""PFB channelizer: channel mapping, streaming seam, FM demod through a
channel, stopband rejection, and agreement with the mixer channelizer."""

import numpy as np
import jax.numpy as jnp
import pytest

from rx_tools_tpu import ops
from rx_tools_tpu.models import channelizer, pfb
from util import snr_db

FS = 1_024_000
D = 16


def _cfg(mode="raw", **kw):
    return pfb.PfbConfig(capture_rate=FS, n_channels=D, taps_per_branch=8,
                         mode=mode, **kw)


def _tone_block(n, f, amp=100.0, fm_audio=None, deviation=75e3, seed=0,
                noise=0.01):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    if fm_audio is None:
        z = amp * np.exp(2j * np.pi * f * t / FS)
    else:
        audio = np.sin(2 * np.pi * fm_audio * t / FS)
        phase = 2 * np.pi * (f * t / FS) + \
            2 * np.pi * deviation * np.cumsum(audio) / FS
        z = amp * np.exp(1j * phase)
    z = z + rng.normal(0, noise, n) + 1j * rng.normal(0, noise, n)
    blk = np.empty(2 * n, np.int16)
    blk[0::2] = np.round(np.real(z) * 256)
    blk[1::2] = np.round(np.imag(z) * 256)
    return blk


@pytest.mark.parametrize("k", [0, 1, 5, 8, 13])
def test_channel_mapping_and_rejection(k):
    """A tone at channel k's center lands in channel k; every other
    channel is down by the prototype's stopband (>= 40 dB)."""
    cfg = _cfg()
    n = pfb.block_samples(cfg, target=32768)
    f = cfg.channel_freqs()[k]
    blk = _tone_block(n, f)
    st = pfb.init_state(cfg)
    tail, zi, zq = pfb.filterbank(cfg, st.tail, jnp.asarray(blk))
    e = np.asarray((zi ** 2 + zq ** 2).sum(axis=1))
    assert np.argmax(e) == k
    others = np.delete(e, k)
    assert 10 * np.log10(others.max() / e[k]) < -40


def test_streaming_seam_bit_exact():
    """Two half blocks through the carried tail == one full block."""
    cfg = _cfg()
    n = pfb.block_samples(cfg, target=32768)
    rng = np.random.default_rng(1)
    blk = rng.integers(-8000, 8000, 2 * n).astype(np.int16)
    st0 = pfb.init_state(cfg).tail
    _, fi, fq = pfb.filterbank(cfg, st0, jnp.asarray(blk))
    t1, h1i, h1q = pfb.filterbank(cfg, st0, jnp.asarray(blk[:n]))
    _, h2i, h2q = pfb.filterbank(cfg, t1, jnp.asarray(blk[n:]))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(h1i), np.asarray(h2i)], axis=1),
        np.asarray(fi))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(h1q), np.asarray(h2q)], axis=1),
        np.asarray(fq))


def test_fm_demod_through_channel():
    """WBFM station at channel 3's center: pfb_step recovers the 1 kHz
    audio tone in channel 3's output."""
    cfg = _cfg(mode="fm", custom_atan=0,
               deemph_a=0, rate_out2=32000)
    n = pfb.block_samples(cfg, target=131072)
    k = 3
    # noise floor above the -47 dB cross-channel leakage: an FM
    # discriminator is amplitude-invariant, so leaked signal above noise
    # would otherwise (correctly!) demodulate the same tone elsewhere
    blk = _tone_block(n, cfg.channel_freqs()[k], fm_audio=1000.0,
                      deviation=20e3, noise=1.0)
    st = pfb.init_state(cfg)
    st, audio, n_valid = pfb.pfb_step(cfg, st, jnp.asarray(blk))
    def tone_prominence(ch):
        a = np.asarray(audio[ch, : int(n_valid[ch])], np.float64)
        a = a[len(a) // 4:]
        spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
        freqs = np.fft.rfftfreq(a.size, 1 / 32000.0)
        peak = freqs[np.argmax(spec[1:]) + 1]
        return peak, spec.max() / np.mean(spec)

    peak, prom = tone_prominence(k)
    assert abs(peak - 1000.0) < 30, peak
    assert prom > 50, prom
    # an empty FM channel demodulates to broadband static (physically
    # correct), so assert absence of the tone, not absence of audio
    _, prom_quiet = tone_prominence(k + 4)
    assert prom_quiet < prom / 5, (prom, prom_quiet)


def test_matches_mixer_channelizer_on_grid():
    """Same uniform grid: the PFB and the mixer channelizer both recover
    the same station; the PFB's Kaiser prototype rejects the adjacent
    channel far harder than the mixer's boxcar."""
    cfgp = _cfg(mode="fm", custom_atan=0, rate_out2=-1)
    offs = cfgp.channel_freqs()
    cfgm = channelizer.ChannelizerConfig(
        capture_rate=FS, offsets=tuple(offs), downsample=D, mode="fm",
        custom_atan=0, deemph_a=0, rate_out2=-1)
    n = pfb.block_samples(cfgp, target=131072)
    k = 5
    blk = _tone_block(n, offs[k], fm_audio=1000.0, deviation=20e3)

    stp = pfb.init_state(cfgp)
    _, ap, nvp = pfb.pfb_step(cfgp, stp, jnp.asarray(blk))
    stm = channelizer.init_state(cfgm)
    _, am, nvm = channelizer.channelize_step(cfgm, stm, jnp.asarray(blk))

    def peak_hz(a):
        a = np.asarray(a, np.float64)
        a = a[len(a) // 4:]
        spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
        return np.fft.rfftfreq(a.size, D / FS)[np.argmax(spec[1:]) + 1]

    assert abs(peak_hz(ap[k]) - 1000.0) < 30
    assert abs(peak_hz(am[k]) - 1000.0) < 30
    # audio agreement between the two implementations: their anti-alias
    # filters differ in group delay, so align by the best lag first, then
    # require SNR-bounded agreement
    cut = 2048     # skip both filters' startup transients
    ref = np.asarray(am[k], np.float64)[cut:-cut]
    got = np.asarray(ap[k], np.float64)
    best = max(snr_db(ref, got[cut + lag: cut + lag + ref.size])
               for lag in range(-8, 9))
    assert best > 10, best


# ---------------------------------------------------------------------------
# Round-5 time-major formulation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kw", [
    dict(mode="fm", custom_atan=1, deemph_a=7, rate_out2=32000),
    dict(mode="fm", custom_atan=0),
    dict(mode="fm", custom_atan=3, deemph_a=7),
    dict(mode="am", rate_out2=32000),
    dict(mode="usb"),
])
def test_tmaj_matches_channel_major(kw):
    """pfb_step_tmaj == pfb_step (audio transposed) while streaming —
    the time-major formulation changes layout/association only.
    Chained over 3 blocks so the (T+1)-frame tail carry, the deemph/
    resampler state and the derived seam frame are all exercised."""
    cfg = _cfg(**kw)
    n = pfb.block_samples(cfg, target=4096)
    m = n // D
    assert m % 128 == 0, m
    st_cm = pfb.init_state(cfg)
    st_tm = pfb.init_state_tmaj(cfg)
    for b in range(3):
        blk = _tone_block(n, 3.3 * FS / D, amp=90, fm_audio=700,
                          seed=10 + b, noise=0.5)
        st_cm, a_cm, nv_cm = pfb.pfb_step(cfg, st_cm, jnp.asarray(blk))
        st_tm, a_tm, nv_tm = pfb.pfb_step_tmaj(cfg, st_tm, jnp.asarray(blk))
        a_cm, a_tm = np.asarray(a_cm), np.asarray(a_tm)
        nv_cm, nv_tm = np.asarray(nv_cm), int(nv_tm)
        assert int(nv_cm[0]) == nv_tm, (nv_cm[0], nv_tm, b)
        got = a_tm.T[:, :nv_tm]                     # (D, valid)
        want = a_cm[:, :nv_tm]
        scale = max(1.0, float(np.abs(want).max()))
        np.testing.assert_allclose(got / scale, want / scale,
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"block {b}")


def test_tmaj_raw_packing():
    """raw mode returns the (M, 2D) channel matrix itself (Re|Im halves)."""
    cfg = _cfg(mode="raw")
    n = pfb.block_samples(cfg, target=4096)
    st_cm = pfb.init_state(cfg)
    st_tm = pfb.init_state_tmaj(cfg)
    blk = _tone_block(n, 2.0 * FS / D, amp=80, seed=4)
    _, a_cm, nv_cm = pfb.pfb_step(cfg, st_cm, jnp.asarray(blk))
    _, a_tm, nv_tm = pfb.pfb_step_tmaj(cfg, st_tm, jnp.asarray(blk))
    a_tm = np.asarray(a_tm)                          # (M, 2D)
    m = a_tm.shape[0]
    # channel-major raw audio is per-channel interleaved I/Q
    a_cm = np.asarray(a_cm).reshape(D, m, 2)
    np.testing.assert_allclose(a_tm[:, :D].T, a_cm[..., 0],
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(a_tm[:, D:].T, a_cm[..., 1],
                               rtol=1e-5, atol=1e-3)


def test_resample_tmaj_periodic_matches_general():
    """The periodic-mask time-major resampler == the csum-based one
    (same emission grid, valid counts and carried state; window sums
    reassociate within f32 noise) while streaming."""
    from rx_tools_tpu.ops.resample import ResampleState
    rng = np.random.default_rng(41)
    for fast, slow in ((37500, 32000), (48000, 32000), (75000, 32000),
                       (3, 2), (5, 4), (256, 255)):   # gate-edge ratios
        d_ch = 16
        st_a = ResampleState(jnp.zeros((d_ch,), jnp.float32),
                             jnp.zeros((d_ch,), jnp.int32))
        st_b = st_a
        for blk in range(3):
            x = jnp.asarray(rng.normal(0, 5000, (1024, d_ch))
                            .astype(np.float32))
            st_a, ya, nva = pfb._resample_tmaj(st_a, x, fast, slow)
            st_b, yb, nvb = pfb._resample_tmaj_periodic(st_b, x, fast, slow)
            assert int(nva) == int(nvb), (fast, slow, blk)
            np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                       rtol=1e-4, atol=0.5,
                                       err_msg=f"{fast}/{slow} blk {blk}")
            np.testing.assert_allclose(np.asarray(st_a.acc),
                                       np.asarray(st_b.acc),
                                       rtol=1e-4, atol=0.5)
            assert int(st_a.phase[0]) == int(st_b.phase[0])


def test_fuzz_pfb_engines():
    """Differential fuzz: random PFB configs through the channel-major
    and time-major engines on structured scenes must agree (tmaj layout/
    association only) — breadth beyond the hand-picked configs."""
    from rx_tools_tpu.models import pfb as _pfb
    rng = np.random.default_rng(99)
    for trial in range(10):
        d_ch = int(rng.choice([8, 16, 32]))
        mode = str(rng.choice(["fm", "fm", "am", "usb"]))
        cfg = _pfb.PfbConfig(
            capture_rate=FS, n_channels=d_ch,
            taps_per_branch=int(rng.choice([4, 8])),
            mode=mode,
            custom_atan=int(rng.choice([0, 1, 3])) if mode == "fm" else 0,
            deemph_a=int(rng.choice([0, 7])) if mode == "fm" else 0,
            rate_out2=int(rng.choice([-1, 32000])))
        n = _pfb.block_samples(cfg, target=16384)
        if (n // d_ch) % 128:
            continue
        k_on = int(rng.integers(0, d_ch))
        blk0 = _tone_block(2 * n, (k_on if k_on < d_ch / 2 else k_on - d_ch)
                           * FS / d_ch, amp=80, fm_audio=700, seed=trial,
                           noise=0.4)
        st_cm, st_tm = _pfb.init_state(cfg), _pfb.init_state_tmaj(cfg)
        for b in range(2):
            blk = jnp.asarray(blk0[b * 2 * n: (b + 1) * 2 * n])
            st_cm, a_cm, nv_cm = _pfb.pfb_step(cfg, st_cm, blk)
            st_tm, a_tm, nv_tm = _pfb.pfb_step_tmaj(cfg, st_tm, blk)
            assert int(nv_cm[0]) == int(nv_tm), (trial, b, cfg)
            got = np.asarray(a_tm).T[:, : int(nv_tm)]
            want = np.asarray(a_cm)[:, : int(nv_tm)]
            scale = max(1.0, float(np.abs(want).max()))
            np.testing.assert_allclose(
                got / scale, want / scale, rtol=2e-3, atol=6e-3,
                err_msg=f"trial {trial} blk {b} {cfg}")
