"""--int-audio tier: the device integer chain matches the bit-faithful C
model (oracles.c_ref.full_demod) bit-for-bit, chained across blocks."""

import numpy as np
import pytest

from rx_tools_tpu.models import fmchain, fmint
from oracles import c_ref


def _oracle_state(cfg):
    s = c_ref.DemodState()
    s.mode = cfg.mode
    s.downsample = cfg.downsample
    s.custom_atan = cfg.custom_atan
    s.post_downsample = cfg.post_downsample
    s.deemph_a = cfg.deemph_a
    s.dc_block_audio = cfg.dc_block_audio
    s.rate_out = cfg.rate_out
    s.rate_out2 = cfg.rate_out2
    s.output_scale = cfg.output_scale
    return s


def _run_oracle(cfg, blocks):
    s = _oracle_state(cfg)
    out = []
    for blk in blocks:
        lp = c_ref.rescale_cs16_to_8bit(blk)
        if not cfg.offset_tuning:
            lp = c_ref.rotate16_90(lp)
        out += c_ref.full_demod(s, lp)
    return np.asarray(out, np.int64)


def _run_int(cfg, blocks):
    st = fmint.init_state()
    out = []
    for blk in blocks:
        st, audio = fmint.int_chain_block(cfg, st, blk)
        out.append(audio.astype(np.int64))
    return np.concatenate(out)


def _blocks(cfg, m=3, target=480, seed=0, amp=28000):
    n = fmchain.block_samples(cfg, target=target)
    rng = np.random.default_rng(seed)
    return [rng.integers(-amp, amp, 2 * n).astype(np.int16)
            for _ in range(m)]


CASES = [
    # the wbfm-preset shape: fast atan, deemph, resample 170k->32k
    dict(mode="fm", custom_atan=1, deemph_a=13, rate_in=170000,
         rate_out=170000, rate_out2=32000, downsample=6),
    # LUT discriminator + DC block, no resampler
    dict(mode="fm", custom_atan=2, deemph_a=0, dc_block_audio=True,
         rate_in=96000, rate_out=96000, rate_out2=-1, downsample=4),
    # esbensen + post-downsample 4 + deemph + resample
    dict(mode="fm", custom_atan=3, deemph_a=7, post_downsample=4,
         rate_in=170000, rate_out=170000, rate_out2=24000, downsample=5),
    # AM envelope (double-sqrt truncation) with scale
    dict(mode="am", output_scale=2, rate_in=48000, rate_out=48000,
         rate_out2=-1, downsample=7),
    # USB/LSB product detectors
    dict(mode="usb", output_scale=1, rate_in=24000, rate_out=24000,
         rate_out2=-1, downsample=8),
    dict(mode="lsb", output_scale=3, rate_in=24000, rate_out=24000,
         rate_out2=12000, downsample=8),
]


@pytest.mark.parametrize("case", CASES,
                         ids=[f"{c['mode']}-a{c.get('custom_atan', 0)}"
                              f"-d{c['downsample']}" for c in CASES])
def test_int_chain_bit_exact_vs_oracle(case):
    cfg = fmchain.FmConfig(**case)
    assert fmint.supports(cfg)
    blocks = _blocks(cfg, seed=hash(str(case)) % 1000)
    got = _run_int(cfg, blocks)
    want = _run_oracle(cfg, blocks)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_array_equal(got, want)


def test_int_chain_rejects_uncovered_configs():
    for bad in (dict(custom_atan=0), dict(squelch_level=10.0),
                dict(downsample_passes=2), dict(dc_block_raw=True),
                dict(mode="raw")):
        kw = dict(mode="fm", custom_atan=1, rate_in=170000,
                  rate_out=170000, rate_out2=32000, downsample=6)
        kw.update(bad)
        assert not fmint.supports(fmchain.FmConfig(**kw))


def test_int_audio_cli_bit_exact(tmp_path, monkeypatch):
    """rx_fm --int-audio E2E: the CLI's PCM equals the oracle replay of
    the same capture bit-for-bit."""
    monkeypatch.setenv("RX_PLATFORM", "cpu")
    from rx_tools_tpu.apps import rx_fm, rx_sdr
    cap = tmp_path / "cap.cs16"
    assert rx_sdr.main(["-d", "synth=fm,audio=1k,dev=50k,amp=0.7,"
                        "noise=0.01,carrier=100.3M",
                        "-f", "100.75M", "-s", "1020k", "-n", "160k",
                        "-F", "CS16", str(cap)]) == 0
    out = tmp_path / "a.pcm"
    rc = rx_fm.main(["-f", "100.3M", "-M", "wbfm", "--int-audio",
                     "-d", f"file={cap},format=CS16,rate=1020k", str(out)])
    assert rc == 0
    got = np.fromfile(out, np.int16).astype(np.int64)
    assert got.size > 3000

    # oracle replay: same planned capture chain on the same file bytes
    from rx_tools_tpu.iq.sources import make_source
    from rx_tools_tpu.models import fmchain as fc
    cfg = fc.FmConfig(mode="fm", rate_in=170000, rate_out=170000,
                      rate_out2=32000, downsample=6, custom_atan=1,
                      post_downsample=1, deemph_a=13,
                      squelch_level=0.0)
    cfg, _, _ = fc.plan_capture(cfg, 100.3e6, 0)
    n = fc.block_samples(cfg)
    src = make_source(f"file={cap},format=CS16,rate=1020k")
    s = _oracle_state(cfg)
    want = []
    while True:
        rn, buf = src.read_stream(n)
        if rn < n:
            break
        lp = c_ref.rescale_cs16_to_8bit(buf[: 2 * n])
        lp = c_ref.rotate16_90(lp)
        want += c_ref.full_demod(s, lp)
    want = np.asarray(want, np.int64)
    assert got.size == want.size
    np.testing.assert_array_equal(got, want)


def test_int_audio_cli_rejects_uncovered(tmp_path, monkeypatch):
    monkeypatch.setenv("RX_PLATFORM", "cpu")
    from rx_tools_tpu.apps import rx_fm
    rc = rx_fm.main(["-f", "100M", "-M", "fm", "-A", "std", "--int-audio",
                     "-d", "synth=fm", str(tmp_path / "x.pcm")])
    assert rc == 1
