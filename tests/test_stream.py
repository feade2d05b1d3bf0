"""Streaming runtime: scan == per-block stepping; runner plumbing;
checkpoint round-trip."""

import numpy as np
import pytest

from rx_tools_tpu.models import fmchain
from rx_tools_tpu.stream import scan as scan_mod
from rx_tools_tpu.stream.pipeline import StreamRunner
from rx_tools_tpu.stream.checkpoint import save_checkpoint, load_checkpoint
from rx_tools_tpu.iq.sources import make_source


def _cfg():
    return fmchain.FmConfig(mode="fm", rate_in=170000, rate_out=170000,
                            rate_out2=32000, downsample=6, custom_atan=1,
                            deemph_a=7, squelch_level=0.0)


def _blocks(cfg, m=4, seed=0):
    n = fmchain.block_samples(cfg, target=480)
    rng = np.random.default_rng(seed)
    return np.stack([rng.integers(-2000, 2000, 2 * n).astype(np.int16)
                     for _ in range(m)]), n


def test_scan_matches_stepping():
    cfg = _cfg()
    blocks, n = _blocks(cfg)
    st = fmchain.init_state(cfg)
    st_scan, audio_s, nv_s, lv_s = scan_mod.scan_fm_blocks(cfg, st, blocks)

    st2 = fmchain.init_state(cfg)
    outs, nvs = [], []
    for b in blocks:
        st2, a, nv, _ = fmchain.fm_chain_step(cfg, st2, b)
        outs.append(np.asarray(a))
        nvs.append(int(nv))
    np.testing.assert_allclose(np.asarray(audio_s), np.stack(outs),
                               rtol=1e-5, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(nv_s), np.array(nvs))


@pytest.mark.parametrize("kw", [
    dict(),                                           # wbfm-like default
    dict(custom_atan=0), dict(custom_atan=2), dict(custom_atan=3),
    dict(mode="am", deemph_a=0), dict(mode="usb", deemph_a=0),
    dict(mode="lsb", deemph_a=0, rate_out2=-1),
    dict(mode="raw", deemph_a=0, rate_out2=-1),
    dict(dc_block_audio=True),
    dict(post_downsample=2, rate_out2=-1, deemph_a=0),
    dict(offset_tuning=True),
    dict(squelch_level=30.0),                         # legacy path
    dict(downsample_passes=2, comp_fir_size=9,
         downsample=4, rate_out2=-1, deemph_a=0),     # legacy path
])
def test_scan_engine_bit_identical_to_stepping(kw):
    """Round-5: the batched-front scan engine must be BIT-identical to
    stepping fm_chain_step per block — the chunk-wide capture front and
    per-block seam/tail replay change nothing observable (state pytree
    included), so checkpoints, golden tests and CLI bytes are engine-
    independent.  Covers both the batched-front and legacy paths."""
    base = dict(mode="fm", rate_in=170000, rate_out=170000, rate_out2=32000,
                downsample=6, custom_atan=1, deemph_a=7, squelch_level=0.0)
    base.update(kw)
    cfg = fmchain.FmConfig(**base)
    blocks, n = _blocks(cfg, m=5, seed=3)
    st_scan, audio_s, nv_s, lv_s = scan_mod.scan_fm_blocks(
        cfg, fmchain.init_state(cfg), blocks)
    st2 = fmchain.init_state(cfg)
    outs, nvs, lvs = [], [], []
    for b in blocks:
        st2, a, nv, lv = fmchain.fm_chain_step(cfg, st2, b)
        outs.append(np.asarray(a))
        nvs.append(int(nv))
        lvs.append(float(lv))
    np.testing.assert_array_equal(np.asarray(audio_s), np.stack(outs))
    np.testing.assert_array_equal(np.asarray(nv_s), np.array(nvs))
    np.testing.assert_array_equal(np.asarray(lv_s), np.array(lvs, np.float32))
    import jax
    for got, want in zip(jax.tree.leaves(st_scan), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("kw", [dict(), dict(dc_block_audio=True)])
def test_scan_engine_bit_identical_rows_path(kw):
    """The TPU rows-resampler path (forced on CPU via the test hook):
    the scan engine's BATCHED per-block resampler
    (ops.resample.resample_rows_blocks) must still be bit-identical to
    per-block stepping, state pytree included.  Exception, pinned here:
    -E dc agrees to float rounding only — XLA's tiling of the DC mean's
    full reduce is not association-stable across program contexts (it
    drifts in the last ulp even between the legacy multi-block loop and
    single-block programs), so the dc case asserts tight allclose."""
    from rx_tools_tpu.ops import resample as rs
    from rx_tools_tpu.ops import filters as fl
    import jax
    cfg = fmchain.FmConfig(mode="fm", rate_in=171428, rate_out=171428,
                           rate_out2=32000, downsample=14, custom_atan=1,
                           deemph_a=7, squelch_level=0.0, **kw)
    n = fmchain.block_samples(cfg, target=14 * 1536)
    assert (n // 14) % 128 == 0
    rng = np.random.default_rng(4)
    blocks = np.stack([rng.integers(-2000, 2000, 2 * n).astype(np.int16)
                       for _ in range(5)])
    old = rs._ROWS_FORCE
    oldm = fl._MXU_FORCE
    rs._ROWS_FORCE = True
    fl._MXU_FORCE = True      # batched deemph path joins the identity too
    fmchain.fm_chain_step.clear_cache()
    scan_mod.scan_fm_blocks.clear_cache()
    try:
        st_scan, audio_s, nv_s, lv_s = scan_mod.scan_fm_blocks(
            cfg, fmchain.init_state(cfg), blocks)
        st2 = fmchain.init_state(cfg)
        outs, nvs = [], []
        for b in blocks:
            st2, a, nv, _ = fmchain.fm_chain_step(cfg, st2, b)
            outs.append(np.asarray(a))
            nvs.append(int(nv))
        if kw.get("dc_block_audio"):
            np.testing.assert_allclose(np.asarray(audio_s), np.stack(outs),
                                       rtol=1e-5, atol=0.01)
        else:
            np.testing.assert_array_equal(np.asarray(audio_s),
                                          np.stack(outs))
        np.testing.assert_array_equal(np.asarray(nv_s), np.array(nvs))
        for got, want in zip(jax.tree.leaves(st_scan), jax.tree.leaves(st2)):
            if kw.get("dc_block_audio"):
                np.testing.assert_allclose(np.asarray(got),
                                           np.asarray(want),
                                           rtol=1e-5, atol=0.01)
            else:
                np.testing.assert_array_equal(np.asarray(got),
                                              np.asarray(want))
    finally:
        rs._ROWS_FORCE = old
        fl._MXU_FORCE = oldm
        fmchain.fm_chain_step.clear_cache()
        scan_mod.scan_fm_blocks.clear_cache()


def test_runner_end_to_end():
    cfg = _cfg()
    n = fmchain.block_samples(cfg, target=480)
    src = make_source("synth=fm,audio=1k,dev=75k,amp=0.5,noise=0.001")
    src.set_sample_rate(cfg.rate_in)
    src.set_frequency(100e6)
    got = []

    import functools
    step = functools.partial(fmchain.fm_chain_step, cfg)
    r = StreamRunner(step, fmchain.init_state(cfg), src, n,
                     sink=lambda a, lvl: got.append(a))
    stats = r.run(max_blocks=6)
    assert stats.blocks == 6
    assert stats.samples_in == 6 * n
    total = sum(a.shape[0] for a in got)
    assert total == stats.samples_out
    # capture decim by 6 to 170k, then resample to 32k
    expect = 6 * n / cfg.downsample * 32000 / 170000
    assert abs(total - expect) <= 6


def test_runner_eof_and_overflow():
    cfg = _cfg()
    n = fmchain.block_samples(cfg, target=480)

    class FlakySource:
        def __init__(self):
            self.calls = 0

        def read_stream(self, k):
            self.calls += 1
            if self.calls == 2:
                return -4, np.empty(0, np.int16)     # overflow marker
            if self.calls >= 5:
                return 0, np.empty(0, np.int16)      # EOF
            return k, np.zeros(2 * k, np.int16)

    import functools
    step = functools.partial(fmchain.fm_chain_step, cfg)
    got = []
    r = StreamRunner(step, fmchain.init_state(cfg), FlakySource(), n,
                     sink=lambda a, lvl: got.append(a))
    stats = r.run()
    assert stats.overflows == 1
    assert stats.blocks == 3   # calls 1, 3, 4 delivered data


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    blocks, n = _blocks(cfg)
    st = fmchain.init_state(cfg)
    st, _, _, _ = scan_mod.scan_fm_blocks(cfg, st, blocks)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, st, {"block": 4})
    st2, meta = load_checkpoint(path, fmchain.init_state(cfg))
    assert meta == {"block": 4}
    for a, b in zip(
            __import__("jax").tree.leaves(st),
            __import__("jax").tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
