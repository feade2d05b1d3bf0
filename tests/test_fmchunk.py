"""The scan-free chunk engine must match the scanned engine exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from rx_tools_tpu.models import fmchain, fmchunk
from rx_tools_tpu.stream.scan import scan_fm_blocks, gather_valid


def _blocks(cfg, m, seed=0, amp=2000):
    n = fmchain.block_samples(cfg, target=480)
    rng = np.random.default_rng(seed)
    return rng.integers(-amp, amp, (m, 2 * n)).astype(np.int16), n


CONFIGS = [
    dict(mode="fm", rate_in=170000, rate_out=170000, rate_out2=32000,
         downsample=6, custom_atan=1, deemph_a=7),
    dict(mode="fm", rate_in=96000, rate_out=24000, rate_out2=-1,
         downsample=10, custom_atan=0, post_downsample=4,
         dc_block_audio=True, dc_block_raw=True),
    dict(mode="am", rate_in=24000, rate_out=24000, rate_out2=-1,
         downsample=4, output_scale=2, offset_tuning=True),
    dict(mode="usb", rate_in=24000, rate_out=24000, rate_out2=-1,
         downsample=6),
    dict(mode="fm", rate_in=48000, rate_out=48000, rate_out2=-1,
         downsample=8, custom_atan=1, squelch_level=50.0),
]


@pytest.mark.parametrize("kw", CONFIGS)
def test_chunk_matches_scan(kw):
    cfg = fmchain.FmConfig(**kw)
    blocks, n = _blocks(cfg, m=6)
    st = fmchain.init_state(cfg)
    st_s, audio_s, nv_s, lv_s = scan_fm_blocks(cfg, st, jnp.asarray(blocks))
    scan_audio = gather_valid(np.asarray(audio_s), np.asarray(nv_s))

    st_c, audio_c, nv_c, lv_c = fmchunk.fm_chunk_step(cfg, st, jnp.asarray(blocks))
    flat_audio = np.asarray(audio_c)[: int(nv_c)]

    np.testing.assert_allclose(flat_audio, scan_audio, rtol=1e-4, atol=0.02)
    np.testing.assert_allclose(np.asarray(lv_c), np.asarray(lv_s), rtol=1e-4)
    # carried state must agree so engines can interleave
    for name, a, b in zip(st_s._fields,
                          __import__("jax").tree.leaves(st_s),
                          __import__("jax").tree.leaves(st_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-2, err_msg=str(name))


def test_chunk_then_scan_interoperate():
    """Chunk engine's carry feeds the scanned engine seamlessly."""
    cfg = fmchain.FmConfig(**CONFIGS[0])
    blocks, n = _blocks(cfg, m=8, seed=3)
    st = fmchain.init_state(cfg)
    # reference: all 8 via scan
    _, a_ref, nv_ref, _ = scan_fm_blocks(cfg, st, jnp.asarray(blocks))
    ref = gather_valid(np.asarray(a_ref), np.asarray(nv_ref))
    # first 4 via chunk engine, then 4 via scan
    st2, a1, nv1, _ = fmchunk.fm_chunk_step(cfg, st, jnp.asarray(blocks[:4]))
    _, a2, nv2, _ = scan_fm_blocks(cfg, st2, jnp.asarray(blocks[4:]))
    got = np.concatenate([np.asarray(a1)[: int(nv1)],
                          gather_valid(np.asarray(a2), np.asarray(nv2))])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=0.02)


def test_unsupported_config_rejected():
    cfg = fmchain.FmConfig(mode="fm", downsample_passes=2)
    assert not fmchunk.supports(cfg)
