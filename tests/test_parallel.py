"""Sharded execution on the 8-device virtual CPU mesh: time shards with
halo warm-up vs the unsharded run; hop shards vs the batched sweep."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rx_tools_tpu.models import fmchain, powerscan
from rx_tools_tpu.parallel import (
    make_mesh, time_sharded_fm, shard_recording,
    hop_sharded_sweep, shard_hop_blocks)
from rx_tools_tpu.stream import scan as scan_mod
from util import snr_db

S = 4          # shards (<= device count 8)
WARMUP = 2


def _cfg(**kw):
    base = dict(mode="fm", rate_in=170000, rate_out=170000, rate_out2=32000,
                downsample=6, custom_atan=1, deemph_a=7)
    base.update(kw)
    return fmchain.FmConfig(**base)


def _recording(cfg, blocks_per_shard=4, seed=0):
    n = fmchain.block_samples(cfg, target=480)
    total = S * blocks_per_shard * n
    rng = np.random.default_rng(seed)
    return rng.integers(-2000, 2000, 2 * total).astype(np.int16), n


def test_time_sharded_matches_unsharded():
    cfg = _cfg()
    iq, n = _recording(cfg)
    mesh = make_mesh(S, axis="t")
    sharded = shard_recording(iq, S, n)              # (S, M, 2n)
    audio_sh, nv_sh, carry = time_sharded_fm(cfg, jnp.asarray(sharded),
                                             mesh=mesh, warmup=WARMUP)
    audio_sh, nv_sh = np.asarray(audio_sh), np.asarray(nv_sh)

    # unsharded truth
    st = fmchain.init_state(cfg)
    blocks = sharded.reshape(-1, sharded.shape[-1])
    _, audio_u, nv_u, _ = scan_mod.scan_fm_blocks(cfg, st, jnp.asarray(blocks))
    audio_u = np.asarray(audio_u).reshape(S, -1, audio_u.shape[-1])
    nv_u = np.asarray(nv_u).reshape(S, -1)

    m = sharded.shape[1]
    for s in range(S):
        got = np.concatenate([audio_sh[s, i, : nv_sh[s, i]] for i in range(m)])
        ref = np.concatenate([audio_u[s, i, : nv_u[s, i]] for i in range(m)])
        # emission grids coincide (phase seeded analytically) => equal lengths
        assert got.shape == ref.shape, (s, got.shape, ref.shape)
        # round-4 exact IIR handoff: EVERY shard matches the unsharded
        # run with no skip window (the deemph state is carried in closed
        # form and the resampler remainder recovered from the halo —
        # parallel/timeshard.py module docstring)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=0.1, err_msg=str(s))


def _fm_dc_recording(cfg, blocks_per_shard=4, seed=0, offset_hz=5000.0):
    """Synthetic FM capture with a constant carrier-frequency offset: the
    discriminator output then has a large DC level, so the audio DC
    block's EMA state actually matters at every shard seam (pure noise
    would exercise the -E dc path with near-zero corrections)."""
    n = fmchain.block_samples(cfg, target=480)
    total = S * blocks_per_shard * n
    fs = cfg.rate_in * cfg.downsample
    rng = np.random.default_rng(seed)
    t = np.arange(total)
    ph = 2 * np.pi * (offset_hz / fs) * t
    iq = np.empty(2 * total, np.int16)
    iq[0::2] = np.round(8000 * np.cos(ph)
                        + rng.normal(0, 300, total)).astype(np.int16)
    iq[1::2] = np.round(8000 * np.sin(ph)
                        + rng.normal(0, 300, total)).astype(np.int16)
    return iq, n


def _assert_sharded_matches_unsharded(cfg, iq, n, warmup=WARMUP, atol=0.1):
    mesh = make_mesh(S, axis="t")
    sharded = shard_recording(iq, S, n)
    audio_sh, nv_sh, _ = time_sharded_fm(cfg, jnp.asarray(sharded),
                                         mesh=mesh, warmup=warmup)
    audio_sh, nv_sh = np.asarray(audio_sh), np.asarray(nv_sh)
    st = fmchain.init_state(cfg)
    blocks = sharded.reshape(-1, sharded.shape[-1])
    _, audio_u, nv_u, _ = scan_mod.scan_fm_blocks(cfg, st, jnp.asarray(blocks))
    audio_u = np.asarray(audio_u).reshape(S, -1, audio_u.shape[-1])
    nv_u = np.asarray(nv_u).reshape(S, -1)
    m = sharded.shape[1]
    for s in range(S):
        got = np.concatenate([audio_sh[s, i, : nv_sh[s, i]] for i in range(m)])
        ref = np.concatenate([audio_u[s, i, : nv_u[s, i]] for i in range(m)])
        assert got.shape == ref.shape, (s, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=atol,
                                   err_msg=str(s))


@pytest.mark.parametrize("kw", [
    dict(dc_block_audio=True),                            # deemph+DC+resample
    dict(dc_block_audio=True, deemph_a=0),                # DC + resample
    dict(dc_block_audio=True, rate_out2=-1),              # deemph + DC
    dict(dc_block_audio=True, deemph_a=0, rate_out2=-1),  # DC alone
])
def test_time_sharded_audio_dc_exact(kw):
    """Round-5: ``-E dc`` joins the exact closed-form seam.  The audio DC
    block is a linear post-demod EMA (rtl_fm.c:684-697); its state is
    carried across shards exactly (affine in the deemph init, same single
    all_gather) — sharded == unsharded on ALL shards, no skip window,
    on an FM signal whose discriminator output has a big DC level."""
    cfg = _cfg(**kw)
    from rx_tools_tpu.parallel.timeshard import exact_iir_supported
    assert exact_iir_supported(cfg)
    iq, n = _fm_dc_recording(cfg, seed=3)
    _assert_sharded_matches_unsharded(cfg, iq, n)


def test_time_sharded_fifth_order_path():
    """Halo warm-up also restores the fifth-order + droop FIR state."""
    cfg = _cfg(deemph_a=0, rate_out2=-1, downsample=4, downsample_passes=2,
               comp_fir_size=9)
    iq, n = _recording(cfg, seed=7)
    mesh = make_mesh(S, axis="t")
    sharded = shard_recording(iq, S, n)
    audio_sh, _, _ = time_sharded_fm(cfg, jnp.asarray(sharded),
                                     mesh=mesh, warmup=1)
    st = fmchain.init_state(cfg)
    blocks = sharded.reshape(-1, sharded.shape[-1])
    _, audio_u, _, _ = scan_mod.scan_fm_blocks(cfg, st, jnp.asarray(blocks))
    audio_u = np.asarray(audio_u).reshape(S, -1, audio_u.shape[-1])
    np.testing.assert_allclose(np.asarray(audio_sh), audio_u,
                               rtol=1e-4, atol=0.05)


def test_time_sharded_no_iir_exact():
    """Without IIR stages (no deemph/DC), halo warm-up is exact everywhere."""
    cfg = _cfg(deemph_a=0, rate_out2=-1)
    iq, n = _recording(cfg, seed=1)
    mesh = make_mesh(S, axis="t")
    sharded = shard_recording(iq, S, n)
    audio_sh, nv_sh, _ = time_sharded_fm(cfg, jnp.asarray(sharded),
                                         mesh=mesh, warmup=1)
    st = fmchain.init_state(cfg)
    blocks = sharded.reshape(-1, sharded.shape[-1])
    _, audio_u, nv_u, _ = scan_mod.scan_fm_blocks(cfg, st, jnp.asarray(blocks))
    audio_u = np.asarray(audio_u).reshape(S, -1, audio_u.shape[-1])
    got = np.asarray(audio_sh)
    np.testing.assert_allclose(got, audio_u, rtol=1e-4, atol=0.05)


_COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
                "collective-permute", "reduce-scatter")


def _collectives_in(hlo: str):
    return [l.strip() for l in hlo.splitlines()
            if any(k in l for k in _COLLECTIVES)]


def test_hop_sharded_sweep_zero_collectives():
    """The sweep steady state must compile to NO cross-device traffic
    (naive sharding annotations all-gather the FFT batch — a measured
    regression this guards against)."""
    cfg = powerscan.PowerConfig(bin_e=8, downsample=1, buf_len=2 * 256 * 4)
    h = 16
    mesh = make_mesh(8, axis="h")
    from jax.sharding import NamedSharding, PartitionSpec as P
    acc = powerscan.new_sweep_accum(h, cfg)
    blocks = jnp.zeros((h, cfg.buf_len), jnp.int16)

    def run(avg, samples, blk):
        from rx_tools_tpu.parallel.hopshard import hop_sharded_sweep
        return hop_sharded_sweep(cfg, powerscan.SweepAccum(avg, samples),
                                 blk, mesh)

    hlo = jax.jit(run).lower(acc.avg, acc.samples, blocks).compile().as_text()
    assert _collectives_in(hlo) == [], _collectives_in(hlo)[:3]


def test_time_sharded_exactly_one_permute():
    """Non-exact-path time sharding's only communication is the one-hop
    halo ring; the exact-IIR path adds exactly ONE all-gather of S scalar
    pairs for the closed-form deemph state scan."""
    mesh = make_mesh(S, axis="t")
    # legacy path (no deemph/resampler): one collective-permute only
    cfg = _cfg(deemph_a=0, rate_out2=-1)
    n = fmchain.block_samples(cfg, target=480)
    sharded = jnp.zeros((S, 3, 2 * n), jnp.int16)
    hlo = time_sharded_fm.lower(cfg, sharded, mesh=mesh,
                                warmup=1).compile().as_text()
    colls = _collectives_in(hlo)
    assert len(colls) == 1 and "collective-permute" in colls[0], colls
    # exact path: the halo permute plus one tiny all-gather
    cfg = _cfg()
    n = fmchain.block_samples(cfg, target=480)
    sharded = jnp.zeros((S, 3, 2 * n), jnp.int16)
    hlo = time_sharded_fm.lower(cfg, sharded, mesh=mesh,
                                warmup=1).compile().as_text()
    colls = _collectives_in(hlo)
    perms = [c for c in colls if "collective-permute" in c]
    gaths = [c for c in colls if "all-gather" in c]
    assert len(perms) == 1 and len(gaths) == 1 and len(colls) == 2, colls
    # round-5: -E dc rides the SAME single all-gather (six scalars/shard)
    cfg = _cfg(dc_block_audio=True)
    hlo = time_sharded_fm.lower(cfg, sharded, mesh=mesh,
                                warmup=1).compile().as_text()
    colls = _collectives_in(hlo)
    perms = [c for c in colls if "collective-permute" in c]
    gaths = [c for c in colls if "all-gather" in c]
    assert len(perms) == 1 and len(gaths) == 1 and len(colls) == 2, colls
    # the raw DC block stays on the legacy warm-up path (nonlinear feed)
    from rx_tools_tpu.parallel.timeshard import exact_iir_supported
    assert not exact_iir_supported(_cfg(dc_block_raw=True))


def _pfb_cfg():
    from rx_tools_tpu.models import pfb
    return pfb.PfbConfig(capture_rate=1_024_000, n_channels=16, mode="fm",
                         custom_atan=1, deemph_a=7, rate_out2=32_000)


def test_channel_sharded_pfb_bit_exact():
    """Round-5: the PFB channel axis shards over 8 devices BIT-identically
    to the single-device step while streaming (per-channel math is
    untouched; only the DFT row partition moves)."""
    from rx_tools_tpu.models import pfb
    from rx_tools_tpu.parallel import channel_sharded_pfb_step
    cfg = _pfb_cfg()
    n = pfb.block_samples(cfg, target=4096)
    mesh = make_mesh(8, axis="c")
    rng = np.random.default_rng(11)
    st_u, st_s = pfb.init_state(cfg), pfb.init_state(cfg)
    for b in range(3):
        blk = rng.integers(-3000, 3000, 2 * n).astype(np.int16)
        st_u, a_u, nv_u = pfb.pfb_step(cfg, st_u, jnp.asarray(blk))
        st_s, a_s, nv_s = channel_sharded_pfb_step(cfg, st_s,
                                                   jnp.asarray(blk), mesh)
        np.testing.assert_array_equal(np.asarray(a_u), np.asarray(a_s),
                                      err_msg=f"block {b}")
        np.testing.assert_array_equal(np.asarray(nv_u), np.asarray(nv_s))
    for lu, ls in zip(jax.tree.leaves(st_u), jax.tree.leaves(st_s)):
        np.testing.assert_array_equal(np.asarray(lu), np.asarray(ls))


def test_channel_sharded_pfb_zero_collectives():
    """The channel-sharded step must compile to NO cross-device traffic —
    the replicated branch FIR + per-shard DFT slice IS the partition."""
    from rx_tools_tpu.models import pfb
    from rx_tools_tpu.parallel.chanshard import _sharded_step, _dft_slices
    cfg = _pfb_cfg()
    n = pfb.block_samples(cfg, target=4096)
    mesh = make_mesh(8, axis="c")
    st = pfb.init_state(cfg)
    dfts = jnp.asarray(_dft_slices(cfg.n_channels, 8))
    hlo = _sharded_step(cfg, mesh).lower(
        st.tail, jnp.zeros(2 * n, jnp.int16), dfts, st.prev_iq,
        st.deemph_avg, st.resamp.acc, st.resamp.phase).compile().as_text()
    assert _collectives_in(hlo) == [], _collectives_in(hlo)[:3]


def test_hop_sharded_sweep_exact():
    cfg = powerscan.PowerConfig(bin_e=6, downsample=1, buf_len=512)
    h = 8
    rng = np.random.default_rng(2)
    blocks = rng.integers(-3000, 3000, (h, cfg.buf_len)).astype(np.int16)
    mesh = make_mesh(8, axis="h")
    acc = powerscan.new_sweep_accum(h, cfg)
    acc_sh = hop_sharded_sweep(cfg, acc, blocks, mesh)
    acc_u = powerscan.sweep_step(cfg, powerscan.new_sweep_accum(h, cfg),
                                 jnp.asarray(blocks))
    np.testing.assert_allclose(np.asarray(acc_sh.avg), np.asarray(acc_u.avg),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(acc_sh.samples),
                                  np.asarray(acc_u.samples))


@pytest.mark.parametrize("dc", [False, True])
def test_time_sharded_superchunk_continuation_exact(dc):
    """Round-4: TWO super-chunks with cont=True + the exact iir_carry
    reproduce the unsharded run on every shard of BOTH chunks — the
    super-chunk seam is as exact as the interior shard boundaries.
    Round-5: parametrized over -E dc (the carry's third slot)."""
    cfg = _cfg(dc_block_audio=dc)
    mesh = make_mesh(S, axis="t")
    n = fmchain.block_samples(cfg, target=480)
    m = 4
    if dc:
        iq, _ = _fm_dc_recording(cfg, blocks_per_shard=2 * m, seed=21)
    else:
        rng = np.random.default_rng(21)
        iq = rng.integers(-2000, 2000, 2 * 2 * S * m * n).astype(np.int16)
    blocks = scan_mod.stack_blocks(iq, n)              # (2*S*m, 2n)
    from rx_tools_tpu.parallel.timeshard import resampler_modulus
    fmod = resampler_modulus(cfg)

    # unsharded truth over the whole stream
    st = fmchain.init_state(cfg)
    _, au, nvu, _ = scan_mod.scan_fm_blocks(cfg, st, jnp.asarray(blocks))
    ref = np.concatenate([np.asarray(au)[i, : int(nvu[i])]
                          for i in range(blocks.shape[0])])

    warmup = 2
    c1 = blocks[: S * m].reshape(S, m, -1)
    c2 = blocks[S * m:].reshape(S, m, -1)
    a1, nv1, carry1 = time_sharded_fm(cfg, jnp.asarray(c1), mesh=mesh,
                                      warmup=warmup)
    halo = blocks[S * m - warmup: S * m]
    a2, nv2, _ = time_sharded_fm(cfg, jnp.asarray(c2), mesh=mesh,
                                 warmup=warmup, cont=True,
                                 halo0=jnp.asarray(halo),
                                 block_offset_mod=jnp.int32((S * m) % fmod),
                                 iir_carry=jnp.asarray(carry1)[-1])
    got = []
    for a, nv in ((a1, nv1), (a2, nv2)):
        a, nv = np.asarray(a), np.asarray(nv)
        for s in range(S):
            for i in range(m):
                got.append(a[s, i, : int(nv[s, i])])
    got = np.concatenate(got)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=0.1)
