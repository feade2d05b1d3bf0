"""Differential fuzz of the chain configuration surface (VERDICT r2 #6).

Three axes, all seeded (deterministic in CI):

1. cross-engine: ~64 random FmConfigs through the scanned engine
   (stream/scan.py) AND the flat chunk engine (models/fmchunk.py) on the
   same random blocks — audio, levels and carried state must agree to the
   engines' established float-grouping tolerance (test_fmchunk.py).
   Catches seam interactions (squelch x post_downsample x deemph x DC x
   resampler) the hand-written configs miss.
2. chain-vs-oracle: ~40 random configs through fm_chain_step against the
   bit-faithful C model (oracles.c_ref.full_demod, rtl_fm.c:759-824),
   SNR-bounded at the oracle's own integer-truncation floor.
3. CLI flag combos: random valid rx_fm flag vectors (modes x -A x -o x
   -E lists x squelch) over a synth scene must exit 0 and produce PCM.

The config space mirrors the reference's getopt surface
(rtl_fm.c:1224-1365); geometry constraints (block length divisible by
4 x downsample x post_downsample) follow fmchain.block_samples.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rx_tools_tpu.models import fmchain, fmchunk
from rx_tools_tpu.stream.scan import scan_fm_blocks, gather_valid
from oracles import c_ref
from util import snr_db

N_CROSS = 64
N_ORACLE = 40
N_CLI = 8


def _rand_cfg(rng, flat_only: bool):
    """One random config in the reference's flag space."""
    mode = rng.choice(["fm", "fm", "fm", "am", "usb", "lsb", "raw"])
    downsample = int(rng.choice([2, 3, 4, 5, 6, 7, 8, 10, 11, 14, 16]))
    post = int(rng.choice([1, 1, 1, 2, 4])) if mode == "fm" else 1
    rate_out = int(rng.choice([48000, 96000, 170000]))
    rate_out2 = int(rng.choice([-1, -1, 32000, 24000])) if mode != "raw" else -1
    kw = dict(
        mode=str(mode),
        rate_in=rate_out, rate_out=rate_out, rate_out2=rate_out2,
        downsample=downsample,
        post_downsample=post,
        custom_atan=int(rng.integers(0, 4)) if mode == "fm" else 0,
        deemph_a=int(rng.choice([0, 0, 7, 13])) if mode == "fm" else 0,
        dc_block_audio=bool(rng.integers(0, 2)) if mode != "raw" else False,
        dc_block_raw=bool(rng.integers(0, 2)),
        squelch_level=float(rng.choice([0.0, 0.0, 0.0, 15.0])),
        offset_tuning=bool(rng.integers(0, 2)),
        output_scale=int(rng.choice([1, 2])),
    )
    cfg = fmchain.FmConfig(**kw)
    if flat_only and not fmchunk.supports(cfg):
        return _rand_cfg(rng, flat_only)
    return cfg


def _rand_blocks(cfg, rng, m=4, target=512, amp=12000):
    n = fmchain.block_samples(cfg, target=target)
    return rng.integers(-amp, amp, (m, 2 * n)).astype(np.int16), n


def test_fuzz_cross_engine_agreement():
    """Random configs: flat chunk engine == scanned engine (audio, levels,
    carried state) within the engines' float-grouping tolerance."""
    rng = np.random.default_rng(2024)
    for trial in range(N_CROSS):
        cfg = _rand_cfg(rng, flat_only=True)
        blocks, n = _rand_blocks(cfg, rng, m=4)
        st = fmchain.init_state(cfg)
        st_s, a_s, nv_s, lv_s = scan_fm_blocks(cfg, st, jnp.asarray(blocks))
        st_c, a_c, nv_c, lv_c = fmchunk.fm_chunk_step(cfg, st,
                                                      jnp.asarray(blocks))
        ctx = f"trial {trial}: {cfg}"
        if cfg.mode == "raw":
            got = np.asarray(a_c)
            ref = np.asarray(a_s).reshape(-1)
        else:
            ref = gather_valid(np.asarray(a_s), np.asarray(nv_s))
            got = np.asarray(a_c)[: int(nv_c)]
        assert got.shape == ref.shape, ctx
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=0.05,
                                   err_msg=ctx)
        np.testing.assert_allclose(np.asarray(lv_c), np.asarray(lv_s),
                                   rtol=1e-4, atol=1e-3, err_msg=ctx)
        import jax
        for a, b in zip(jax.tree.leaves(st_s), jax.tree.leaves(st_c)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=0.05, err_msg=ctx)


def test_fuzz_chain_vs_oracle():
    """Random configs: the float chain tracks the bit-faithful C model.

    The oracle rounds to int at every stage, so equality is SNR-bounded:
    the floor depends on stage count and signal scale; 18 dB is far above
    any structural disagreement (a wrong stage order or a dropped filter
    reads as < 5 dB) while robust to the truncation noise of the deepest
    sampled chains."""
    rng = np.random.default_rng(777)
    tested = 0
    for trial in range(N_ORACLE):
        cfg = _rand_cfg(rng, flat_only=False)
        # oracle scope: full_demod sees post-rotate data and has no raw-DC
        # stage (that lives in rtlsdr_callback), so pin those two off
        import dataclasses
        cfg = dataclasses.replace(cfg, offset_tuning=True,
                                  dc_block_raw=False, squelch_level=0.0,
                                  downsample_passes=0)
        n = fmchain.block_samples(cfg, target=512)
        # strong FM-ish scene in the 8-bit range (like post-rescale).
        # Deviation scales with 1/downsample so the DECIMATED per-sample
        # phase step stays well under pi and the post-decimate audio sum
        # stays inside int16: the C wraps int16 on overdriven audio
        # (i16() in the oracle) where the float chain saturates — a
        # documented difference class, not what this fuzz hunts.
        m = 3
        t = np.arange(m * n)
        dphi = (0.5 / cfg.downsample) * np.sin(2 * np.pi * 900 * t / 170000.0)
        z = 100 * np.exp(1j * np.cumsum(dphi))
        z += rng.normal(0, 0.5, m * n) + 1j * rng.normal(0, 0.5, m * n)
        iq8 = np.empty(2 * m * n, np.int64)
        iq8[0::2] = np.round(z.real).astype(np.int64)
        iq8[1::2] = np.round(z.imag).astype(np.int64)
        blocks8 = iq8.reshape(m, 2 * n)

        st_o = c_ref.DemodState(
            downsample=cfg.downsample, custom_atan=cfg.custom_atan,
            mode=cfg.mode, post_downsample=cfg.post_downsample,
            deemph_a=cfg.deemph_a, dc_block_audio_flag=cfg.dc_block_audio,
            rate_out=cfg.rate_out, rate_out2=cfg.rate_out2,
            output_scale=cfg.output_scale)
        ref = []
        for b in blocks8:
            ref.extend(c_ref.full_demod(st_o, list(b)))
        ref = np.array(ref, np.float64)

        st = fmchain.init_state(cfg)
        outs = []
        for b in blocks8:
            scaled = np.clip(np.round(b * 32767.0 / 128.0),
                             -32768, 32767).astype(np.int16)
            st, audio, nv, _ = fmchain.fm_chain_step(cfg, st, scaled)
            if cfg.mode == "raw":
                outs.append(np.asarray(audio))
            else:
                outs.append(np.asarray(audio)[: int(nv)])
        got = np.concatenate(outs)
        ctx = f"trial {trial}: {cfg}"
        assert got.shape == ref.shape, ctx
        # seam sample 0 differs (oracle truncates the std-atan seam)
        s = snr_db(ref[1:], got[1:])
        assert s > 18, f"{ctx}: SNR {s:.1f} dB"
        tested += 1
    assert tested == N_ORACLE


@pytest.mark.parametrize("seed", range(N_CLI))
def test_fuzz_cli_flags(tmp_path, monkeypatch, seed):
    """Random valid rx_fm flag vectors run clean and emit PCM."""
    monkeypatch.setenv("RX_PLATFORM", "cpu")
    from rx_tools_tpu.apps import rx_fm, rx_sdr
    cap = tmp_path / "cap.cs16"
    assert rx_sdr.main(
        ["-d", "synth=fm,carrier=100.25M,audio=1k,dev=40k,amp=0.7,noise=0.01",
         "-f", "100.25M", "-s", "1024k", "-n", "300000", "-F", "CS16",
         str(cap)]) == 0
    rng = np.random.default_rng(100 + seed)
    mode = str(rng.choice(["fm", "am", "usb", "lsb", "wbfm"]))
    args = ["-f", "100M", "-M", mode,
            "-d", f"file={cap},format=CS16,rate=1024k"]
    if mode != "wbfm":
        args += ["-s", str(rng.choice(["48k", "96k", "170k"]))]
        if rng.integers(0, 2):
            args += ["-r", "24k"]
        if rng.integers(0, 2):
            args += ["-o", str(rng.choice([2, 4]))]
    if mode in ("fm", "wbfm"):
        args += ["-A", str(rng.choice(["std", "fast", "lut", "ale"]))]
    for flag in ("dc", "deemp"):
        if rng.integers(0, 2):
            args += ["-E", flag]
    out = tmp_path / "a.raw"
    rc = rx_fm.main(args + [str(out)])
    assert rc == 0, args
    assert out.stat().st_size > 1000, args
