"""ChunkedFmRunner: chunk==scan equivalence and squelch semantics
(skip / -E zero / exit-on-squelch / hop), per rtl_fm.c:916-946."""

import numpy as np
import pytest

from rx_tools_tpu.models import fmchain
from rx_tools_tpu.stream.chunked import ChunkedFmRunner


def _cfg(**kw):
    base = dict(mode="fm", rate_in=96000, rate_out=96000, rate_out2=-1,
                downsample=4, custom_atan=1)
    base.update(kw)
    return fmchain.FmConfig(**base)


class SceneSource:
    """Quiet blocks, then loud FM, then quiet again."""

    def __init__(self, cfg, n, pattern):
        self.n = n
        self.pattern = pattern   # list of "loud"/"quiet" per block
        self.i = 0
        self._n0 = 0
        self.rng = np.random.default_rng(0)

    def read_stream(self, k):
        if self.i >= len(self.pattern):
            return 0, np.empty(0, np.int16)
        loud = self.pattern[self.i] == "loud"
        self.i += 1
        # chain rescales by 128/32767 then boxcar-sums by `downsample`;
        # emitter sits at -fs/4 + 2% so the fs/4 derotation lands it at a
        # low IF (NOT the boxcar null, NOT DC — the reference's rms is
        # DC-corrected so a 0 Hz carrier is invisible to squelch)
        amp = 20000 if loud else 20
        t = np.arange(self._n0, self._n0 + k)
        self._n0 += k
        w = 2 * np.pi * (-0.25 + 0.02)
        z = amp * np.exp(1j * (w * t + 0.3 * np.sin(2 * np.pi * 0.01 * t)))
        iq = np.empty(2 * k, np.int16)
        iq[0::2] = np.round(np.real(z))
        iq[1::2] = np.round(np.imag(z)) + self.rng.integers(-3, 3, k)
        return k, iq

    def set_frequency(self, f):
        return 0


def _run(cfg, pattern, **runner_kw):
    n = fmchain.block_samples(cfg, target=256)
    src = SceneSource(cfg, n, pattern)
    got = []
    r = ChunkedFmRunner(cfg, src, lambda a, l: got.append(a), chunk=2,
                        block_size=n, **runner_kw)
    stats = r.run()
    return got, stats, r


def test_squelch_skip_single_freq():
    """Squelched blocks are skipped (not emitted) once hits > conseq."""
    cfg = _cfg(squelch_level=100.0, conseq_squelch=2)
    pattern = ["quiet"] * 8 + ["loud"] * 4
    got, stats, _ = _run(cfg, pattern)
    # runner starts muted (hits=conseq+1): quiet blocks all skipped,
    # loud blocks all emitted
    assert stats.blocks == 12
    assert len(got) == 4


def test_squelch_zero_emits():
    cfg = _cfg(squelch_level=100.0, conseq_squelch=2, squelch_zero=True)
    pattern = ["quiet"] * 6 + ["loud"] * 2
    got, stats, _ = _run(cfg, pattern)
    assert len(got) == 8              # everything emitted
    quiet_rms = np.sqrt(np.mean(np.concatenate(got[:6]) ** 2))
    assert quiet_rms < 1.0            # zeros while squelched


def test_exit_on_squelch():
    cfg = _cfg(squelch_level=100.0, conseq_squelch=2)
    pattern = ["loud"] * 4 + ["quiet"] * 20
    got, stats, r = _run(cfg, pattern, exit_on_squelch=True)
    assert r._stop                    # terminated by squelch watchdog
    assert stats.blocks < len(pattern)


def test_hop_on_squelch():
    cfg = _cfg(squelch_level=100.0, conseq_squelch=1)
    hops = []
    pattern = ["quiet"] * 10
    n = fmchain.block_samples(cfg, target=256)
    src = SceneSource(cfg, n, pattern)
    got = []
    r = ChunkedFmRunner(cfg, src, lambda a, l: got.append(a), chunk=2,
                        block_size=n, on_squelch=lambda: hops.append(1) or True)
    r.run()
    assert len(hops) >= 4             # kept hopping on quiet channel
    assert got == []                  # nothing emitted while scanning quiet


def test_chunked_matches_scan():
    """Runner output == offline scan over the same blocks (no squelch)."""
    from rx_tools_tpu.stream.scan import scan_fm_blocks, gather_valid
    import jax.numpy as jnp
    cfg = _cfg()
    n = fmchain.block_samples(cfg, target=256)
    src = SceneSource(cfg, n, ["loud"] * 7)
    blocks = []
    while True:
        k, b = src.read_stream(n)
        if k == 0:
            break
        blocks.append(b)
    blocks = np.stack(blocks)

    src2 = SceneSource(cfg, n, ["loud"] * 7)
    got = []
    r = ChunkedFmRunner(cfg, src2, lambda a, l: got.append(a), chunk=3,
                        block_size=n)
    r.run()
    runner_audio = np.concatenate(got)

    st = fmchain.init_state(cfg)
    _, audio, nv, _ = scan_fm_blocks(cfg, st, jnp.asarray(blocks))
    scan_audio = gather_valid(np.asarray(audio), np.asarray(nv))
    np.testing.assert_allclose(runner_audio, scan_audio, atol=1e-3)


def test_flat_engine_runner_matches_default(monkeypatch):
    """RX_ENGINE=flat: the runner's flat-engine path (whole-chunk
    parallel programs, per-chunk emit) produces the same audio stream as
    the default per-block engine within the engines' established
    tolerance, including a partial tail chunk (which falls back to the
    per-block engine on the interoperable state)."""
    import numpy as np
    import rx_tools_tpu.stream.chunked as chunked_mod
    from rx_tools_tpu.iq.sources import make_source
    from rx_tools_tpu.models import fmchain
    from rx_tools_tpu.stream.chunked import ChunkedFmRunner

    cfg = fmchain.FmConfig(mode="fm", rate_in=170000, rate_out=170000,
                           rate_out2=32000, downsample=6, custom_atan=1,
                           deemph_a=13, squelch_level=0.0)
    n = fmchain.block_samples(cfg)

    def run(flat: bool):
        monkeypatch.setattr(chunked_mod, "_FLAT_ENGINE", flat)
        src = make_source("synth=fm,det=1,seed=9,audio=1k,dev=50k,amp=0.6")
        src.set_sample_rate(170000 * 6)
        src.set_frequency(100e6)
        src.activate()
        out = []
        r = ChunkedFmRunner(cfg, src, lambda a, lvl: out.append(a.copy()),
                            chunk=4, block_size=n)
        r.run(max_blocks=11)          # 2 full chunks + a 3-block tail
        src.close()
        return np.concatenate(out), r.stats

    a0, s0 = run(False)
    a1, s1 = run(True)
    assert s0.blocks == s1.blocks == 11
    assert a0.shape == a1.shape
    np.testing.assert_allclose(a1, a0, rtol=1e-4, atol=0.05)
