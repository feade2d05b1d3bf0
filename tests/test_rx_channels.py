"""rx_channels CLI: PFB and mixer engines end to end from a synth scene."""

import numpy as np
import pytest

from rx_tools_tpu.apps import rx_channels


@pytest.fixture(autouse=True)
def _cpu(monkeypatch):
    monkeypatch.setenv("RX_PLATFORM", "cpu")


def _peak_hz(path, fs):
    a = np.fromfile(path, np.int16).astype(np.float64)
    assert a.size > 4000, path
    a = a[a.size // 4:]
    spec = np.abs(np.fft.rfft(a * np.hanning(a.size)))
    return np.fft.rfftfreq(a.size, 1.0 / fs)[np.argmax(spec[1:]) + 1]


def test_pfb_engine_recovers_station(tmp_path):
    out = tmp_path / "out"
    # station exactly on channel 3 of a 16-channel PFB over 1.024 MS/s
    fs, d, k = 1_024_000, 16, 3
    station = 100e6 + k * fs / d
    rc = rx_channels.main([
        "-f", "100M", "-s", str(fs), "-n", str(d), "-M", "fm", "-A", "std",
        "-c", "off", "-r", "32k", "-e", "1",
        "-d", f"synth=fm,carrier={station:.0f},audio=1k,dev=15k,amp=0.8",
        str(out)])
    assert rc == 0
    chans = sorted(out.glob("ch*.s16"))
    assert len(chans) == d
    target = [p for p in chans if f"_{int(station)}" in p.name]
    assert len(target) == 1
    assert abs(_peak_hz(target[0], 32000) - 1000.0) < 30


def test_mixer_engine_recovers_station(tmp_path):
    out = tmp_path / "out"
    rc = rx_channels.main([
        "-f", "100M", "-s", "1024k", "-k", "100.2M,100.35M", "-D", "16",
        "-M", "fm", "-A", "std", "-c", "off", "-r", "32k", "-e", "1",
        "-d", "synth=fm,carrier=100.2M,audio=1k,dev=15k,amp=0.8",
        str(out)])
    assert rc == 0
    chans = sorted(out.glob("ch*.s16"))
    assert len(chans) == 2
    assert abs(_peak_hz(chans[0], 32000) - 1000.0) < 30


def test_validation():
    assert rx_channels.main(["-f", "100M", "-n", "8", "-k", "100M", "x"]) == 1
    assert rx_channels.main(["-f", "100M", "-s", "1024k", "-k", "101M",
                             "x"]) == 1          # outside capture bw
    with pytest.raises(SystemExit):
        rx_channels.main([])                     # no outdir / freq


def test_partial_tail_not_dropped(tmp_path):
    """A capture whose length is not a block multiple keeps its tail: the
    final partial block is zero-padded and trimmed, not discarded."""
    from rx_tools_tpu.apps import rx_sdr
    fs, blk = 1_024_000, 131072
    n_samp = blk + blk // 2                 # 1.5 blocks
    cap = tmp_path / "cap.cs16"
    rc = rx_sdr.main(["-d", "synth=fm,carrier=100.2M,audio=1k,dev=15k,amp=0.8",
                      "-f", "100M", "-s", str(fs), "-n", str(n_samp),
                      "-F", "CS16", str(cap)])
    assert rc == 0
    out = tmp_path / "out"
    rc = rx_channels.main([
        "-f", "100M", "-s", str(fs), "-k", "100.2M", "-D", "16",
        "-M", "fm", "-A", "std", "-c", "off", "-r", "0",
        "-b", str(blk), "-d", f"file={cap},format=CS16,rate={fs}", str(out)])
    assert rc == 0
    a = np.fromfile(next(out.glob("ch*.s16")), np.int16)
    # channel rate fs/16 = 64k; 1.5 blocks -> ~12288 audio samples. With the
    # old drop-partial behavior only the first block's 8192 would survive.
    assert a.size > 11000


def test_deemph_alpha_uses_channel_rate(tmp_path):
    """De-emphasis runs at channel_rate before the resampler; alpha computed
    at rate_out2 would over-brighten by ~channel_rate/rate_out2."""
    from rx_tools_tpu import ops
    captured = {}
    real_cfg = rx_channels.channelizer.ChannelizerConfig

    def spy(*a, **kw):
        cfg = real_cfg(*a, **kw)
        captured["deemph_a"] = cfg.deemph_a
        return cfg

    rx_channels.channelizer.ChannelizerConfig, orig = spy, real_cfg
    try:
        rc = rx_channels.main([
            "-f", "100M", "-s", "2400k", "-k", "100.3M", "-D", "16",
            "-r", "32k", "-c", "us", "-e", "0.05",
            "-d", "synth=fm,carrier=100.3M,audio=1k,dev=15k,amp=0.5",
            str(tmp_path / "o")])
    finally:
        rx_channels.channelizer.ChannelizerConfig = orig
    assert rc == 0
    assert captured["deemph_a"] == ops.deemph_alpha(2_400_000 // 16, 75)


def test_pfb_channel_sharded_cli_identical(tmp_path, monkeypatch):
    """Round-5: `-t 8` shards the PFB channel axis over the 8 virtual
    devices; every channel file is byte-identical to the single-device
    run (parallel/chanshard.py is bit-exact by construction).  RX_PFB=cm
    pins the single-device run to the channel-major engine the shards run
    (the time-major default differs by float association only)."""
    monkeypatch.setenv("RX_PFB", "cm")
    args = ["-f", "100M", "-s", "1024k", "-n", "16", "-M", "fm",
            "-A", "fast", "-c", "us", "-r", "32k", "-e", "1",
            "-d", "synth=fm,det=1,seed=9,carrier=100.192M,audio=1k,"
                  "dev=15k,amp=0.8"]
    out1, out8 = tmp_path / "t1", tmp_path / "t8"
    assert rx_channels.main(args + ["-t", "1", str(out1)]) == 0
    assert rx_channels.main(args + ["-t", "8", str(out8)]) == 0
    f1 = sorted(out1.glob("ch*.s16"))
    f8 = sorted(out8.glob("ch*.s16"))
    assert [p.name for p in f1] == [p.name for p in f8] and len(f1) == 16
    for a, b in zip(f1, f8):
        assert a.read_bytes() == b.read_bytes(), a.name


def test_pfb_tmaj_cli_default_and_escape(tmp_path, monkeypatch):
    """The single-device PFB CLI defaults to the time-major engine; its
    audio matches the channel-major engine's (RX_PFB=cm) to float
    association on every channel."""
    args = ["-f", "100M", "-s", "1024k", "-n", "16", "-M", "fm",
            "-A", "fast", "-c", "us", "-r", "32k", "-e", "1",
            "-d", "synth=fm,det=1,seed=7,carrier=100.192M,audio=1k,"
                  "dev=15k,amp=0.8"]
    out_t, out_c = tmp_path / "tm", tmp_path / "cm"
    assert rx_channels.main(args + [str(out_t)]) == 0
    monkeypatch.setenv("RX_PFB", "cm")
    assert rx_channels.main(args + [str(out_c)]) == 0
    ft = sorted(out_t.glob("ch*.s16"))
    fc = sorted(out_c.glob("ch*.s16"))
    assert [p.name for p in ft] == [p.name for p in fc] and len(ft) == 16
    for a, b in zip(ft, fc):
        x = np.fromfile(a, np.int16).astype(np.float64)
        y = np.fromfile(b, np.int16).astype(np.float64)
        assert x.size == y.size > 1000, a.name
        assert np.max(np.abs(x - y)) <= 2.0, a.name   # association-class


def test_chunked_dispatch_identical_to_per_block(tmp_path, monkeypatch):
    """Round-5: the time-major engine's chunked multi-block dispatch
    (pfb_scan_blocks_tmaj) must produce byte-identical channel files to
    per-block dispatch (chunk cap forced to 1)."""
    args = ["-f", "100M", "-s", "1024k", "-n", "16", "-M", "fm",
            "-A", "fast", "-c", "us", "-r", "32k", "-e", "1.2",
            "-b", "65536",
            "-d", "synth=fm,det=1,seed=5,carrier=100.192M,audio=1k,"
                  "dev=15k,amp=0.8"]
    out_c, out_p = tmp_path / "chunked", tmp_path / "perblk"
    assert rx_channels.main(args + [str(out_c)]) == 0
    monkeypatch.setenv("RX_CHANNELS_CHUNK", "1")   # per-block dispatch
    assert rx_channels.main(args + [str(out_p)]) == 0
    fc = sorted(out_c.glob("ch*.s16"))
    fp = sorted(out_p.glob("ch*.s16"))
    assert len(fc) == len(fp) == 16
    for a, b in zip(fc, fp):
        assert a.read_bytes() == b.read_bytes(), a.name
