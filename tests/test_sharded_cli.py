"""User-reachable sharded execution: the CLIs on the 8-device CPU mesh.

rx_power shards the hop axis (-t, the reference's dead fft_threads flag
made live); rx_fm -E shard runs the offline time-sharded chain.  Outputs
must match the single-device runs (exactly for FIR-only chains, within
SNR for IIR stages — parallel/timeshard.py documents the boundary
semantics)."""

import numpy as np
import pytest

from rx_tools_tpu.apps import rx_fm, rx_power, rx_sdr
from util import snr_db


@pytest.fixture(autouse=True)
def _cpu(monkeypatch):
    monkeypatch.setenv("RX_PLATFORM", "cpu")


def _strip_stamps(csv_text):
    return ["".join(l.split(", ")[2:]) for l in csv_text.splitlines()]


def test_rx_power_hop_sharded_matches_single_device(tmp_path):
    """-t 8 (sharded) CSV == -t 1 (single device) CSV, stamps aside."""
    args = ["-f", "100M:120M:100k", "-1", "-c", "20%",
            "-d", "synth=tone,carrier=111.4M,amp=0.5,noise=0.01,seed=3"]
    out1, out8 = tmp_path / "t1.csv", tmp_path / "t8.csv"
    assert rx_power.main(args + ["-t", "1", str(out1)]) == 0
    assert rx_power.main(args + ["-t", "8", str(out8)]) == 0
    rows1 = _strip_stamps(out1.read_text())
    rows8 = _strip_stamps(out8.read_text())
    assert len(rows1) > 4
    assert rows1 == rows8


def test_rx_power_sharded_padding_rows_never_flushed(tmp_path):
    """A hop count not divisible by the mesh exercises the pad rows."""
    out = tmp_path / "odd.csv"
    # 3 hops over 8 devices -> mesh 3, no pad; force pad with -t 2
    rc = rx_power.main(["-f", "100M:106M:10k", "-1", "-t", "2",
                        "-d", "synth=tone,carrier=102.5M,amp=0.5",
                        str(out)])
    assert rc == 0
    rows = out.read_text().splitlines()
    assert len(rows) >= 3                     # only real hops in the CSV
    # stitched peak still lands on the tone
    best = (-1e9, None)
    for r in rows:
        cols = r.split(", ")
        dbms = np.array([float(x) for x in cols[6:-1]])
        i = int(np.argmax(dbms))
        if dbms[i] > best[0]:
            best = (dbms[i], float(cols[2]) + i * float(cols[4]))
    assert abs(best[1] - 102.5e6) < 5e4


def _record(tmp_path, name, rate, n, carrier, f, dev="15k"):
    cap = tmp_path / name
    rc = rx_sdr.main(["-d", f"synth=fm,carrier={carrier},audio=1k,dev={dev},"
                      "amp=0.8,noise=0.001",
                      "-f", f, "-s", str(rate), "-n", str(n),
                      "-F", "CS16", str(cap)])
    assert rc == 0
    return cap


def test_rx_fm_shard_exact_for_fir_only_chain(tmp_path, monkeypatch):
    """-E shard == streaming run, byte for byte, when the chain has no IIR
    stages (-M fm, no deemph/dc: halo warm-up is exact).

    RX_SHARD_BLOCKS=5 bounds the super-chunk to 8 devices x 5 blocks, so
    this 96-block capture streams through as 2 full sharded super-chunks
    (first + continuation-halo mode) plus a 16-block single-device tail —
    all three paths of the bounded-memory pipeline, byte-compared against
    the streaming run."""
    # -s 96k -> downsample 11 -> capture 1.056M; fs/4 = 264k
    cap = _record(tmp_path, "c.cs16", 1_056_000, 1_584_000,
                  carrier="100M", f="100.264M")
    base_args = ["-f", "100M", "-M", "fm", "-s", "96k", "-A", "std",
                 "-d", f"file={cap},format=CS16,rate=1056k"]
    a_stream, a_shard = tmp_path / "stream.raw", tmp_path / "shard.raw"
    assert rx_fm.main(base_args + [str(a_stream)]) == 0
    monkeypatch.setenv("RX_SHARD_BLOCKS", "5")
    assert rx_fm.main(base_args + ["-E", "shard", str(a_shard)]) == 0
    s = np.fromfile(a_stream, np.int16)
    h = np.fromfile(a_shard, np.int16)
    assert s.size > 50000
    np.testing.assert_array_equal(s, h)


def test_rx_fm_shard_wbfm_snr(tmp_path, monkeypatch):
    """wbfm (deemph IIR) via -E shard: tone recovered, high SNR vs the
    streaming output after the per-shard warm-up transient."""
    cap = _record(tmp_path, "w.cs16", 1_020_000, 1_530_000,
                  carrier="100.016M", f="100.271M", dev="75k")
    base_args = ["-f", "100M", "-M", "wbfm", "-A", "std",
                 "-d", f"file={cap},format=CS16,rate=1020k"]
    a_stream, a_shard = tmp_path / "s.raw", tmp_path / "h.raw"
    assert rx_fm.main(base_args + [str(a_stream)]) == 0
    monkeypatch.setenv("RX_SHARD_BLOCKS", "4")   # force super-chunking
    assert rx_fm.main(base_args + ["-E", "shard", str(a_shard)]) == 0
    s = np.fromfile(a_stream, np.int16).astype(np.float64)
    h = np.fromfile(a_shard, np.int16).astype(np.float64)
    assert s.size == h.size > 20000
    # skip the first 5% (global turn-on transient both runs share)
    k = s.size // 20
    assert snr_db(s[k:], h[k:]) > 35
    # and the tone is there
    a = h[2000:] - h[2000:].mean()
    sp = np.abs(np.fft.rfft(a * np.hanning(a.size))) ** 2
    fr = np.fft.rfftfreq(a.size, 1 / 32000)
    assert abs(fr[np.argmax(sp)] - 1000.0) < 10


def test_rx_fm_shard_wbfm_dc_snr(tmp_path, monkeypatch):
    """Round-5: wbfm + ``-E dc`` via -E shard — the audio DC block rides
    the exact closed-form seam (parallel/timeshard.py), so the sharded
    CLI output still matches the streaming run at high SNR.  The carrier
    is offset from the tuned frequency so the discriminator output has a
    big DC level and the EMA correction is load-bearing."""
    cap = _record(tmp_path, "wdc.cs16", 1_020_000, 1_530_000,
                  carrier="100.020M", f="100.275M", dev="75k")
    base_args = ["-f", "100M", "-M", "wbfm", "-A", "std", "-E", "dc",
                 "-d", f"file={cap},format=CS16,rate=1020k"]
    a_stream, a_shard = tmp_path / "sdc.raw", tmp_path / "hdc.raw"
    assert rx_fm.main(base_args + [str(a_stream)]) == 0
    monkeypatch.setenv("RX_SHARD_BLOCKS", "4")   # force super-chunking
    assert rx_fm.main(base_args + ["-E", "shard", str(a_shard)]) == 0
    s = np.fromfile(a_stream, np.int16).astype(np.float64)
    h = np.fromfile(a_shard, np.int16).astype(np.float64)
    assert s.size == h.size > 20000
    k = s.size // 20
    assert snr_db(s[k:], h[k:]) > 35


def test_rx_fm_shard_tail_path(tmp_path):
    """A capture that does NOT divide into 8 equal shards exercises the
    single-device tail replay (output still equals the streaming run)."""
    # 1.056M capture rate, 10.5 blocks' worth of samples
    cap = _record(tmp_path, "t.cs16", 1_056_000, 700_000,
                  carrier="100M", f="100.264M")
    base_args = ["-f", "100M", "-M", "fm", "-s", "96k", "-A", "std",
                 "-d", f"file={cap},format=CS16,rate=1056k"]
    a_stream, a_shard = tmp_path / "st.raw", tmp_path / "sh.raw"
    assert rx_fm.main(base_args + [str(a_stream)]) == 0
    assert rx_fm.main(base_args + ["-E", "shard", str(a_shard)]) == 0
    np.testing.assert_array_equal(np.fromfile(a_stream, np.int16),
                                  np.fromfile(a_shard, np.int16))


def test_rx_fm_shard_rejects_scan_and_squelch():
    assert rx_fm.main(["-f", "100M", "-l", "50", "-E", "shard",
                       "-d", "synth=tone", "-"]) == 1
