"""rx_power --int-fft E2E: the CSV is bit-identical to the C model.

The test replays the CLI's exact read sequence (retune -> one 4096 flush
read -> one buf_len/2 data read per hop; the synth source in det=1 mode
makes reads a pure function of frequency) through the bit-faithful oracle
(c_ref.scanner_segment + csv_dbm, rtl_power.c:714-817) and requires the
CLI's CSV values to match to the last formatted digit.
"""

import numpy as np
import pytest

from rx_tools_tpu.apps import rx_power
from rx_tools_tpu.iq.sources import make_source
from rx_tools_tpu.models.power_plan import plan_sweep
from oracles import c_ref
from rx_tools_tpu.ops import windows
from rx_tools_tpu.utils.units import atofs

SRC = ("synth=tone,det=1,seed=2,carrier=101M|104M,amp=0.4|0.3,noise=0.02")


@pytest.fixture(autouse=True)
def _cpu(monkeypatch):
    monkeypatch.setenv("RX_PLATFORM", "cpu")


def _oracle_rows(lo, hi, max_bin, crop, window, sweeps=1):
    tunes = plan_sweep(lo, hi, max_bin, crop, boxcar=True)
    src = make_source(SRC)
    src.set_sample_rate(tunes[0].rate)
    wc = c_ref.window_coefs_int(windows.WINDOWS[window], 1 << tunes[0].bin_e)
    avgs = [None] * len(tunes)
    samples = [0] * len(tunes)
    for _ in range(sweeps):
        for i, t in enumerate(tunes):
            if src.get_frequency() != t.freq:
                src.set_frequency(t.freq)
                src.read_stream(4096)               # the settle flush read
            n, buf = src.read_stream(t.buf_len // 2)
            avgs[i], samples[i] = c_ref.scanner_segment(
                list(buf[: 2 * n]), t.bin_e, wc, ds=t.downsample,
                boxcar=True, avg=avgs[i], samples=samples[i])
    rows = []
    for i, t in enumerate(tunes):
        f_lo, f_hi, step, s, dbms = c_ref.csv_dbm(
            avgs[i], t.bin_e, t.rate, samples[i], t.crop, t.freq,
            t.downsample)
        rows.append([str(int(f_lo)), str(int(f_hi)), "%.2f" % step,
                     str(s)] + ["%.2f" % d for d in dbms])
    return rows


def _csv_rows(path):
    rows = []
    with open(path) as f:
        for line in f:
            rows.append(line.strip().split(", ")[2:])
    return rows


def test_int_fft_csv_bit_exact_vs_oracle(tmp_path):
    csv = tmp_path / "int.csv"
    rc = rx_power.main(["-f", "100M:106M:20k", "-1", "-S", "0",
                        "--int-fft", "-d", SRC, str(csv)])
    assert rc == 0
    got = _csv_rows(csv)
    want = _oracle_rows(atofs("100M"), atofs("106M"), atofs("20k"),
                        0.0, "rectangle")
    assert len(got) == len(want) >= 3
    assert got == want          # every formatted digit identical


def test_int_fft_with_window_and_crop(tmp_path):
    csv = tmp_path / "intw.csv"
    rc = rx_power.main(["-f", "100M:104M:50k", "-1", "-S", "0", "-c", "20%",
                        "-w", "hamming", "--int-fft", "-d", SRC, str(csv)])
    assert rc == 0
    got = _csv_rows(csv)
    want = _oracle_rows(atofs("100M"), atofs("104M"), atofs("50k"),
                        0.2, "hamming")
    assert got == want


def test_int_fft_rejects_fir_path(tmp_path):
    rc = rx_power.main(["-f", "100M:106M:20k", "-1", "-F", "9", "--int-fft",
                        "-d", SRC, str(tmp_path / "x.csv")])
    assert rc == 1


def test_int_fft_device_sharded_csv_identical(tmp_path):
    """Round-4: -t shards the bit-exact scanner over local devices via
    shard_map (parallel/hopshard.py::int_hop_sharded); integer outputs
    are deterministic, so sharded CSV == unsharded CSV bit-for-bit."""
    csv1 = tmp_path / "i1.csv"
    csv2 = tmp_path / "i2.csv"
    base = ["-f", "100M:106M:20k", "-1", "-S", "0", "--int-fft", "-d", SRC]
    assert rx_power.main(base + ["-t", "1", str(csv1)]) == 0
    assert rx_power.main(base + ["-t", "4", str(csv2)]) == 0
    assert _csv_rows(csv1) == _csv_rows(csv2)


def test_int_fft_checkpoint_resume(tmp_path):
    """Round-4: --int-fft composes with --checkpoint/--resume; the int64
    accumulators snapshot and restore exactly, and a float-tier
    checkpoint is refused (meta carries the tier)."""
    ck = tmp_path / "iacc.npz"
    csv1 = tmp_path / "i1.csv"
    base = ["-f", "100M:104M:50k", "-1", "-S", "0", "-t", "1",
            "--int-fft", "-d", SRC]
    assert rx_power.main(base + ["--checkpoint", str(ck), str(csv1)]) == 0
    assert ck.exists()
    # resume with the same plan runs clean and emits a well-formed CSV
    csv2 = tmp_path / "i2.csv"
    assert rx_power.main(base + ["--resume", str(ck), str(csv2)]) == 0
    rows = csv2.read_text().strip().splitlines()
    assert rows and all(len(r.split(", ")) >= 7 for r in rows)
    # the float tier must refuse an int-tier checkpoint (and vice versa)
    no_int = [a for a in base if a != "--int-fft"]
    assert rx_power.main(no_int + ["--resume", str(ck),
                                   str(tmp_path / "x.csv")]) == 1
