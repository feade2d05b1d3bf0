"""Checkpoint/resume and the -b latency knob, end-to-end through the CLIs.

The reference has no checkpointing (SURVEY.md §5): a killed rx_power loses
up to one -i interval, a killed rx_fm just truncates.  Here the carried DSP
state is a small pytree, so rx_fm snapshots it periodically
(``--checkpoint``) and ``--resume`` continues **bit-identically** — the
output file is rewound to the snapshot point, so even a SIGKILL mid-write
leaves no seam.  rx_power snapshots its integration accumulators every
sweep (``rtl_power.c:813-816`` is the interval-loss behavior being
improved on).
"""

import numpy as np
import pytest

from rx_tools_tpu.apps import rx_fm, rx_power, rx_sdr
from rx_tools_tpu.models import powerscan
from rx_tools_tpu.stream.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture(autouse=True)
def _cpu_platform(monkeypatch):
    monkeypatch.setenv("RX_PLATFORM", "cpu")


def _record_fm_capture(tmp_path, n_samples):
    """A deterministic FM capture at the fm-mode capture plan (-s 24k ->
    downsample 42 -> 1008k, station at -fs/4 of file center)."""
    cap = tmp_path / "cap.cs16"
    rc = rx_sdr.main(["-d", "synth=fm,audio=1k,dev=9k,amp=0.8,noise=0.001,"
                      "carrier=100M,seed=7",
                      "-f", "100.252M", "-s", "1008k", "-n", str(n_samples),
                      "-F", "CS16", str(cap)])
    assert rc == 0
    return cap


def _fm_args(cap, extra, out):
    return (["-f", "100M", "-s", "24k",
             "-d", f"file={cap},format=CS16,rate=1008k"]
            + extra + [str(out)])


def test_rx_fm_checkpoint_resume_bit_identical(tmp_path):
    # block size for -s 24k: ceil(8192/168)*168 = 8232 complex samples;
    # 48 blocks so the chunked runner sees 3 full chunks of 16
    cap = _record_fm_capture(tmp_path, 48 * 8232)

    ref = tmp_path / "ref.wav"
    rc = rx_fm.main(_fm_args(cap, ["-E", "wav"], ref))
    assert rc == 0

    # interrupted run: stop after 20 blocks (mid-stream), snapshotting
    # after every drained chunk
    ck = tmp_path / "state.npz"
    out = tmp_path / "out.wav"
    rc = rx_fm.main(_fm_args(cap, ["-E", "wav", "--checkpoint", str(ck),
                                   "--blocks", "20"], out))
    assert rc == 0 and ck.exists()
    assert out.read_bytes() != ref.read_bytes()   # genuinely partial

    # resume: rewinds the output to the snapshot and continues to EOF
    rc = rx_fm.main(_fm_args(cap, ["-E", "wav", "--resume", str(ck)], out))
    assert rc == 0
    assert out.read_bytes() == ref.read_bytes()


def test_rx_fm_resume_survives_post_checkpoint_garbage(tmp_path):
    """A hard kill can leave audio written after the last snapshot (even a
    torn half-sample): resume truncates it away."""
    cap = _record_fm_capture(tmp_path, 48 * 8232)
    ref = tmp_path / "ref.raw"
    assert rx_fm.main(_fm_args(cap, [], ref)) == 0

    ck = tmp_path / "state.npz"
    out = tmp_path / "out.raw"
    assert rx_fm.main(_fm_args(cap, ["--checkpoint", str(ck),
                                     "--blocks", "16"], out)) == 0
    with open(out, "ab") as f:          # the "crash wrote garbage" tail
        f.write(b"\xde\xad\xbe")
    assert rx_fm.main(_fm_args(cap, ["--resume", str(ck)], out)) == 0
    assert out.read_bytes() == ref.read_bytes()


def test_rx_fm_resume_rejects_changed_plan(tmp_path):
    cap = _record_fm_capture(tmp_path, 20 * 8232)
    ck = tmp_path / "state.npz"
    out = tmp_path / "out.raw"
    assert rx_fm.main(_fm_args(cap, ["--checkpoint", str(ck),
                                     "--blocks", "16"], out)) == 0
    # different -s changes the block plan (32k -> downsample 32 -> block
    # 8192, vs 8232); resume must refuse, not corrupt
    rc = rx_fm.main(["-f", "100M", "-s", "32k",
                     "-d", f"file={cap},format=CS16,rate=1008k",
                     "--resume", str(ck), str(out)])
    assert rc == 1


def test_rx_fm_b1_streamrunner_matches_chunked(tmp_path):
    """-b 1 (per-block StreamRunner) and the default chunked runner demod
    the same capture to the same bytes (capture = exact block multiple)."""
    cap = _record_fm_capture(tmp_path, 24 * 8232)
    a = tmp_path / "a.raw"
    b = tmp_path / "b.raw"
    assert rx_fm.main(_fm_args(cap, [], a)) == 0
    assert rx_fm.main(_fm_args(cap, ["-b", "1"], b)) == 0
    ba, bb = a.read_bytes(), b.read_bytes()
    assert len(ba) > 8000          # 24 blocks -> ~4700 audio samples
    assert ba == bb


def test_rx_fm_checkpoint_rejected_while_scanning(tmp_path):
    rc = rx_fm.main(["-f", "100M", "-f", "101M", "-l", "10",
                     "--checkpoint", str(tmp_path / "ck.npz"),
                     "-d", "synth=fm", str(tmp_path / "o.raw")])
    assert rc == 1


# ---------------------------------------------------------------------------
# rx_power accumulator checkpointing


def test_sweep_accum_roundtrip_preserves_integration(tmp_path):
    """save/load of SweepAccum mid-interval: 1 sweep + resume + 1 sweep
    == 2 straight sweeps, bit-exact on the CSV values."""
    cfg = powerscan.PowerConfig(bin_e=6, downsample=4, downsample_passes=0,
                                boxcar=True, comp_fir_size=0,
                                window="hamming", peak_hold=False,
                                buf_len=2048)
    rng = np.random.default_rng(3)
    sweep1 = rng.integers(-3000, 3000, (2, 2048), np.int16)
    sweep2 = rng.integers(-3000, 3000, (2, 2048), np.int16)

    acc = powerscan.new_sweep_accum(2, cfg)
    acc = powerscan.sweep_step(cfg, acc, sweep1)
    path = str(tmp_path / "acc.npz")
    save_checkpoint(path, __import__("jax").device_get(acc), meta={"k": 1})

    fresh = powerscan.new_sweep_accum(2, cfg)
    restored, meta = load_checkpoint(path, fresh)
    assert meta == {"k": 1}
    restored = powerscan.sweep_step(cfg, restored, sweep2)

    straight = powerscan.new_sweep_accum(2, cfg)
    straight = powerscan.sweep_step(cfg, straight, sweep1)
    straight = powerscan.sweep_step(cfg, straight, sweep2)

    np.testing.assert_array_equal(np.asarray(restored.avg),
                                  np.asarray(straight.avg))
    np.testing.assert_array_equal(np.asarray(restored.samples),
                                  np.asarray(straight.samples))


def test_rx_power_checkpoint_cli(tmp_path):
    cap = tmp_path / "cap.cs16"
    assert rx_sdr.main(["-d", "synth=tone,amp=0.5", "-f", "100M",
                        "-s", "2048k", "-n", "600k", "-F", "CS16",
                        str(cap)]) == 0
    ck = tmp_path / "acc.npz"
    csv1 = tmp_path / "a.csv"
    args = ["-f", "99M:101M:10k", "-1", "-t", "1",
            "-d", f"file={cap},format=CS16,rate=2048k"]
    assert rx_power.main(args + ["--checkpoint", str(ck), str(csv1)]) == 0
    assert ck.exists()
    # -1 flushed, so the persisted accumulators are the post-flush reset
    cfg_probe, meta = None, None
    import json, zipfile
    with np.load(ck) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        assert meta["n_tunes"] >= 1
        assert all(np.all(z[k] == 0) for k in z.files if k != "__meta__")

    # resume with the same plan: runs clean, emits a well-formed CSV
    csv2 = tmp_path / "b.csv"
    assert rx_power.main(args + ["--resume", str(ck), str(csv2)]) == 0
    rows = csv2.read_text().strip().splitlines()
    assert rows and all(len(r.split(", ")) >= 7 for r in rows)

    # a different sweep plan must be refused
    bad = ["-f", "99M:101M:5k", "-1",
           "-d", f"file={cap},format=CS16,rate=2048k",
           "--resume", str(ck), str(tmp_path / "c.csv")]
    assert rx_power.main(bad) == 1
