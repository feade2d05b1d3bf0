"""A multi-hop rx_power sweep over a multi-emitter scene: every station
lands in the right bin of the stitched CSV, across hop boundaries."""

import numpy as np
import pytest

from rx_tools_tpu.apps import rx_power


@pytest.fixture(autouse=True)
def _cpu(monkeypatch):
    monkeypatch.setenv("RX_PLATFORM", "cpu")


def test_sweep_finds_three_emitters_across_hops(tmp_path):
    # 88-96 MHz span forces multiple <=2.8 MHz hops; emitters placed so
    # they fall in different hops
    carriers = [88.7e6, 91.3e6, 95.1e6]
    scene = ("synth=tone,carrier=" + "|".join(f"{c:.0f}" for c in carriers)
             + ",amp=0.4|0.4|0.4,noise=0.01")
    csv = tmp_path / "sweep.csv"
    rc = rx_power.main(["-f", "88M:96M:20k", "-1", "-d", scene, str(csv)])
    assert rc == 0

    freqs, dbs = [], []
    for ln in open(csv):
        parts = [p.strip() for p in ln.split(",")]
        lo, step = float(parts[2]), float(parts[4])
        for i, v in enumerate(parts[6:]):
            freqs.append(lo + (i + 0.5) * step)
            dbs.append(float(v))
    freqs = np.array(freqs)
    dbs = np.array(dbs)
    assert freqs.min() <= 88e6 + 5e4 and freqs.max() >= 96e6 - 1e5

    floor = np.median(dbs)
    for c in carriers:
        near = np.abs(freqs - c) < 60e3
        assert near.any(), c
        # the emitter stands >= 15 dB over the floor at its own frequency
        assert dbs[near].max() > floor + 15, (c, dbs[near].max(), floor)
    # and nothing comparable where there is no emitter
    quiet = np.abs(freqs - 93.0e6) < 100e3
    assert dbs[quiet].max() < floor + 10
