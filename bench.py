"""Benchmark: WBFM demod throughput per chip (BASELINE.md config #1).

Drives the full rx_fm WBFM chain — capture rescale, fs/4 rotate, decimate
2.4 Msps -> ~171 kHz, fast-atan discriminator, 75 us deemphasis, rational
resample to 32 kHz audio — over device-resident I/Q blocks with one
``lax.scan`` dispatch per chunk, and reports I/Q samples processed per
second.  ``vs_baseline`` is the real-time multiple at 2.4 Msps input; the
reference's qualitative bar is 1.0 (real-time on weak CPUs,
``src/rtl_fm.c:24-26``), the driver target is >= 10.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import sys
import time

import numpy as np


RATE_IN_CAPTURE = 2_400_000     # config #1: 2.4 Msps I/Q input
AUDIO_OUT = 32_000


def main():
    import jax
    import jax.numpy as jnp

    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain
    from rx_tools_tpu.stream.scan import scan_fm_blocks

    # WBFM at 2.4 Msps capture: decimate by 14 -> 171.43k demod rate
    downsample = 14
    rate_in = RATE_IN_CAPTURE // downsample
    cfg = fmchain.FmConfig(
        mode="fm", rate_in=rate_in, rate_out=rate_in, rate_out2=AUDIO_OUT,
        downsample=downsample, custom_atan=1,
        deemph_a=ops.deemph_alpha(rate_in, 75), squelch_level=0.0)

    # block geometry: ~262k complex samples x 16 blocks/dispatch measured
    # fastest on v5e (see docs/PERF.md block-size sweep)
    n = fmchain.block_samples(cfg, target=262144)
    blocks_per_chunk = 16
    rng = np.random.default_rng(0)
    # synthetic FM-ish content (noise is fine: throughput is data-independent)
    chunk = rng.integers(-16000, 16000,
                         (blocks_per_chunk, 2 * n)).astype(np.int16)
    chunk_dev = jax.device_put(chunk)
    state = fmchain.init_state(cfg)

    # compile + warm up
    state2, audio, nv, lv = scan_fm_blocks(cfg, state, chunk_dev)
    jax.block_until_ready(audio)

    # steady state: aim for ~3 s of wall time
    t0 = time.perf_counter()
    iters = 0
    st = state
    while True:
        st, audio, nv, lv = scan_fm_blocks(cfg, st, chunk_dev)
        iters += 1
        if iters % 4 == 0:
            jax.block_until_ready(audio)
            if time.perf_counter() - t0 > 3.0:
                break
    jax.block_until_ready(audio)
    dt = time.perf_counter() - t0

    samples = iters * blocks_per_chunk * n
    rate = samples / dt
    print(json.dumps({
        "metric": "wbfm_demod_throughput_per_chip",
        "value": round(rate, 1),
        "unit": "iq_samples/s",
        "vs_baseline": round(rate / RATE_IN_CAPTURE, 2),
    }))
    print(f"# {samples} samples in {dt:.2f}s; block={n}, "
          f"chunk={blocks_per_chunk}, backend={jax.default_backend()}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
