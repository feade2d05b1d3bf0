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
    from rx_tools_tpu.models import fmchain, fmchunk
    from rx_tools_tpu.stream.scan import scan_fm_blocks

    # WBFM at 2.4 Msps capture: decimate by 14 -> 171.43k demod rate
    downsample = 14
    rate_in = RATE_IN_CAPTURE // downsample
    cfg = fmchain.FmConfig(
        mode="fm", rate_in=rate_in, rate_out=rate_in, rate_out2=AUDIO_OUT,
        downsample=downsample, custom_atan=1,
        deemph_a=ops.deemph_alpha(rate_in, 75), squelch_level=0.0)

    # block geometry: ~262k complex samples x 12 blocks/dispatch — the
    # measured sweet spot on v5e that both engines support (the flat
    # engine's resampler phase must fit int32; docs/PERF.md)
    n = fmchain.block_samples(cfg, target=262144)
    blocks_per_chunk = 12
    rng = np.random.default_rng(0)
    # synthetic FM-ish content (noise is fine: throughput is data-independent)
    chunk = rng.integers(-16000, 16000,
                         (blocks_per_chunk, 2 * n)).astype(np.int16)
    chunk_dev = jax.device_put(chunk)
    state = fmchain.init_state(cfg)

    def measure(engine):
        st, audio, nv, lv = engine(cfg, state, chunk_dev)   # compile + warm
        jax.block_until_ready(audio)
        t0 = time.perf_counter()
        iters = 0
        st = state
        while True:
            st, audio, nv, lv = engine(cfg, st, chunk_dev)
            iters += 1
            if iters % 4 == 0:
                jax.block_until_ready(audio)
                if time.perf_counter() - t0 > 3.0:
                    break
        jax.block_until_ready(audio)
        dt = time.perf_counter() - t0
        return iters * blocks_per_chunk * n / dt

    # two equivalent engines (golden-tested identical): lax.scan over
    # blocks, and the scan-free flat formulation (models/fmchunk.py);
    # report the better of the two on this chip/run
    results = {"scan": measure(scan_fm_blocks),
               "flat": measure(fmchunk.fm_chunk_step)}
    engine, rate = max(results.items(), key=lambda kv: kv[1])
    print(json.dumps({
        "metric": "wbfm_demod_throughput_per_chip",
        "value": round(rate, 1),
        "unit": "iq_samples/s",
        "vs_baseline": round(rate / RATE_IN_CAPTURE, 2),
    }))
    print(f"# engine={engine} block={n} chunk={blocks_per_chunk} "
          f"backend={jax.default_backend()} "
          f"all={{{', '.join(f'{k}: {v/1e9:.2f}G' for k, v in results.items())}}}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
