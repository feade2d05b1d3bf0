"""Round-5c: i16-dot output-layout A/B + engine cross-check, interleaved.

  fe2      flat chain with the single-dot i16 frontend (production,
           column-block slices on the output) vs the two-dot twin
           (planar outputs by construction, second operand read) —
           tools/frontend_mxu.capture_frontend_mm_i16{,_2}
  engines  scan vs flat one more interleaved session (the official bench
           and cs25c disagreed on their ordering across sessions)

Run: PYTHONPATH=/root/repo python tools/chipsuite26.py > /tmp/cs26.log 2>&1
"""

import json
import os
import statistics
import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain, fmchunk
    from rx_tools_tpu.ops import frontend_mxu
    from rx_tools_tpu.stream.scan import scan_fm_blocks

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))

    downsample = 14
    rate_in = 2_400_000 // downsample
    cfg = fmchain.FmConfig(
        mode="fm", rate_in=rate_in, rate_out=rate_in, rate_out2=32_000,
        downsample=downsample, custom_atan=1,
        deemph_a=ops.deemph_alpha(rate_in, 75), squelch_level=0.0)
    n = fmchain.block_samples(cfg, target=258048)
    CH, K1, K2 = 4, 1, 5
    pool = jax.device_put(rng.integers(
        -16000, 16000, (K2 * CH, 12, 2 * n)).astype(np.int16))
    st0 = fmchain.init_state(cfg)
    per_pass = CH * 12 * n * 4.0

    orig = ops.capture_frontend_planar

    def make(eng, k, fe=None):
        if fe is not None:
            ops.capture_frontend_planar = (
                lambda b, d, rotate=True, _f=fe: _f(b, d, rotate))
        else:
            ops.capture_frontend_planar = orig
        fmchunk.fm_chunk_step.clear_cache()
        scan_fm_blocks.clear_cache()

        @jax.jit
        def run(args):
            st, pl = args
            acc = jnp.zeros(())
            for r in range(k):
                for c in range(CH):
                    st, audio, nv, lv = eng(cfg, st, pl[r * CH + c])
                    acc = (acc + jnp.sum(audio)
                           + nv.sum().astype(jnp.float32) + jnp.sum(lv))
            return acc + st.deemph_avg + st.prev_iq[0]
        return run

    variants = {
        "flat_i16": (fmchunk.fm_chunk_step, None),
        "flat_i16x2": (fmchunk.fm_chunk_step,
                       frontend_mxu.capture_frontend_mm_i16_2),
        "scan_i16": (scan_fm_blocks, None),
    }
    runs = {}
    for name, (eng, fe) in variants.items():
        r1, r2 = make(eng, K1, fe), make(eng, K2, fe)
        t0 = time.time()
        float(r1((st0, pool))); float(r2((st0, pool)))
        log(f"{name} compiled in {time.time()-t0:.0f}s")
        runs[name] = (r1, r2)
    ops.capture_frontend_planar = orig

    rounds = {k: [] for k in variants}
    for _ in range(5):
        for name, (r1, r2) in runs.items():
            t1s, t2s = [], []
            for _ in range(12):
                t0 = time.perf_counter(); float(r1((st0, pool)))
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); float(r2((st0, pool)))
                t2s.append(time.perf_counter() - t0)
            dt = (statistics.median(t2s) - statistics.median(t1s)) / (K2 - K1)
            if dt > 0:
                rounds[name].append(per_pass / dt)
    results = {}
    for name, rs in rounds.items():
        g = statistics.median(rs) if rs else 0.0
        results[name + "_gbs"] = round(g / 1e9, 2)
        log(f"{name}: {['%.1f' % (x/1e9) for x in rs]} GB/s")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
