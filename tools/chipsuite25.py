"""Round-5b: scan-engine per-block tail ablation, in-chain.

After the batched-front rework the scan engine's residual vs the flat
engine is its per-block audio tail (levels, deemph, DC, resampler — the
bit-identical per-block semantics).  This ablates the tail in-chain to
name the per-block construct that costs:

  scantail   scan full / scan no-resampler / scan no-deemph-no-resampler
             vs flat full, interleaved rounds (chip drift hits all)

Run: PYTHONPATH=/root/repo python tools/chipsuite25.py > /tmp/cs25.log 2>&1 &
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
    import dataclasses
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain, fmchunk
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
    per_pass = CH * 12 * n * 4.0

    variants = {
        "scan_full": (scan_fm_blocks, cfg, None),
        "scan_nors": (scan_fm_blocks,
                      dataclasses.replace(cfg, rate_out2=-1), None),
        "scan_nodnr": (scan_fm_blocks,
                       dataclasses.replace(cfg, rate_out2=-1, deemph_a=0),
                       None),
        "flat_full": (fmchunk.fm_chunk_step, cfg, None),
        # interleaved decision round for the chipsuite24 p-sweep hint
        # (p=16 medianed above p=32 but in drifting, non-interleaved
        # rounds): flat chain with the i16 dot at p=16
        "flat_p16": (fmchunk.fm_chunk_step, cfg, 16),
    }

    from rx_tools_tpu.ops import frontend_mxu
    orig_planar = ops.capture_frontend_planar

    def make(eng, cfgv, k, p_override):
        st0 = fmchain.init_state(cfgv)
        if p_override is not None:
            ops.capture_frontend_planar = (
                lambda b, d, rotate=True, _p=p_override:
                frontend_mxu.capture_frontend_mm_i16(b, d, rotate, p=_p))
            fmchunk.fm_chunk_step.clear_cache()
        else:
            ops.capture_frontend_planar = orig_planar
            fmchunk.fm_chunk_step.clear_cache()

        @jax.jit
        def run(pool):
            st = st0
            acc = jnp.zeros(())
            for r in range(k):
                for c in range(CH):
                    st, audio, nv, lv = eng(cfgv, st, pool[r * CH + c])
                    acc = (acc + jnp.sum(audio)
                           + nv.sum().astype(jnp.float32) + jnp.sum(lv))
            return acc + st.deemph_avg + st.prev_iq[0]
        return run

    runs = {}
    for name, (eng, cfgv, p_ov) in variants.items():
        r1, r2 = make(eng, cfgv, K1, p_ov), make(eng, cfgv, K2, p_ov)
        t0 = time.time(); float(r1(pool)); float(r2(pool))
        log(f"{name} compiled in {time.time()-t0:.0f}s")
        runs[name] = (r1, r2)
    ops.capture_frontend_planar = orig_planar

    rounds = {k: [] for k in variants}
    for _ in range(4):                      # interleaved rounds
        for name, (r1, r2) in runs.items():
            t1s, t2s = [], []
            for _ in range(12):
                t0 = time.perf_counter(); float(r1(pool))
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); float(r2(pool))
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
