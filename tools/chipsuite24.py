"""Round-5b: int16-dot frontend phase-block (p) sweep, in-chain.

chipsuite23 flipped the production frontend to the raw-int16 dot
(`capture_frontend_mm_i16`, p=32).  The phase-block size trades matrix
shape: p=32 -> (896, 64) masks, p=64 -> (1792, 128) (full lane width
output), p=128 -> (3584, 256).  This measures the flat chain with each,
same distinct-chunks gated method, to either move the default or record
that p=32 is at its bound.

  psweep    chain GB/s at p in {16, 32, 64, 128}

Run: nohup python tools/chipsuite24.py > /tmp/cs24.log 2>&1 &
"""

import json
import os
import statistics
import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def k_rate_gated(make_run, arg, work, k1, k2, reps=14, rounds=4, max_att=8):
    r1, r2 = make_run(k1), make_run(k2)
    t0 = time.time(); float(r1(arg)); log(f"  compile k={k1}: {time.time()-t0:.0f}s")
    t0 = time.time(); float(r2(arg)); log(f"  compile k={k2}: {time.time()-t0:.0f}s")
    out, rej = [], 0
    for _ in range(max_att):
        if len(out) >= rounds:
            break
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); float(r1(arg))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(r2(arg))
            t2s.append(time.perf_counter() - t0)
        dt = (statistics.median(t2s) - statistics.median(t1s)) / (k2 - k1)
        if dt <= 0:
            rej += 1
            continue
        out.append(work / dt)
    return out, rej


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain, fmchunk
    from rx_tools_tpu.ops import frontend_mxu

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    results = {}

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
    for p in (16, 32, 64, 128):
        def planar_p(block, d, rotate=True, _p=p):
            return frontend_mxu.capture_frontend_mm_i16(block, d, rotate,
                                                        p=_p)
        ops.capture_frontend_planar = planar_p
        fmchunk.fm_chunk_step.clear_cache()

        def mk(k):
            @jax.jit
            def run(args):
                st, pl = args
                acc = jnp.zeros(())
                for r in range(k):
                    for c in range(CH):
                        st, audio, nv, lv = fmchunk.fm_chunk_step(
                            cfg, st, pl[r * CH + c])
                        acc = (acc + jnp.sum(audio)
                               + nv.sum().astype(jnp.float32) + jnp.sum(lv))
                return acc + st.deemph_avg + st.prev_iq[0]
            return run
        rs, rej = k_rate_gated(mk, (st0, pool), per_pass, K1, K2)
        g = statistics.median(rs) if rs else 0.0
        results[f"chain_i16_p{p}_gbs"] = round(g / 1e9, 2)
        log(f"p={p}: {['%.1f' % (x/1e9) for x in rs]} GB/s (rej={rej})")
    ops.capture_frontend_planar = orig
    fmchunk.fm_chunk_step.clear_cache()

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
