"""Round-4 rejected-variant A/Bs, consolidated for reproducibility.

Each phase reproduces a negative result recorded in docs/PERF.md:

  pfbrs    the vmapped rows-resampler regression in the 64-channel PFB
           step (4.07 -> 1.43 GB/s) and the batched-deemph neutrality
  pfbsize  PFB step at 128k vs 1M-sample blocks (rules out per-call
           latency as the step's bound: 4.1 vs 3.7)
  i8       the int8-split frontend dot (fe 17.9 vs 34.9, chain 23.4 vs
           42.2 — int8 plane stores sit in the ~36 GB/s narrow-store
           class)

Scheme: distinct-chunks, pool-as-argument, gated K-differenced rounds.
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
    phases = sys.argv[1:] or ["pfbrs", "pfbsize", "i8"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import dataclasses
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain, fmchunk, pfb
    from rx_tools_tpu.ops import filters, frontend_mxu, resample

    log(f"backend={jax.default_backend()} phases={phases}")
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")
    results = {}
    CH, K1, K2 = 4, 1, 9
    NPOOL = K2 * CH

    def pfb_step_rate(cfg, dd, per_pass, tag):
        st0 = pfb.init_state(cfg)

        def make(k):
            @jax.jit
            def run(args):
                st, pool = args
                acc = jnp.zeros(())
                for r in range(k):
                    for c in range(CH):
                        st, audio, nv = pfb.pfb_step(cfg, st,
                                                     pool[r * CH + c])
                        acc = (acc + jnp.sum(audio)
                               + jnp.sum(nv).astype(jnp.float32))
                return acc + st.deemph_avg.sum()
            return run
        rs, rej = k_rate_gated(make, (st0, dd), per_pass, K1, K2)
        results[tag] = round((statistics.median(rs) if rs else 0.0) / 1e9, 2)
        log(f"{tag}: {['%.2f' % (x/1e9) for x in rs]} (rej={rej})")

    if "pfbrs" in phases:
        cfg = pfb.PfbConfig(capture_rate=2_400_000, n_channels=64,
                            custom_atan=1, deemph_a=7, rate_out2=32_000)
        nb = pfb.block_samples(cfg)
        data = rng.integers(-16000, 16000, (NPOOL, 2 * nb)).astype(np.int16)
        dd = jax.device_put(data)
        pfb_step_rate(cfg, dd, CH * 2 * nb * 2, "step_prod")
        # re-enable the (reverted) vmapped rows resampler for the A/B
        orig = resample.resample_rational_batch

        def rows_batch(state, x, fast, slow):
            import math as _m
            g = _m.gcd(int(fast), int(slow))
            fr, sr = int(fast) // g, int(slow) // g
            st2, y, nv = jax.vmap(
                lambda a, p, xc: resample._resample_rows(
                    resample.ResampleState(a, p), xc, fr, sr)
            )(state.acc, state.phase, x)
            return (resample.ResampleState(st2.acc, st2.phase), y, nv[0])
        resample.resample_rational_batch = rows_batch
        try:
            import rx_tools_tpu.models.channelizer as _chan
            _chan.resample_rational_batch = rows_batch
            pfb_step_rate(dataclasses.replace(cfg, beta=8.61), dd,
                          CH * 2 * nb * 2, "step_vmaprows")
        finally:
            resample.resample_rational_batch = orig
            import rx_tools_tpu.models.channelizer as _chan
            _chan.resample_rational_batch = orig

    if "pfbsize" in phases:
        for tgt, tag in [(131072, "s128k"), (1048576, "s1m")]:
            cfg = pfb.PfbConfig(capture_rate=2_400_000, n_channels=64,
                                custom_atan=1, deemph_a=7, rate_out2=32_000,
                                beta=8.6 + tgt * 1e-9)   # distinct trace
            nb = pfb.block_samples(cfg, target=tgt)
            data = rng.integers(-16000, 16000,
                                (NPOOL, 2 * nb)).astype(np.int16)
            dd = jax.device_put(data)
            pfb_step_rate(cfg, dd, CH * 2 * nb * 2, f"step_{tag}")

    if "i8" in phases:
        D, n, BL = 14, 258048, 12
        data = rng.integers(-16000, 16000,
                            (NPOOL, BL, 2 * n)).astype(np.int16)
        dd = jax.device_put(data)
        flat = dd.reshape(NPOOL, BL * 2 * n)
        per_pass = CH * BL * 2 * n * 2
        for name, fn in [
            ("i8", lambda v: frontend_mxu.capture_frontend_mm_i8(v, D)),
            ("f32", lambda v: frontend_mxu.capture_frontend_mm(v, D)),
        ]:
            def mk(k, fn=fn):
                @jax.jit
                def run(pool):
                    s = jnp.zeros((), jnp.float32)
                    for r in range(k):
                        for c in range(CH):
                            zi, zq = fn(pool[r * CH + c])
                            s = s + jnp.sum(zi) + jnp.sum(zq)
                    return s
                return run
            rs, rej = k_rate_gated(mk, flat, per_pass, K1, K2)
            results[f"fe_{name}"] = round(statistics.median(rs) / 1e9, 1)
            log(f"fe_{name}: {['%.1f' % (x/1e9) for x in rs]} (rej={rej})")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
