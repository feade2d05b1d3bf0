"""Round-4: PFB channelizer re-measure with the batched MXU tail.

Round 3 left the 64-channel step tail-bound at 5.3 GB/s (batched tail
alone 10.9).  Round 4 moved the batched deemph to the triangular-MXU
scan and the batched resampler to the vmapped gather-free rows
formulation; this re-measures the step and the tail under the
distinct-chunks scheme (round 3's pfb numbers used the int16
perturbation scheme the fusion-barrier finding later discredited).

  step   pfb_step at C=64 (capture int16 in)
  tail   batched demod tail alone (f32 planar in)
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
    phases = sys.argv[1:] or ["step", "tail"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu.models import channelizer as chan
    from rx_tools_tpu.models import pfb

    log(f"backend={jax.default_backend()} phases={phases}")
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")
    results = {}

    CH = 4
    K1, K2 = 1, 9
    NPOOL = K2 * CH
    cfg = pfb.PfbConfig(capture_rate=2_400_000, n_channels=64,
                        custom_atan=1, deemph_a=7, rate_out2=32_000)
    nb = pfb.block_samples(cfg)
    log(f"pfb block: {nb} capture samples, C=64")

    if "step" in phases:
        data = rng.integers(-16000, 16000,
                            (NPOOL, 2 * nb)).astype(np.int16)
        dd = jax.device_put(data)
        st0 = pfb.init_state(cfg)
        per_pass = CH * 2 * nb * 2

        def make_step(k):
            @jax.jit
            def run(args):
                st, pool = args
                acc = jnp.zeros(())
                for r in range(k):
                    for c in range(CH):
                        st, audio, nv = pfb.pfb_step(
                            cfg, st, pool[r * CH + c])
                        acc = (acc + jnp.sum(audio)
                               + jnp.sum(nv).astype(jnp.float32))
                return acc + st.deemph_avg.sum()
            return run
        rs, rej = k_rate_gated(make_step, (st0, dd), per_pass, K1, K2)
        g = statistics.median(rs) if rs else 0.0
        results["pfb_step4"] = round(g / 1e9, 2)
        results["pfb_step4_chanrt"] = round(g / 4.0 / 2_400_000 * 64, 0)
        log(f"pfb_step4: {['%.2f' % (x/1e9) for x in rs]} GB/s (rej={rej})")

    if "tail" in phases:
        m = nb // 64
        st0 = pfb.init_state(cfg)
        zpool = rng.normal(0, 50, (NPOOL, 2, 64, m)).astype(np.float32)
        zd = jax.device_put(zpool)
        per_pass = CH * 2 * 64 * m * 4

        def make_tail(k):
            @jax.jit
            def run(pool):
                acc = jnp.zeros(())
                for r in range(k):
                    for c in range(CH):
                        zi = pool[r * CH + c, 0]
                        zq = pool[r * CH + c, 1]
                        prev, davg, racc, rph, audio, nv = (
                            chan.demod_tail_batch_planar(
                                cfg, st0.prev_iq, st0.deemph_avg,
                                st0.resamp.acc, st0.resamp.phase, zi, zq))
                        acc = (acc + jnp.sum(audio)
                               + jnp.sum(nv).astype(jnp.float32)
                               + jnp.sum(prev) + jnp.sum(davg))
                return acc
            return run
        rs, rej = k_rate_gated(make_tail, zd, per_pass, K1, 17)
        results["pfb_tail4"] = round(
            (statistics.median(rs) if rs else 0.0) / 1e9, 2)
        log(f"pfb_tail4: {['%.2f' % (x/1e9) for x in rs]} GB/s (rej={rej})")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
