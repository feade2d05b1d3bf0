"""Round-4 baseline: per-stage profile of the production chain.

The round-3 verdict names the remainder: chain ~38 GB/s vs a ~800-1000
GB/s measured ceiling (3.7%), with the demod tail (discriminator, levels,
deemphasis, resampler — all at 1/D the capture rate) costing as much as
the whole capture-rate frontend.  This suite re-measures the breakdown at
the CURRENT bench geometry (258048-sample blocks, Pallas fused-convert
frontend in production) so the round-4 optimization order is driven by
fresh numbers, not round-3 memory.

Scheme: distinct-chunks, pool-as-argument, K-differenced medians — the
bench.py round-3b method (docs/PERF.md "Measuring honestly").

Phases:
  ceiling   int16 xor-reduce bandwidth ceiling (1 round, sanity anchor)
  ablate    full chain / -resampler / -deemph / frontend+levels only
  stage     tail stages alone on resident f32 planar pools at demod rate
"""

import json
import os
import statistics
import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def k_rate(make_run, arg, work_units_per_pass, k1, k2, reps=12, rounds=3):
    r1, r2 = make_run(k1), make_run(k2)
    t0 = time.time(); float(r1(arg)); log(f"  compile k={k1}: {time.time()-t0:.0f}s")
    t0 = time.time(); float(r2(arg)); log(f"  compile k={k2}: {time.time()-t0:.0f}s")
    out = []
    for _ in range(rounds):
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); float(r1(arg))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(r2(arg))
            t2s.append(time.perf_counter() - t0)
        dt = (statistics.median(t2s) - statistics.median(t1s)) / (k2 - k1)
        out.append(work_units_per_pass / dt if dt > 0 else 0.0)
    return out


def main():
    phases = sys.argv[1:] or ["ceiling", "ablate", "stage"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain, fmchunk
    from rx_tools_tpu.ops.resample import ResampleState, resample_rational

    log(f"backend={jax.default_backend()} phases={phases}")
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")
    results = {}

    D = 14
    n = 258048                      # bench geometry: K/block = 18432 (P=32)
    BL = 12
    CH = 4
    K1, K2 = 1, 3
    NPOOL = K2 * CH
    KB = n // D                     # output samples per block
    KTOT = BL * KB                  # demod-rate samples per chunk

    if "ceiling" in phases:
        pool = jax.device_put(rng.integers(
            -16000, 16000, 128 * 1024 * 1024).astype(np.int16))

        def make_ceil(n_passes):
            @jax.jit
            def run(p):
                def body(r, acc):
                    v = jnp.bitwise_xor(p, (r + 1).astype(jnp.int16))
                    return acc + jnp.sum(v.astype(jnp.int32))
                return jax.lax.fori_loop(0, n_passes, body,
                                         jnp.zeros((), jnp.int32))
            return run
        rs = k_rate(make_ceil, pool, pool.nbytes, 1, 41, reps=10, rounds=1)
        results["ceiling"] = round(rs[0] / 1e9, 1)
        log(f"ceiling: {results['ceiling']} GB/s")

    if "ablate" in phases:
        import dataclasses
        data = rng.integers(-16000, 16000,
                            (NPOOL, BL, 2 * n)).astype(np.int16)
        dd = jax.device_put(data)
        per_pass = CH * BL * 2 * n * 2
        base = fmchain.FmConfig(
            mode="fm", rate_in=2_400_000 // D, rate_out=2_400_000 // D,
            rate_out2=32_000, downsample=D, custom_atan=1,
            deemph_a=ops.deemph_alpha(2_400_000 // D, 75), squelch_level=0.0)

        def chain_rate(cfg, tag):
            st0 = fmchain.init_state(cfg)

            def make(k):
                @jax.jit
                def run(args):
                    st, pool = args
                    acc = jnp.zeros(())
                    for r in range(k):
                        for c in range(CH):
                            st, audio, nv, lv = fmchunk.fm_chunk_step(
                                cfg, st, pool[r * CH + c])
                            acc = (acc + jnp.sum(audio)
                                   + nv.sum().astype(jnp.float32)
                                   + jnp.sum(lv))
                    return acc + st.deemph_avg + st.prev_iq[0]
                return run
            try:
                rs = k_rate(make, (st0, dd), per_pass, K1, K2)
                results[tag] = round(statistics.median(rs) / 1e9, 2)
                log(f"{tag}: {['%.2f' % (x/1e9) for x in rs]} GB/s")
            except Exception as e:
                log(f"{tag} FAILED: {e!r}")
                results[tag] = None

        chain_rate(base, "chain")
        chain_rate(dataclasses.replace(base, rate_out2=0), "chain_nores")
        chain_rate(dataclasses.replace(base, rate_out2=0, deemph_a=0),
                   "chain_nodeemph")

        # frontend + levels only (no discriminator/tail at all)
        def make_felv(k):
            @jax.jit
            def run(pool):
                acc = jnp.zeros(())
                for r in range(k):
                    for c in range(CH):
                        blocks = pool[r * CH + c]
                        zi, zq = ops.capture_frontend_planar(
                            blocks.reshape(-1), D)
                        zib = zi.reshape(BL, KB)
                        zqb = zq.reshape(BL, KB)
                        t = jnp.sum(zib, axis=1) + jnp.sum(zqb, axis=1)
                        p = (jnp.sum(zib * zib, axis=1)
                             + jnp.sum(zqb * zqb, axis=1))
                        nn = 2 * KB
                        dc = t / nn
                        err = t * 2 * dc - dc * dc * nn
                        lv = jnp.sqrt(jnp.maximum(p - err, 0.0) / nn)
                        acc = acc + jnp.sum(lv) + zi[0] + zq[-1]
                return acc
            return run
        try:
            rs = k_rate(make_felv, dd, per_pass, K1, K2)
            results["fe_levels"] = round(statistics.median(rs) / 1e9, 2)
            log(f"fe_levels: {['%.2f' % (x/1e9) for x in rs]} GB/s")
        except Exception as e:
            log(f"fe_levels FAILED: {e!r}")

    if "stage" in phases:
        # tail stages alone, on resident f32 planar pools at demod rate;
        # rates reported on the stage's OWN input bytes
        zpool = jax.device_put(rng.normal(
            0, 40, (NPOOL, 2, KTOT)).astype(np.float32))
        apool = jax.device_put(rng.normal(
            0, 100, (NPOOL, KTOT)).astype(np.float32))
        deemph_a = ops.deemph_alpha(2_400_000 // D, 75)

        def stage(tag, make, arg, per_pass):
            try:
                rs = k_rate(make, arg, per_pass, K1, K2)
                results[tag] = round(statistics.median(rs) / 1e9, 2)
                log(f"{tag}: {['%.2f' % (x/1e9) for x in rs]} GB/s")
            except Exception as e:
                log(f"{tag} FAILED: {e!r}")
                results[tag] = None

        def make_disc(seam):
            def mk(k):
                @jax.jit
                def run(pool):
                    acc = jnp.zeros(())
                    prev = jnp.zeros(2, jnp.float32)
                    for r in range(k):
                        for c in range(CH):
                            zi, zq = pool[r * CH + c, 0], pool[r * CH + c, 1]
                            prev, d = ops.fm_discriminate_planar(
                                prev, zi, zq, 1, seam_stride=seam)
                            acc = acc + jnp.sum(d)
                    return acc + prev[0]
                return run
            return mk
        stage("disc_seam", make_disc(KB), zpool, CH * 2 * KTOT * 4)
        stage("disc_noseam", make_disc(None), zpool, CH * 2 * KTOT * 4)

        def make_deemph(k):
            @jax.jit
            def run(pool):
                acc = jnp.zeros(())
                avg = jnp.zeros((), jnp.float32)
                for r in range(k):
                    for c in range(CH):
                        avg, y = ops.deemph_filter(
                            avg, pool[r * CH + c], deemph_a)
                        acc = acc + jnp.sum(y)
                return acc + avg
            return run
        stage("deemph", make_deemph, apool, CH * KTOT * 4)

        def make_resamp(k):
            @jax.jit
            def run(pool):
                acc = jnp.zeros(())
                st = ResampleState.init()
                for r in range(k):
                    for c in range(CH):
                        st, y, nv = resample_rational(
                            st, pool[r * CH + c], 2_400_000 // D, 32_000)
                        acc = acc + jnp.sum(y) + nv.astype(jnp.float32)
                return acc + st.acc
            return run
        stage("resamp", make_resamp, apool, CH * KTOT * 4)

        def make_levels(k):
            @jax.jit
            def run(pool):
                acc = jnp.zeros(())
                for r in range(k):
                    for c in range(CH):
                        zib = pool[r * CH + c, 0].reshape(BL, KB)
                        zqb = pool[r * CH + c, 1].reshape(BL, KB)
                        t = jnp.sum(zib, axis=1) + jnp.sum(zqb, axis=1)
                        p = (jnp.sum(zib * zib, axis=1)
                             + jnp.sum(zqb * zqb, axis=1))
                        nn = 2 * KB
                        dc = t / nn
                        err = t * 2 * dc - dc * dc * nn
                        lv = jnp.sqrt(jnp.maximum(p - err, 0.0) / nn)
                        acc = acc + jnp.sum(lv)
                return acc
            return run
        stage("levels", make_levels, zpool, CH * 2 * KTOT * 4)

        def make_dcb(k):
            @jax.jit
            def run(pool):
                acc = jnp.zeros(())
                dca = jnp.zeros((), jnp.float32)
                for r in range(k):
                    for c in range(CH):
                        ab = pool[r * CH + c].reshape(BL, -1)
                        means = jnp.mean(ab, axis=1)
                        avgs = fmchunk._ema_scan(means, dca, 9)
                        y = (ab - avgs[:, None]).reshape(-1)
                        dca = avgs[-1]
                        acc = acc + jnp.sum(y)
                return acc + dca
            return run
        stage("dc_audio", make_dcb, apool, CH * KTOT * 4)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
