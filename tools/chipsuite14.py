"""Round-4 probes: MXU reformulations of the tail stages.

chipsuite13 located the time at bench geometry: deemph 5.05 GB/s,
resampler 7.22, levels 19.3 (vs a 753 GB/s ceiling).  These probes A/B
the candidate fixes, all on the stage's own input bytes:

  deemph_ab   Hillis-Steele flat scan vs triangular-MXU matmul scan
  cumsum_ab   jnp.cumsum vs blocked triangular-MXU cumsum; _pick_rows alone
  resamp_ab   resample_rational with each cumsum
  levels_ab   reduce formulations: current / 3-D reshape / MXU dots
  fe_tiles    Pallas fused-convert frontend at tile_rows 128/256/512
  atan2_k     does jnp.arctan2 lower inside a Mosaic kernel? (feasibility
              gate for fusing the seam quirk into a future fused kernel)

Scheme: distinct-chunks, pool-as-argument, K-differenced medians.
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
    phases = sys.argv[1:] or ["atan2_k", "deemph_ab", "cumsum_ab",
                              "resamp_ab", "levels_ab", "fe_tiles"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.ops import filters, frontend_mxu, resample

    log(f"backend={jax.default_backend()} phases={phases}")
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")
    results = {}

    D = 14
    n = 258048
    BL = 12
    CH = 4
    K1, K2 = 1, 3
    NPOOL = K2 * CH
    KTOT = BL * (n // D)
    KB = n // D
    apool = jax.device_put(rng.normal(
        0, 100, (NPOOL, KTOT)).astype(np.float32))
    deemph_a = ops.deemph_alpha(2_400_000 // D, 75)
    c = 1.0 - 1.0 / deemph_a

    def stage(tag, make, arg, per_pass):
        try:
            rs = k_rate(make, arg, per_pass, K1, K2)
            results[tag] = round(statistics.median(rs) / 1e9, 2)
            log(f"{tag}: {['%.2f' % (x/1e9) for x in rs]} GB/s")
        except Exception as e:
            log(f"{tag} FAILED: {e!r}")
            results[tag] = None

    if "atan2_k" in phases:
        try:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            def kern(a_ref, b_ref, o_ref):
                o_ref[:] = jnp.arctan2(a_ref[:], b_ref[:])
            a = jnp.ones((8, 128), jnp.float32)
            b = jnp.ones((8, 128), jnp.float32) * 2
            out = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(a, b)
            v = float(out[0, 0])
            ok = abs(v - np.arctan2(1.0, 2.0)) < 1e-5
            results["atan2_pallas"] = bool(ok)
            log(f"atan2 in Mosaic: value={v:.6f} ok={ok}")
        except Exception as e:
            results["atan2_pallas"] = False
            log(f"atan2 in Mosaic FAILED: {e!r}")

    if "deemph_ab" in phases:
        # correctness first (fetch once)
        xs = jnp.asarray(rng.normal(0, 100, 4096).astype(np.float32))
        avg0 = jnp.float32(7.0)
        b = xs * jnp.float32(1.0 / deemph_a)
        y0 = np.asarray(filters._iir_scan_flat(avg0, b, c)[1])
        y1 = np.asarray(filters._iir_scan_flat_mxu(avg0, b, c)[1])
        md = float(np.max(np.abs(y0 - y1)))
        results["deemph_mxu_maxdiff"] = md
        log(f"deemph mxu vs hs maxdiff: {md:.2e}")

        def mk_deemph(fn):
            def mk(k):
                @jax.jit
                def run(pool):
                    acc = jnp.zeros(())
                    avg = jnp.zeros((), jnp.float32)
                    for r in range(k):
                        for ci in range(CH):
                            bb = pool[r * CH + ci] * jnp.float32(1.0 / deemph_a)
                            avg, y = fn(avg, bb, c)
                            acc = acc + jnp.sum(y)
                    return acc + avg
                return run
            return mk
        stage("deemph_hs", mk_deemph(filters._iir_scan_flat),
              apool, CH * KTOT * 4)
        stage("deemph_mxu", mk_deemph(filters._iir_scan_flat_mxu),
              apool, CH * KTOT * 4)
        stage("deemph_mxu512",
              mk_deemph(lambda a, bb, cc: filters._iir_scan_flat_mxu(
                  a, bb, cc, lanes=512)),
              apool, CH * KTOT * 4)

    if "cumsum_ab" in phases:
        def mk_cs(fn):
            def mk(k):
                @jax.jit
                def run(pool):
                    acc = jnp.zeros(())
                    for r in range(k):
                        for ci in range(CH):
                            cs = fn(pool[r * CH + ci])
                            # fold ends via masked reduce (no column slice)
                            acc = acc + jnp.sum(
                                jnp.where(jnp.arange(KTOT) % 8191 == 0,
                                          cs, 0.0))
                    return acc
                return run
            return mk
        stage("cumsum_jnp", mk_cs(jnp.cumsum), apool, CH * KTOT * 4)
        stage("cumsum_mxu", mk_cs(resample._cumsum_mxu),
              apool, CH * KTOT * 4)
        # correctness
        xs = jnp.asarray(rng.normal(0, 100, 300000).astype(np.float32))
        d = float(jnp.max(jnp.abs(resample._cumsum_mxu(xs)
                                  - jnp.cumsum(xs))))
        results["cumsum_mxu_maxdiff"] = d
        log(f"cumsum mxu maxdiff: {d:.2e} (scale ~{float(jnp.max(jnp.abs(jnp.cumsum(xs)))):.1e})")

        # the _pick_rows gather alone on a resident stream
        cap = KTOT * 32000 // (2_400_000 // D) + 2
        idx = jnp.asarray((np.arange(cap) * (KTOT - 1) // cap)
                          .astype(np.int32))

        def mk_pick(k):
            @jax.jit
            def run(pool):
                acc = jnp.zeros(())
                for r in range(k):
                    for ci in range(CH):
                        acc = acc + jnp.sum(
                            resample._pick_rows(pool[r * CH + ci], idx))
                return acc
            return run
        stage("pick_rows", mk_pick, apool, CH * KTOT * 4)

    if "resamp_ab" in phases:
        from rx_tools_tpu.ops.resample import ResampleState, resample_rational

        def mk_rs(k):
            # NOTE: jit traces at first CALL — the _csum_flat patch around
            # the stage() call below is what selects the variant
            @jax.jit
            def run(pool):
                acc = jnp.zeros(())
                st = ResampleState.init()
                for r in range(k):
                    for ci in range(CH):
                        st, y, nv = resample_rational(
                            st, pool[r * CH + ci],
                            2_400_000 // D, 32_000)
                        acc = acc + jnp.sum(y) + nv.astype(jnp.float32)
                return acc + st.acc
            return run
        orig_cs = resample._csum_flat
        for nm, fn in [("resamp_jnpcs", jnp.cumsum),
                       ("resamp_mxucs", resample._cumsum_mxu)]:
            resample._csum_flat = fn
            try:
                stage(nm, mk_rs, apool, CH * KTOT * 4)
            finally:
                resample._csum_flat = orig_cs

    if "levels_ab" in phases:
        zpool = jax.device_put(rng.normal(
            0, 40, (NPOOL, 2, KTOT)).astype(np.float32))

        def levels_cur(zi, zq):
            zib = zi.reshape(BL, KB)
            zqb = zq.reshape(BL, KB)
            t = jnp.sum(zib, axis=1) + jnp.sum(zqb, axis=1)
            p = jnp.sum(zib * zib, axis=1) + jnp.sum(zqb * zqb, axis=1)
            return t, p

        def levels_3d(zi, zq):
            zib = zi.reshape(BL, KB // 128, 128)
            zqb = zq.reshape(BL, KB // 128, 128)
            t = jnp.sum(zib, axis=(1, 2)) + jnp.sum(zqb, axis=(1, 2))
            p = (jnp.sum(zib * zib, axis=(1, 2))
                 + jnp.sum(zqb * zqb, axis=(1, 2)))
            return t, p

        _hi = jax.lax.Precision.HIGHEST

        def levels_dot(zi, zq):
            z = jnp.concatenate([zi.reshape(BL, KB), zq.reshape(BL, KB)])
            ones = jnp.ones((KB,), jnp.float32)
            t2 = jax.lax.dot_general(z, ones, (((1,), (0,)), ((), ())),
                                     precision=_hi)          # (2BL,)
            p2 = jax.lax.dot_general(z, z, (((1,), (1,)), ((0,), (0,))),
                                     precision=_hi)          # (2BL,) batched
            return (t2[:BL] + t2[BL:]), (p2[:BL] + p2[BL:])

        def mk_lv(fn):
            def mk(k):
                @jax.jit
                def run(pool):
                    acc = jnp.zeros(())
                    for r in range(k):
                        for ci in range(CH):
                            t, p = fn(pool[r * CH + ci, 0],
                                      pool[r * CH + ci, 1])
                            nn = 2 * KB
                            dc = t / nn
                            err = t * 2 * dc - dc * dc * nn
                            lv = jnp.sqrt(jnp.maximum(p - err, 0.0) / nn)
                            acc = acc + jnp.sum(lv)
                    return acc
                return run
            return mk
        for nm, fn in [("lv_cur", levels_cur), ("lv_3d", levels_3d),
                       ("lv_dot", levels_dot)]:
            stage(nm, mk_lv(fn), zpool, CH * 2 * KTOT * 4)
        # correctness
        zi = jnp.asarray(rng.normal(0, 40, KTOT).astype(np.float32))
        zq = jnp.asarray(rng.normal(0, 40, KTOT).astype(np.float32))
        t0_, p0_ = (np.asarray(v) for v in levels_cur(zi, zq))
        for nm, fn in [("lv_3d", levels_3d), ("lv_dot", levels_dot)]:
            t1_, p1_ = (np.asarray(v) for v in fn(zi, zq))
            results[f"{nm}_relerr"] = float(
                max(np.max(np.abs(t1_ - t0_) / (np.abs(t0_) + 1)),
                    np.max(np.abs(p1_ - p0_) / (np.abs(p0_) + 1))))

    if "fe_tiles" in phases:
        data = rng.integers(-16000, 16000,
                            (NPOOL, BL * 2 * n)).astype(np.int16)
        dd = jax.device_put(data)
        per_pass = CH * BL * 2 * n * 2
        for t in (128, 256, 512):
            def mk_fe(k, t=t):
                @jax.jit
                def run(pool):
                    s = jnp.zeros((), jnp.float32)
                    for r in range(k):
                        for ci in range(CH):
                            zi, zq = frontend_mxu.capture_frontend_mm_pallas(
                                pool[r * CH + ci], D, tile_rows=t)
                            s = s + jnp.sum(zi) + jnp.sum(zq)
                    return s
                return run
            stage(f"fe_t{t}", mk_fe, dd, per_pass)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
