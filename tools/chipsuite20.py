"""Round-4: frontend dot precision A/B + discriminator glue probe.

  prec   capture_frontend_mm with Precision.HIGH (bf16x3) vs HIGHEST
         (bf16x6): standalone rate, in-chain rate, and max output diff
         (the mask entries are exact and inputs carry 15 mantissa bits;
         if bf16x3 stays in the reassociation error class it halves the
         MXU passes)
  disc   the discriminator stage in-chain cost: chain with mode='raw'
         -- oops raw has its own pair-interleave; instead chain with
         esbensen (no divides) vs fast-atan vs std to see whether the
         atan arithmetic or the shift/concat glue dominates
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
    phases = sys.argv[1:] or ["prec", "disc"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import dataclasses
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain, fmchunk
    from rx_tools_tpu.ops import frontend_mxu

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
    K1 = 1
    NPOOL = 9 * CH
    data = rng.integers(-16000, 16000,
                        (NPOOL, BL, 2 * n)).astype(np.int16)
    dd = jax.device_put(data)
    flat = dd.reshape(NPOOL, BL * 2 * n)
    per_pass = CH * BL * 2 * n * 2
    base = fmchain.FmConfig(
        mode="fm", rate_in=2_400_000 // D, rate_out=2_400_000 // D,
        rate_out2=32_000, downsample=D, custom_atan=1,
        deemph_a=ops.deemph_alpha(2_400_000 // D, 75), squelch_level=0.0)

    def engine_rate(cfg, tag, k2=5):
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
            rs, rej = k_rate_gated(make, (st0, dd), per_pass, K1, k2)
            results[tag] = round(statistics.median(rs) / 1e9, 2) if rs else 0.0
            log(f"{tag}: {['%.2f' % (x/1e9) for x in rs]} (rej={rej})")
        except Exception as e:
            log(f"{tag} FAILED: {e!r}")
            results[tag] = None

    if "prec" in phases:
        hi = jax.lax.Precision.HIGHEST
        hg = jax.lax.Precision.HIGH
        # correctness: one chunk, both precisions, fetched once
        zi0, zq0 = jax.jit(lambda v: frontend_mxu.capture_frontend_mm(
            v, D, precision=hi))(flat[0])
        zi1, zq1 = jax.jit(lambda v: frontend_mxu.capture_frontend_mm(
            v, D, precision=hg))(flat[0])
        md = float(jnp.max(jnp.abs(zi0 - zi1)))
        results["prec_maxdiff"] = md
        log(f"HIGH vs HIGHEST maxdiff: {md:.2e} "
            f"(scale {float(jnp.max(jnp.abs(zi0))):.1f})")

        for name, pr in [("fe_hi", hi), ("fe_high", hg)]:
            def mk(k, pr=pr):
                @jax.jit
                def run(pool):
                    s = jnp.zeros((), jnp.float32)
                    for r in range(k):
                        for c in range(CH):
                            zi, zq = frontend_mxu.capture_frontend_mm(
                                pool[r * CH + c], D, precision=pr)
                            s = s + jnp.sum(zi) + jnp.sum(zq)
                    return s
                return run
            try:
                rs, rej = k_rate_gated(mk, flat, per_pass, K1, 9)
                results[name] = round(statistics.median(rs) / 1e9, 1)
                log(f"{name}: {['%.1f' % (x/1e9) for x in rs]} (rej={rej})")
            except Exception as e:
                log(f"{name} FAILED: {e!r}")

        # in-chain HIGH
        orig = ops.capture_frontend_planar
        ops.capture_frontend_planar = (
            lambda v, d, rotate=True: frontend_mxu.capture_frontend_mm(
                v, d, bool(rotate), precision=jax.lax.Precision.HIGH))
        try:
            engine_rate(dataclasses.replace(base, output_scale=7),
                        "ch_high")
        finally:
            ops.capture_frontend_planar = orig
        engine_rate(base, "ch_prod")

    if "disc" in phases:
        for name, atan in [("fast", 1), ("std", 0), ("ale", 3)]:
            engine_rate(dataclasses.replace(base, custom_atan=atan,
                                            output_scale=20 + atan),
                        f"ch_{name}")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
