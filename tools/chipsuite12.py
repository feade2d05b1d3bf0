"""Round-3b: fair chain A/B without the perturbation-store artifact.

chipsuite11 probes: materializing an int16 array (the xor/add
perturbation when its consumer is a fusion barrier) caps at ~36 GB/s —
it polluted every matmul/Pallas in-chain A/B, while the masked frontend
fused the perturb and dodged it.  The Pallas fused-convert kernel reads
a resident int16 pool at ~250 GB/s — the actual production situation
(fresh blocks from the host, nothing perturbs them).

Honest without perturbation: a pool of k2*CH DISTINCT chunks; pass r
consumes chunks [r*CH, (r+1)*CH) with STATIC indices (traced Python
loop), so no data is reused across passes and nothing can hoist/CSE.
Marginal = t(k2) - t(k1) covers CH fresh chunks per extra pass.

  chain_ab   flat chain: masked vs Pallas vs mm frontends
  fe_ab      frontends standalone under the same scheme
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
    phases = sys.argv[1:] or ["fe_ab", "chain_ab"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.ops import frontend_mxu, pallas_frontend

    log(f"backend={jax.default_backend()} phases={phases}")
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")
    results = {}

    D = 14
    n = 262192
    BL = 12
    CH = 4            # chunks consumed per pass
    K1, K2 = 1, 3     # passes; pool holds K2*CH distinct chunks (~151 MB)
    NPOOL = K2 * CH

    if "fe_ab" in phases:
        data = rng.integers(-16000, 16000,
                            (NPOOL, BL * 2 * n)).astype(np.int16)
        dd = jax.device_put(data)
        per_pass = CH * BL * 2 * n * 2          # bytes per pass

        variants = {
            "masked": lambda v: pallas_frontend.capture_frontend_planar(v, D),
            "mm32": lambda v: frontend_mxu.capture_frontend_mm(v, D),
            "pal": lambda v: frontend_mxu.capture_frontend_mm_pallas(v, D),
        }
        for name, fn in variants.items():
            def make_fe(k, fn=fn):
                @jax.jit
                def run(pool):
                    s = jnp.zeros((), jnp.float32)
                    for r in range(k):
                        for c in range(CH):
                            zi, zq = fn(pool[r * CH + c])
                            s = s + jnp.sum(zi) + jnp.sum(zq)
                    return s
                return run
            try:
                rs = k_rate(make_fe, dd, per_pass, K1, K2)
                results[f"fe_{name}"] = round(statistics.median(rs) / 1e9, 2)
                log(f"fe_{name}: {['%.1f' % (x/1e9) for x in rs]} GB/s")
            except Exception as e:
                log(f"fe_{name} FAILED: {e!r}")
                results[f"fe_{name}"] = None

    if "chain_ab" in phases:
        import dataclasses
        from rx_tools_tpu.models import fmchain, fmchunk

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

            rs = k_rate(make, (st0, dd), per_pass, K1, K2)
            g = statistics.median(rs)
            results[tag] = round(g / 1e9, 2)
            log(f"{tag}: {['%.2f' % (x/1e9) for x in rs]} GB/s")

        chain_rate(base, "chain_masked")
        orig = ops.capture_frontend_planar
        try:
            ops.capture_frontend_planar = (
                lambda v, d, rotate=True:
                frontend_mxu.capture_frontend_mm_pallas(v, d, rotate))
            try:
                fmchunk.fm_chunk_step.clear_cache()
            except Exception:
                pass
            chain_rate(dataclasses.replace(base, output_scale=3),
                       "chain_pal")
        finally:
            ops.capture_frontend_planar = orig
            try:
                fmchunk.fm_chunk_step.clear_cache()
            except Exception:
                pass

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
