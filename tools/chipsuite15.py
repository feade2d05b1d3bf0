"""Round-4 chain-level A/Bs: decide the tail reformulations in context.

chipsuite14's stage-alone probes sat inside RPC jitter (0.0 rounds,
contradictory orderings: the MXU cumsum won standalone 26 vs 8 GB/s but
LOST in-chain 5.7 vs 38).  Stage changes are therefore judged only by
full-chain A/Bs here, with bigger marginals (K2=5 -> ~200 MB per
marginal unit) and jitter-gated rounds (reject <= 0).

Variants (flat engine, bench geometry):
  ch_mxu_jnp   deemph triangular-MXU scan + jnp.cumsum resampler
  ch_mxu_mxu   deemph MXU + MXU cumsum (current working-tree dispatch)
  ch_hs_jnp    round-3 production (Hillis-Steele deemph + jnp.cumsum)
  ch_fe2       best-so-far + two-output Pallas frontend (planar writes)
  ab_nores / ab_nodeemph / ab_felv   ablations at the best variant
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
    phases = sys.argv[1:] or ["chain", "ablate"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import dataclasses
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain, fmchunk
    from rx_tools_tpu.ops import filters, frontend_mxu, pallas_frontend, resample

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
    K1, K2 = 1, 5
    NPOOL = K2 * CH

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
            rs, rej = k_rate_gated(make, (st0, dd), per_pass, K1, K2)
            results[tag] = round(statistics.median(rs) / 1e9, 2) if rs else 0.0
            log(f"{tag}: {['%.2f' % (x/1e9) for x in rs]} GB/s (rej={rej})")
        except Exception as e:
            log(f"{tag} FAILED: {e!r}")
            results[tag] = None

    hs = lambda avg, b, c, lanes=128: filters._iir_scan_flat(avg, b, c)
    orig_mxu = filters._iir_scan_flat_mxu
    orig_cs = resample._csum_flat
    orig_fe = ops.capture_frontend_planar

    if "chain" in phases:
        # deemph MXU + jnp cumsum
        resample._csum_flat = jnp.cumsum
        try:
            chain_rate(base, "ch_mxu_jnp")
        finally:
            resample._csum_flat = orig_cs
        # deemph MXU + MXU cumsum (the current dispatch, untouched)
        chain_rate(dataclasses.replace(base, output_scale=2), "ch_mxu_mxu")
        # round-3 production: HS deemph + jnp cumsum
        filters._iir_scan_flat_mxu = hs
        resample._csum_flat = jnp.cumsum
        try:
            chain_rate(dataclasses.replace(base, output_scale=3), "ch_hs_jnp")
        finally:
            filters._iir_scan_flat_mxu = orig_mxu
            resample._csum_flat = orig_cs
        # two-output frontend on top of (mxu, jnp)
        ops.capture_frontend_planar = (
            lambda v, d, rotate=True:
            frontend_mxu.capture_frontend_mm_pallas2(v, d, bool(rotate)))
        resample._csum_flat = jnp.cumsum
        try:
            chain_rate(dataclasses.replace(base, output_scale=4), "ch_fe2")
        finally:
            ops.capture_frontend_planar = orig_fe
            resample._csum_flat = orig_cs

    if "ablate" in phases:
        # ablations at (deemph mxu, jnp cumsum)
        resample._csum_flat = jnp.cumsum
        try:
            chain_rate(dataclasses.replace(base, output_scale=5,
                                           rate_out2=0), "ab_nores")
            chain_rate(dataclasses.replace(base, output_scale=6,
                                           rate_out2=0, deemph_a=0),
                       "ab_nodeemph")
        finally:
            resample._csum_flat = orig_cs

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
