"""Round-3b: MXU frontend variants, chain tail breakdown, PFB MXU rewrite.

All honest methodology (pool as argument, xor/add perturbation per pass,
checksums folded into the fetched scalar, K-differenced marginals,
median of rounds).  Phases:

  fe     frontend variants at bench-chunk geometry (flat 12x262192-IQ
         chunks): cur (masked reduce), mm32/mm8 (block-banded MXU matmul,
         HIGHEST + HIGH precision), t2 (thin matmul), conv (strided conv)
  tail   chain ablations on the flat engine: full / no-resampler /
         no-deemph-no-resampler / mm-frontend-full -> stage shares
  pfb    filterbank conv vs MXU standalone; pfb_step with each -> tail share
"""

import json
import os
import statistics
import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def k_rate(make_run, arg, work_units, k1, k2, reps=12, rounds=3):
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
        out.append(work_units / dt if dt > 0 else 0.0)
    return out


def main():
    phases = sys.argv[1:] or ["fe", "tail", "pfb"]
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
    CH, BL = 4, 12
    HI = jax.lax.Precision.HIGHEST
    H3 = jax.lax.Precision.HIGH

    if "fe" in phases:
        data = rng.integers(-16000, 16000, (CH, BL * 2 * n)).astype(np.int16)
        dd = jax.device_put(data)

        variants = {
            "cur": lambda v: pallas_frontend.capture_frontend_planar(v, D),
            "mm32": lambda v: frontend_mxu.capture_frontend_mm(
                v, D, p=32, precision=HI),
            "mm32_h3": lambda v: frontend_mxu.capture_frontend_mm(
                v, D, p=32, precision=H3),
            "mm8": lambda v: frontend_mxu.capture_frontend_mm(
                v, D, p=8, precision=HI),
            "t2": lambda v: frontend_mxu.capture_frontend_t2(
                v, D, precision=HI),
            "conv": lambda v: frontend_mxu.capture_frontend_conv(
                v, D, precision=HI),
        }
        for name, fn in variants.items():
            def make_fe(k, fn=fn):
                @jax.jit
                def run(pool):
                    def body(r, acc):
                        s = jnp.zeros((), jnp.float32)
                        for c in range(CH):
                            v = jnp.bitwise_xor(pool[c],
                                                (r + 1).astype(jnp.int16))
                            zi, zq = fn(v)
                            s = s + jnp.sum(zi) + jnp.sum(zq)
                        return acc + s
                    return jax.lax.fori_loop(0, k, body,
                                             jnp.zeros((), jnp.float32))
                return run
            try:
                rs = k_rate(make_fe, dd, data.nbytes, 1, 17)
                results[f"fe_{name}"] = round(statistics.median(rs) / 1e9, 2)
                log(f"fe_{name}: {['%.1f' % (x/1e9) for x in rs]} GB/s")
            except Exception as e:
                log(f"fe_{name} FAILED: {e!r}")
                results[f"fe_{name}"] = None

    if "tail" in phases or "pfb" in phases:
        pass

    if "tail" in phases:
        import dataclasses
        from rx_tools_tpu.models import fmchain, fmchunk

        data = rng.integers(-16000, 16000, (CH, BL, 2 * n)).astype(np.int16)
        dd = jax.device_put(data)
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
                                cfg, st, pool[c] + jnp.int16(r))
                            acc = (acc + jnp.sum(audio)
                                   + nv.sum().astype(jnp.float32)
                                   + jnp.sum(lv))
                    return acc + st.deemph_avg + st.prev_iq[0]
                return run

            rs = k_rate(make, (st0, dd), data.nbytes, 1, 4)
            g = statistics.median(rs)
            results[tag] = round(g / 1e9, 2)
            log(f"{tag}: {['%.2f' % (x/1e9) for x in rs]} GB/s")

        chain_rate(base, "chain_full")
        chain_rate(dataclasses.replace(base, rate_out2=-1), "chain_nors")
        chain_rate(dataclasses.replace(base, rate_out2=-1, deemph_a=0),
                   "chain_node")
        # full chain with the MXU mm frontend patched in
        orig = ops.capture_frontend_planar
        try:
            ops.capture_frontend_planar = (
                lambda v, d, rotate=True: frontend_mxu.capture_frontend_mm(
                    v, d, rotate, precision=HI))
            try:
                fmchunk.fm_chunk_step.clear_cache()
            except Exception:
                pass
            chain_rate(dataclasses.replace(base, output_scale=2),
                       "chain_full_mm")
        finally:
            ops.capture_frontend_planar = orig
            try:
                fmchunk.fm_chunk_step.clear_cache()
            except Exception:
                pass

    if "pfb" in phases:
        from rx_tools_tpu.models import pfb

        cfg = pfb.PfbConfig(capture_rate=2_400_000, n_channels=64,
                            custom_atan=1, deemph_a=7, rate_out2=32_000)
        nb = pfb.block_samples(cfg)
        data = rng.integers(-16000, 16000, (CH, 2 * nb)).astype(np.int16)
        dd = jax.device_put(data)
        st0 = pfb.init_state(cfg)
        tail0 = st0.tail

        for name, fb in (("conv", pfb.filterbank), ("mxu", pfb.filterbank_mxu)):
            def make_fb(k, fb=fb):
                @jax.jit
                def run(pool):
                    def body(r, acc):
                        s = jnp.zeros((), jnp.float32)
                        for c in range(CH):
                            v = jnp.bitwise_xor(pool[c],
                                                (r + 1).astype(jnp.int16))
                            _, zi, zq = fb(cfg, tail0, v)
                            s = s + jnp.sum(zi) + jnp.sum(zq)
                        return acc + s
                    return jax.lax.fori_loop(0, k, body,
                                             jnp.zeros((), jnp.float32))
                return run
            rs = k_rate(make_fb, dd, data.nbytes, 1, 9)
            results[f"pfb_fb_{name}"] = round(statistics.median(rs) / 1e9, 2)
            log(f"pfb_fb_{name}: {['%.2f' % (x/1e9) for x in rs]} GB/s")

        def step_rate(tag):
            def make(k):
                @jax.jit
                def run(args):
                    st, pool = args
                    acc = jnp.zeros(())
                    for r in range(k):
                        for c in range(CH):
                            st, audio, nv = pfb.pfb_step(
                                cfg, st, pool[c] + jnp.int16(r))
                            acc = (acc + jnp.sum(audio)
                                   + nv.sum().astype(jnp.float32))
                    return acc + st.deemph_avg.sum()
                return run
            rs = k_rate(make, (st0, dd), data.nbytes, 1, 5)
            g = statistics.median(rs)
            results[tag] = round(g / 1e9, 3)
            results[tag + "_rt"] = round(g / 4.0 / 2_400_000 * 64, 0)
            log(f"{tag}: {['%.2f' % (x/1e9) for x in rs]} GB/s")

        step_rate("pfb_step_conv")
        orig_fb = pfb.filterbank
        try:
            pfb.filterbank = pfb.filterbank_mxu
            try:
                pfb.pfb_step.clear_cache()
            except Exception:
                pass
            step_rate("pfb_step_mxu")
        finally:
            pfb.filterbank = orig_fb
            try:
                pfb.pfb_step.clear_cache()
            except Exception:
                pass

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
