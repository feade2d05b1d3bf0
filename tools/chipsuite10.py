"""Round-3b continued: row-gather resampler in the chain, Pallas frontend.

chipsuite9 found the resampler is 100% bound by one 42k ELEMENTWISE
gather (~7 ns/element) and confirmed the blocked-Hillis deemph (chain
9.58 -> 12.4 GB/s).  resample_rational now picks through 128-wide ROW
gathers + lane-select masked reduces (the embedding pattern).  Phases:

  rg      micro: elementwise gather vs _pick_rows at cap=42k
  chain3  flat chain at the new defaults; with the Pallas frontend
  pfe     Pallas fused-convert matmul frontend standalone + f32-pool mm
  pfbt    pfb_step + batched demod tail at the new defaults
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
    phases = sys.argv[1:] or ["rg", "chain3", "pfe", "pfbt"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.ops import frontend_mxu
    from rx_tools_tpu.ops.resample import _pick_rows

    log(f"backend={jax.default_backend()} phases={phases}")
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")
    results = {}

    D = 14
    n = 262192
    CH, BL = 4, 12
    K = BL * n // D
    HI = jax.lax.Precision.HIGHEST

    if "rg" in phases:
        data = rng.normal(0, 1000, (CH, K)).astype(np.float32)
        dd = jax.device_put(data)
        FAST, SLOW = 42857, 8000
        cap = K * SLOW // FAST + 2
        pos = np.minimum((np.arange(1, cap + 1) * FAST + SLOW - 1)
                         // SLOW - 1, K - 1).astype(np.int32)
        pos_d = jax.device_put(pos)

        for name, fn in (
                ("gather_elem", lambda v: jnp.sum(v[pos_d])),
                ("gather_rows", lambda v: jnp.sum(_pick_rows(v, pos_d)))):
            def make(k, fn=fn):
                @jax.jit
                def run(pool):
                    def body(r, acc):
                        s = jnp.zeros((), jnp.float32)
                        for c in range(CH):
                            v = pool[c] + r.astype(jnp.float32) * 1e-3
                            s = s + fn(v)
                        return acc + s
                    return jax.lax.fori_loop(0, k, body,
                                             jnp.zeros((), jnp.float32))
                return run
            rs = k_rate(make, dd, data.nbytes, 1, 65)
            results[name] = round(statistics.median(rs) / 1e9, 2)
            log(f"{name}: {['%.1f' % (x/1e9) for x in rs]} GB/s (audio f32)")

    if "chain3" in phases:
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

        chain_rate(base, "chain3_full")
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
                       "chain3_palfe")
            ops.capture_frontend_planar = (
                lambda v, d, rotate=True:
                frontend_mxu.capture_frontend_mm(v, d, rotate))
            try:
                fmchunk.fm_chunk_step.clear_cache()
            except Exception:
                pass
            chain_rate(dataclasses.replace(base, output_scale=4),
                       "chain3_mmfe")
        finally:
            ops.capture_frontend_planar = orig
            try:
                fmchunk.fm_chunk_step.clear_cache()
            except Exception:
                pass

    if "pfe" in phases:
        data = rng.integers(-16000, 16000, (CH, BL * 2 * n)).astype(np.int16)
        dd = jax.device_put(data)

        variants = {
            "pal": lambda v: frontend_mxu.capture_frontend_mm_pallas(v, D),
            "pal_t512": lambda v: frontend_mxu.capture_frontend_mm_pallas(
                v, D, tile_rows=512),
            "pal_t64": lambda v: frontend_mxu.capture_frontend_mm_pallas(
                v, D, tile_rows=64),
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

        g32 = (data.astype(np.float32) * (128.0 / 32767.0)).reshape(
            CH, K // 32, 32 * 2 * D)
        gd = jax.device_put(g32)
        mmat = jnp.asarray(frontend_mxu._fs4_decim_matrix(D, 32, True))

        def make_f32(k):
            @jax.jit
            def run(pool):
                def body(r, acc):
                    s = jnp.zeros((), jnp.float32)
                    for c in range(CH):
                        v = pool[c] + r.astype(jnp.float32) * 1e-3
                        out = jax.lax.dot_general(
                            v, mmat, (((1,), (0,)), ((), ())), precision=HI)
                        s = s + jnp.sum(out)
                    return acc + s
                return jax.lax.fori_loop(0, k, body,
                                         jnp.zeros((), jnp.float32))
            return run

        rs = k_rate(make_f32, gd, data.nbytes, 1, 17)
        results["fe_mm_f32pool"] = round(statistics.median(rs) / 1e9, 2)
        log(f"fe_mm_f32pool: {['%.1f' % (x/1e9) for x in rs]} GB/s "
            f"(int16-equivalent)")

    if "pfbt" in phases:
        from rx_tools_tpu.models import channelizer as _chan
        from rx_tools_tpu.models import pfb

        cfg = pfb.PfbConfig(capture_rate=2_400_000, n_channels=64,
                            custom_atan=1, deemph_a=7, rate_out2=32_000)
        nb = pfb.block_samples(cfg)
        data = rng.integers(-16000, 16000, (CH, 2 * nb)).astype(np.int16)
        dd = jax.device_put(data)
        st0 = pfb.init_state(cfg)

        def make_step(k):
            @jax.jit
            def run(args):
                st, pool = args
                acc = jnp.zeros(())
                for r in range(k):
                    for c in range(CH):
                        st, audio, nv = pfb.pfb_step(
                            cfg, st, pool[c] + jnp.int16(r))
                        acc = (acc + jnp.sum(audio)
                               + jnp.sum(nv).astype(jnp.float32))
                return acc + st.deemph_avg.sum()
            return run

        rs = k_rate(make_step, (st0, dd), data.nbytes, 1, 5)
        g = statistics.median(rs)
        results["pfb_step3"] = round(g / 1e9, 3)
        results["pfb_step3_rt"] = round(g / 4.0 / 2_400_000 * 64, 0)
        log(f"pfb_step3: {['%.2f' % (x/1e9) for x in rs]} GB/s")

        m = nb // 64
        zpool = rng.normal(0, 50, (CH, 2, 64, m)).astype(np.float32)
        zd = jax.device_put(zpool)

        def make_tail(k):
            @jax.jit
            def run(pool):
                def body(r, acc):
                    s = jnp.zeros((), jnp.float32)
                    for c in range(CH):
                        zi = pool[c, 0] + r.astype(jnp.float32) * 1e-3
                        zq = pool[c, 1] - r.astype(jnp.float32) * 1e-3
                        prev, davg, racc, rph, audio, nv = (
                            _chan.demod_tail_batch_planar(
                                cfg, st0.prev_iq, st0.deemph_avg,
                                st0.resamp.acc, st0.resamp.phase, zi, zq))
                        s = (s + jnp.sum(audio)
                             + jnp.sum(nv).astype(jnp.float32)
                             + jnp.sum(prev) + jnp.sum(davg))
                    return acc + s
                return jax.lax.fori_loop(0, k, body,
                                         jnp.zeros((), jnp.float32))
            return run

        work = CH * 2 * 64 * m * 4
        rs = k_rate(make_tail, zd, work, 1, 17)
        results["pfb_tail_f32"] = round(statistics.median(rs) / 1e9, 2)
        log(f"pfb_tail: {['%.2f' % (x/1e9) for x in rs]} GB/s (f32 in)")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
