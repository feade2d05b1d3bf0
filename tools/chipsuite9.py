"""Round-3b: scan-class tail ops, Pallas fused-convert matmul frontend.

After chipsuite8 the FM chain is tail-bound: deemph ~26%, resampler ~26%
(ablations chain_full 9.58 / chain_nors 12.75 / chain_node 19.57 GB/s),
and the PFB step is tail-bound after the 31x MXU filterbank.  Phases:

  scans   audio-rate micro ops at K=224736: deemph old (affine
          associative_scan) vs new (blocked Hillis-Steele), jnp.cumsum
          vs blocked cumsum, the resampler's 42k gather, the full
          rational resampler
  chain2  flat chain with the new deemph (and optionally the Pallas
          frontend patched in)
  pfe     capture_frontend_mm_pallas standalone (HIGHEST + HIGH) and the
          plain mm on a PRE-converted f32 pool (isolates the convert
          materialization cost)
  pfbt    pfb_step at the new defaults + the batched demod tail alone
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
    phases = sys.argv[1:] or ["scans", "chain2", "pfe", "pfbt"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.ops import frontend_mxu, pallas_frontend, filters

    log(f"backend={jax.default_backend()} phases={phases}")
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")
    results = {}

    D = 14
    n = 262192
    CH, BL = 4, 12
    K = BL * n // D                    # audio-rate samples per chunk
    HI = jax.lax.Precision.HIGHEST
    H3 = jax.lax.Precision.HIGH

    if "scans" in phases:
        data = rng.normal(0, 1000, (CH, K)).astype(np.float32)
        dd = jax.device_put(data)
        FAST, SLOW = 42857, 8000
        cap = K * SLOW // FAST + 2
        pos = np.minimum((np.arange(1, cap + 1) * FAST + SLOW - 1)
                         // SLOW - 1, K - 1).astype(np.int32)
        pos_d = jax.device_put(pos)
        from rx_tools_tpu.ops.resample import ResampleState, resample_rational

        def deemph_old(v):
            inv_a = jnp.float32(1.0 / 13)
            c = jnp.float32(1.0) - inv_a
            A = jnp.full_like(v, c)
            B = v * inv_a

            def compose(l, r):
                return l[0] * r[0], l[1] * r[0] + r[1]

            As, Bs = jax.lax.associative_scan(compose, (A, B))
            y = Bs + As * 0.5
            return jnp.sum(y) + y[-1]

        def deemph_new(v):
            carry, y = filters.deemph_filter(jnp.float32(0.5), v, 13)
            return jnp.sum(y) + carry

        def cumsum_jnp(v):
            return jnp.sum(jnp.cumsum(v)[-3:])

        def cumsum_blk(v):
            pad = (-v.shape[0]) % 512
            s = filters._iir_row_scan(
                jnp.pad(v, (0, pad)).reshape(-1, 512), 1.0)
            ends = jnp.cumsum(s[:, -1])
            car = jnp.concatenate([jnp.zeros((1,), v.dtype), ends[:-1]])
            y = (s + car[:, None]).reshape(-1)
            return jnp.sum(y[-3:])

        def gather42k(v):
            return jnp.sum(v[pos_d])

        def resample_cur(v):
            st, y, nv = resample_rational(ResampleState.init(), v, FAST, SLOW)
            return jnp.sum(y) + nv.astype(jnp.float32) + st.acc

        for name, fn in (("deemph_old", deemph_old), ("deemph_new", deemph_new),
                         ("cumsum_jnp", cumsum_jnp), ("cumsum_blk", cumsum_blk),
                         ("gather42k", gather42k),
                         ("resample_cur", resample_cur)):
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
            try:
                rs = k_rate(make, dd, data.nbytes, 1, 65)
                results[name] = round(statistics.median(rs) / 1e9, 2)
                log(f"{name}: {['%.1f' % (x/1e9) for x in rs]} GB/s (audio f32)")
            except Exception as e:
                log(f"{name} FAILED: {e!r}")
                results[name] = None

    if "chain2" in phases:
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

        chain_rate(base, "chain2_full")
        chain_rate(dataclasses.replace(base, rate_out2=-1), "chain2_nors")
        orig = ops.capture_frontend_planar
        try:
            ops.capture_frontend_planar = (
                lambda v, d, rotate=True:
                frontend_mxu.capture_frontend_mm_pallas(v, d, rotate,
                                                        precision=H3))
            try:
                fmchunk.fm_chunk_step.clear_cache()
            except Exception:
                pass
            chain_rate(dataclasses.replace(base, output_scale=3),
                       "chain2_palfe")
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
            "pal_hi": lambda v: frontend_mxu.capture_frontend_mm_pallas(
                v, D, precision=HI),
            "pal_h3": lambda v: frontend_mxu.capture_frontend_mm_pallas(
                v, D, precision=H3),
            "pal_h3_t512": lambda v: frontend_mxu.capture_frontend_mm_pallas(
                v, D, precision=H3, tile_rows=512),
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

        # pre-converted f32 pool: isolates the int16->f32 materialization
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

        rs = k_rate(make_f32, gd, data.nbytes, 1, 17)   # int16-equiv bytes
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
                               + nv.sum().astype(jnp.float32))
                return acc + st.deemph_avg.sum()
            return run

        rs = k_rate(make_step, (st0, dd), data.nbytes, 1, 5)
        g = statistics.median(rs)
        results["pfb_step2"] = round(g / 1e9, 3)
        results["pfb_step2_rt"] = round(g / 4.0 / 2_400_000 * 64, 0)
        log(f"pfb_step2: {['%.2f' % (x/1e9) for x in rs]} GB/s")

        # batched demod tail alone, (64, 2048) per block
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

        work = CH * 2 * 64 * m * 4      # f32 bytes in
        rs = k_rate(make_tail, zd, work, 1, 17)
        results["pfb_tail_f32"] = round(statistics.median(rs) / 1e9, 2)
        log(f"pfb_tail: {['%.2f' % (x/1e9) for x in rs]} GB/s (f32 in)")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
