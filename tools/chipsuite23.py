"""Round-5 campaign: scan-engine gap, PFB glue ablation + time-major A/B,
frontend traffic probes.

Phases (all honest-measurement: pool-as-argument, distinct chunks per
pass, K-differenced medians, checksummed outputs, gated rounds):

  scaneng   chain GB/s via the round-5 batched-front scan engine vs the
            flat engine at bench geometry (verdict item 2: close or bound
            the 2x gap)
  pfbablate 64-channel PFB step in-step ablations: full / no-resampler /
            no-deemph-no-resampler / filterbank+sum — locates the
            round-4 "2.5x batched glue" residual stage by stage
  tmaj      pfb_step_tmaj (time-major tail, round-5) vs pfb_step
            (channel-major) — the fusion fix candidate, in-step
  fe        flat chain with the frontend swapped: plain f32 dot (mm,
            production) vs raw-int16 dot (mm_i16, integer-exact, no f32
            intermediate) vs bf16-intermediate dot (mm_bf16, probe only)
            — verdict item 5: a control for the 5x traffic amplification

Run detached:  nohup python tools/chipsuite23.py > /tmp/cs23.log 2>&1 &
"""

import json
import os
import statistics
import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def k_rate_gated(make_run, arg, work, k1, k2, reps=14, rounds=4, max_att=8,
                 max_rate=None):
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
        v = work / dt if dt > 0 else 0.0
        if dt <= 0 or (max_rate and v > max_rate):
            rej += 1
            continue
        out.append(v)
    return out, rej


def main():
    phases = sys.argv[1:] or ["scaneng", "pfbablate", "tmaj", "fe"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import dataclasses
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain, fmchunk, pfb
    from rx_tools_tpu.stream.scan import scan_fm_blocks

    log(f"backend={jax.default_backend()} phases={phases}")
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")
    results = {}

    # ---- chain geometry (bench.py) -------------------------------------
    def chain_setup():
        downsample = 14
        rate_in = 2_400_000 // downsample
        cfg = fmchain.FmConfig(
            mode="fm", rate_in=rate_in, rate_out=rate_in, rate_out2=32_000,
            downsample=downsample, custom_atan=1,
            deemph_a=ops.deemph_alpha(rate_in, 75), squelch_level=0.0)
        n = fmchain.block_samples(cfg, target=258048)
        return cfg, n

    CH, K1, K2 = 4, 1, 5

    def chain_pool(n, blocks=12):
        data = rng.integers(-16000, 16000,
                            (K2 * CH, blocks, 2 * n)).astype(np.int16)
        return jax.device_put(data), blocks * n

    def make_chain_run(engine, cfg, n_passes):
        @jax.jit
        def run(args):
            st, pool = args
            acc = jnp.zeros(())
            for r in range(n_passes):
                for c in range(CH):
                    st, audio, n_valid, levels = engine(
                        cfg, st, pool[r * CH + c])
                    acc = (acc + jnp.sum(audio)
                           + n_valid.sum().astype(jnp.float32)
                           + jnp.sum(levels))
            return acc + st.deemph_avg + st.prev_iq[0]
        return run

    if "scaneng" in phases or "fe" in phases:
        cfg, n = chain_setup()
        pool, work_blocks = chain_pool(n)
        st0 = fmchain.init_state(cfg)
        per_pass = CH * work_blocks * 4.0      # bytes of int16 I/Q per pass

    if "scaneng" in phases:
        for name, eng in (("scan", scan_fm_blocks),
                          ("flat", fmchunk.fm_chunk_step)):
            rs, rej = k_rate_gated(
                lambda k, e=eng: make_chain_run(e, cfg, k),
                (st0, pool), per_pass, K1, K2)
            g = statistics.median(rs) if rs else 0.0
            results[f"chain_{name}_gbs"] = round(g / 1e9, 2)
            log(f"chain_{name}: {['%.1f' % (x/1e9) for x in rs]} GB/s "
                f"(rej={rej})")

    if "fe" in phases:
        from rx_tools_tpu.ops import pallas_frontend as pf
        for choice in ("mm", "mm_i16", "mm_bf16"):
            pf._FE_CHOICE = choice
            fmchunk.fm_chunk_step.clear_cache()
            rs, rej = k_rate_gated(
                lambda k: make_chain_run(fmchunk.fm_chunk_step, cfg, k),
                (st0, pool), per_pass, K1, K2)
            g = statistics.median(rs) if rs else 0.0
            results[f"chain_fe_{choice}_gbs"] = round(g / 1e9, 2)
            log(f"chain fe={choice}: {['%.1f' % (x/1e9) for x in rs]} GB/s "
                f"(rej={rej})")
        pf._FE_CHOICE = "mm"
        fmchunk.fm_chunk_step.clear_cache()

    # ---- PFB phases ----------------------------------------------------
    PCH, PK2 = 4, 9
    pcfg = pfb.PfbConfig(capture_rate=2_400_000, n_channels=64,
                         custom_atan=1, deemph_a=7, rate_out2=32_000)
    nb = pfb.block_samples(pcfg)
    ppool = None
    if "pfbablate" in phases or "tmaj" in phases:
        pdata = rng.integers(-16000, 16000,
                             (PK2 * PCH, 2 * nb)).astype(np.int16)
        ppool = jax.device_put(pdata)
        pper_pass = PCH * 2 * nb * 2.0     # bytes per pass
        log(f"pfb block {nb} capture samples, C=64, M={nb // 64}")

    if "pfbablate" in phases:
        variants = {
            "full": pcfg,
            "nors": dataclasses.replace(pcfg, rate_out2=-1),
            "nodnr": dataclasses.replace(pcfg, rate_out2=-1, deemph_a=0),
        }
        for name, cfgv in variants.items():
            st0v = pfb.init_state(cfgv)

            def mk(k, cv=cfgv):
                @jax.jit
                def run(args):
                    st, pool = args
                    acc = jnp.zeros(())
                    for r in range(k):
                        for c in range(PCH):
                            st, audio, nv = pfb.pfb_step(
                                cv, st, pool[r * PCH + c])
                            acc = (acc + jnp.sum(audio)
                                   + jnp.sum(nv).astype(jnp.float32))
                    return acc + st.deemph_avg.sum()
                return run
            rs, rej = k_rate_gated(mk, (st0v, ppool), pper_pass, K1, PK2)
            g = statistics.median(rs) if rs else 0.0
            results[f"pfb_{name}_gbs"] = round(g / 1e9, 2)
            log(f"pfb {name}: {['%.2f' % (x/1e9) for x in rs]} GB/s "
                f"(rej={rej})")

        # filterbank + checksum only (no tail at all)
        st0t = pfb.init_state(pcfg)

        def mk_fb(k):
            @jax.jit
            def run(args):
                st_tail, pool = args
                acc = jnp.zeros(())
                tail = st_tail
                for r in range(k):
                    for c in range(PCH):
                        tail, zi, zq = pfb.filterbank_mxu(
                            pcfg, tail, pool[r * PCH + c])
                        acc = acc + jnp.sum(zi) + jnp.sum(zq)
                return acc
            return run
        rs, rej = k_rate_gated(mk_fb, (st0t.tail, ppool), pper_pass, K1, PK2)
        g = statistics.median(rs) if rs else 0.0
        results["pfb_fbsum_gbs"] = round(g / 1e9, 2)
        log(f"pfb fbsum: {['%.2f' % (x/1e9) for x in rs]} GB/s (rej={rej})")

    if "tmaj" in phases:
        for name, step, init in (
                ("cm", pfb.pfb_step, pfb.init_state),
                ("tmaj", pfb.pfb_step_tmaj, pfb.init_state_tmaj)):
            st0v = init(pcfg)

            def mk(k, stepf=step):
                @jax.jit
                def run(args):
                    st, pool = args
                    acc = jnp.zeros(())
                    for r in range(k):
                        for c in range(PCH):
                            st, audio, nv = stepf(pcfg, st,
                                                  pool[r * PCH + c])
                            acc = (acc + jnp.sum(audio)
                                   + jnp.sum(nv).astype(jnp.float32))
                    return acc + st.deemph_avg.sum()
                return run
            rs, rej = k_rate_gated(mk, (st0v, ppool), pper_pass, K1, PK2)
            g = statistics.median(rs) if rs else 0.0
            results[f"pfb_step_{name}_gbs"] = round(g / 1e9, 2)
            results[f"pfb_step_{name}_chanrt"] = round(
                g / 4.0 / 2_400_000 * 64, 0)
            log(f"pfb step {name}: {['%.2f' % (x/1e9) for x in rs]} GB/s "
                f"(rej={rej})")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
