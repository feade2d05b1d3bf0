"""Round-3: full-chain re-measure with the masked-sum frontend.

After the 60x frontend fix (ops/pallas_frontend.py capture_frontend_jnp,
masked trailing-axis reduces), where does the chain stand and what
dominates now?  Honest methodology throughout (pool as argument,
xor perturbation, checksums, K-differenced marginals).

  chain      flat engine, bench.py geometry (4 chunks x 12 x 262k blocks)
  frontend   capture_frontend_jnp alone at the same per-block geometry
  scan_chain the per-block traced-loop engine (stream/scan.py)
"""

import json
import os
import statistics
import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def k_rate(make_run, arg, work_units, k1, k2, reps=14, rounds=3):
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
    phases = sys.argv[1:] or ["frontend", "chain", "scan_chain"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain, fmchunk
    from rx_tools_tpu.stream.scan import scan_fm_blocks

    log(f"backend={jax.default_backend()} phases={phases}")
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")
    results = {}

    D = 14
    n = 262192
    CH, BL = 4, 12
    data = rng.integers(-16000, 16000, (CH, BL, 2 * n)).astype(np.int16)
    dd = jax.device_put(data)
    cfg = fmchain.FmConfig(
        mode="fm", rate_in=2_400_000 // D, rate_out=2_400_000 // D,
        rate_out2=32_000, downsample=D, custom_atan=1,
        deemph_a=ops.deemph_alpha(2_400_000 // D, 75), squelch_level=0.0)
    st0 = fmchain.init_state(cfg)

    if "frontend" in phases:
        log("frontend...")

        def make_fe(k):
            @jax.jit
            def run(pool):
                def body(r, acc):
                    for c in range(CH):
                        v = jnp.bitwise_xor(pool[c].reshape(-1),
                                            (r + 1).astype(jnp.int16))
                        acc = acc + jnp.sum(ops.capture_frontend_jnp(v, D))
                    return acc
                return jax.lax.fori_loop(0, k, body,
                                         jnp.zeros((), jnp.float32))
            return run

        rs = k_rate(make_fe, dd, data.nbytes, 1, 17)
        results["frontend_gbs"] = round(statistics.median(rs) / 1e9, 2)
        log(f"frontend: {['%.1f' % (x/1e9) for x in rs]} GB/s")

    if "chain" in phases:
        log("chain (flat engine)...")

        def make_chain(k):
            @jax.jit
            def run(args):
                st, pool = args
                acc = jnp.zeros(())
                for r in range(k):
                    for c in range(CH):
                        st, audio, nv, lv = fmchunk.fm_chunk_step(
                            cfg, st, pool[c] + jnp.int16(r))
                        acc = (acc + jnp.sum(audio)
                               + nv.sum().astype(jnp.float32) + jnp.sum(lv))
                return acc + st.deemph_avg + st.prev_iq[0]
            return run

        rs = k_rate(make_chain, (st0, dd), data.nbytes, 1, 4)
        g = statistics.median(rs)
        results["chain_gbs"] = round(g / 1e9, 2)
        results["chain_gsamps"] = round(g / 4 / 1e9, 3)
        log(f"chain: {['%.2f' % (x/1e9) for x in rs]} GB/s "
            f"= {g/4/1e9:.2f} G samp/s")

    if "scan_chain" in phases:
        log("chain (scan engine)...")

        def make_scan(k):
            @jax.jit
            def run(args):
                st, pool = args
                acc = jnp.zeros(())
                for r in range(k):
                    for c in range(CH):
                        st, audio, nv, lv = scan_fm_blocks(
                            cfg, st, pool[c] + jnp.int16(r))
                        acc = (acc + jnp.sum(audio)
                               + nv.sum().astype(jnp.float32) + jnp.sum(lv))
                return acc + st.deemph_avg + st.prev_iq[0]
            return run

        rs = k_rate(make_scan, (st0, dd), data.nbytes, 1, 4)
        g = statistics.median(rs)
        results["scan_gbs"] = round(g / 1e9, 2)
        log(f"scan chain: {['%.2f' % (x/1e9) for x in rs]} GB/s")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
