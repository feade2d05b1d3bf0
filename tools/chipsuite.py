"""One-process chip measurement suite (run detached; logs progressively).

The axon tunnel charges EVERY process a first-transfer setup that has
been observed anywhere from 50 s to 10+ min; running each experiment in
its own process turned round-3 probes into pure setup-cost timeouts.
This runner pays the setup once and then executes the requested phases
sequentially, printing a timestamped line per step so partial progress
survives a kill:

    nohup python tools/chipsuite.py layout chain fft > /tmp/chipsuite.log 2>&1 &

Phases: layout (interleave/planar frontend A/B, tools/layout_probe.py
variants), chain (full WBFM chain, bench.py geometry), fft (rx_power
spectrum path under the FIXED marginal methodology — re-measurement the
round-2 PERF.md numbers are pending on), pfb (channelizer capture rate).
All bench.py methodology; JSON on the last line.
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
    phases = sys.argv[1:] or ["layout", "chain"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain, fmchunk

    log(f"backend={jax.default_backend()} phases={phases}")
    rng = np.random.default_rng(0)
    t0 = time.time()
    warm = jax.device_put(np.ones(8, np.int16))
    float(jnp.sum(warm.astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")

    results = {}
    D = 14
    n = 262192
    BLOCKS = 4

    def report(name, rs):
        results[name] = round(statistics.median(rs) / 1e9, 2)
        log(f"{name}: {['%.1f' % (x/1e9) for x in rs]} GB/s")

    if "layout" in phases:
        _SCALE = np.float32(128.0 / 32767.0)
        data = rng.integers(-16000, 16000, (BLOCKS, 2 * n)).astype(np.int16)
        dd = jax.device_put(data)

        def planar_parts(v16):
            w = jax.lax.bitcast_convert_type(v16.reshape(-1, 2), jnp.int32)
            i = jnp.left_shift(w, 16) >> 16
            q = w >> 16
            fi = i.astype(jnp.float32) * _SCALE
            fq = q.astype(jnp.float32) * _SCALE
            m = jnp.arange(fi.shape[0], dtype=jnp.int32) & 3
            ri = jnp.where(m == 0, fi, jnp.where(m == 1, -fq,
                           jnp.where(m == 2, -fi, fq)))
            rq = jnp.where(m == 0, fq, jnp.where(m == 1, fi,
                           jnp.where(m == 2, -fq, -fi)))
            return ri, rq

        def fe_planar(v):
            ri, rq = planar_parts(v)
            k = ri.shape[0] // D
            return ri.reshape(k, D).sum(1), rq.reshape(k, D).sum(1)

        def fe_planar_nod(v):
            return planar_parts(v)

        variants = {
            "interleave": lambda v: (ops.capture_frontend_jnp(v, D),),
            "planar": fe_planar,
            "planar_nod": fe_planar_nod,
        }
        for name, fe in variants.items():
            log(f"layout variant {name}...")

            def make(n_passes, fe=fe):
                @jax.jit
                def run(pool):
                    def body(r, acc):
                        for b in range(BLOCKS):
                            v = jnp.bitwise_xor(pool[b],
                                                (r + 1).astype(jnp.int16))
                            for part in fe(v):
                                acc = acc + jnp.sum(part)
                        return acc
                    return jax.lax.fori_loop(0, n_passes, body,
                                             jnp.zeros((), jnp.float32))
                return run

            report(name, k_rate(make, dd, data.nbytes, 1, 33, reps=20))

    if "chain" in phases:
        CH = 4
        data = rng.integers(-16000, 16000,
                            (CH, 12, 2 * n)).astype(np.int16)
        dd = jax.device_put(data)
        cfg = fmchain.FmConfig(
            mode="fm", rate_in=2_400_000 // D, rate_out=2_400_000 // D,
            rate_out2=32_000, downsample=D, custom_atan=1,
            deemph_a=ops.deemph_alpha(2_400_000 // D, 75), squelch_level=0.0)
        state0 = fmchain.init_state(cfg)
        log("chain...")

        def make_chain(n_passes):
            @jax.jit
            def run(args):
                st, pool = args
                acc = jnp.zeros(())
                for r in range(n_passes):
                    for c in range(CH):
                        st, audio, n_valid, levels = fmchunk.fm_chunk_step(
                            cfg, st, pool[c] + jnp.int16(r))
                        acc = (acc + jnp.sum(audio)
                               + n_valid.sum().astype(jnp.float32)
                               + jnp.sum(levels))
                return acc + st.deemph_avg + st.prev_iq[0]
            return run

        rs = k_rate(make_chain, (state0, dd), data.nbytes, 1, 4)
        report("chain", rs)
        results["chain_samps_g"] = round(results["chain"] / 4.0 * 1e9 / 1e9, 2)

    if "fft" in phases:
        # rx_power hot loop: windowed batched FFT + |X|^2 accumulate
        # (ops/spectrum.py), 2048 bins x 512 segments, fixed methodology
        from rx_tools_tpu.ops import spectrum as sp
        bins, segs = 2048, 512
        data = rng.integers(-16000, 16000,
                            (4, segs, bins, 2)).astype(np.int16)
        dd = jax.device_put(data)
        win = jnp.asarray(ops.window("hamming", bins))
        log("fft...")

        def make_fft(n_passes):
            @jax.jit
            def run(pool):
                def body(r, acc):
                    for c in range(4):
                        x = (jnp.bitwise_xor(pool[c], (r + 1).astype(jnp.int16))
                             .astype(jnp.float32) * jnp.float32(1.0 / 256.0))
                        avg = jnp.zeros((bins,), jnp.float32)
                        samples = jnp.zeros((), jnp.int32)
                        avg, samples = sp.segmented_power_spectrum(
                            x, win, avg, samples, 1, False)
                        acc = acc + jnp.sum(avg) + samples.astype(jnp.float32)
                    return acc
                return jax.lax.fori_loop(0, n_passes, body,
                                         jnp.zeros((), jnp.float32))
            return run

        cs = 4 * segs * bins          # complex samples per pass
        rs = k_rate(make_fft, dd, cs, 1, 17)
        med = statistics.median(rs)
        results["fft_gcs"] = round(med / 1e9, 2)
        log(f"fft: {['%.1f' % (x/1e9) for x in rs]} G cs/s")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
