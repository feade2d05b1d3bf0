"""Round-3 follow-up chip experiments (one process, detached).

Phase ``ab``: the smoking-gun test for the bench artifact — the SAME
small chain program measured twice, once with the data pool CLOSED OVER
(bench.py r01/r02 style; on this backend closures ship as literal
constants in the remote-compile payload, making them compile-time
foldable) and once with the pool passed as an ARGUMENT.  If closure
measures far faster than arg, the committed 9-10 G chain numbers were
XLA folding the capture work at compile time and the honest number is
the arg one.

Phase ``sizes``: per-op overhead vs operand size.  The convert op hit
792 GB/s on a 256 MB flat array while the same math ran at ~1.8 GB/s on
1 MB blocks — this ladder (1/4/16/64 MB, planar_nod + convert) maps the
fixed-overhead knee so the chain's block geometry can be chosen where
ops amortize.

Run: PYTHONPATH=... nohup python tools/chipsuite2.py ab sizes > log 2>&1 &
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
    phases = sys.argv[1:] or ["ab", "sizes"]
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
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")
    results = {}

    D = 14
    n = 262192

    if "ab" in phases:
        CH, BL = 2, 3
        data = rng.integers(-16000, 16000, (CH, BL, 2 * n)).astype(np.int16)
        dd = jax.device_put(data)
        cfg = fmchain.FmConfig(
            mode="fm", rate_in=2_400_000 // D, rate_out=2_400_000 // D,
            rate_out2=32_000, downsample=D, custom_atan=1,
            deemph_a=ops.deemph_alpha(2_400_000 // D, 75), squelch_level=0.0)
        st0 = fmchain.init_state(cfg)

        def chain_body(st, pool, n_passes):
            acc = jnp.zeros(())
            for r in range(n_passes):
                for c in range(CH):
                    st, audio, nv, lv = fmchunk.fm_chunk_step(
                        cfg, st, pool[c] + jnp.int16(r))
                    acc = (acc + jnp.sum(audio)
                           + nv.sum().astype(jnp.float32) + jnp.sum(lv))
            return acc + st.deemph_avg + st.prev_iq[0]

        log("ab: closure variant (bench r01/r02 style)...")

        def make_closure(k):
            @jax.jit
            def run(st):
                return chain_body(st, dd, k)
            return run

        rs = k_rate(make_closure, st0, data.nbytes, 1, 4)
        results["ab_closure_gbs"] = round(statistics.median(rs) / 1e9, 3)
        log(f"ab closure: {['%.2f' % (x/1e9) for x in rs]} GB/s")

        log("ab: argument variant...")

        def make_arg(k):
            @jax.jit
            def run(args):
                st, pool = args
                return chain_body(st, pool, k)
            return run

        rs = k_rate(make_arg, (st0, dd), data.nbytes, 1, 4)
        results["ab_arg_gbs"] = round(statistics.median(rs) / 1e9, 3)
        log(f"ab arg: {['%.2f' % (x/1e9) for x in rs]} GB/s")

    if "sizes" in phases:
        _SCALE = np.float32(128.0 / 32767.0)

        def planar_nod(v16):
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

        def convert(v16):
            return (v16.astype(jnp.float32) * _SCALE,)

        def planar_full(v16):
            ri, rq = planar_nod(v16)
            k = ri.shape[0] // D
            return ri.reshape(k, D).sum(1), rq.reshape(k, D).sum(1)

        for mb in (1, 4, 16, 64):
            elems = mb * 512 * 1024 * 2 // 2 * 2        # int16 elements
            elems = (elems // (2 * D * 4)) * (2 * D * 4)
            arr = jax.device_put(
                rng.integers(-16000, 16000, elems).astype(np.int16))
            for fname, f in (("convert", convert),
                             ("planar_nod", planar_nod),
                             ("planar", planar_full)):
                def make(k, f=f):
                    @jax.jit
                    def run(p):
                        def body(r, acc):
                            v = jnp.bitwise_xor(p, (r + 1).astype(jnp.int16))
                            for part in f(v):
                                acc = acc + jnp.sum(part)
                            return acc
                        return jax.lax.fori_loop(0, k, body,
                                                 jnp.zeros((), jnp.float32))
                    return run
                # scale pass count so the marginal stays ~5-20 ms
                k2 = max(5, min(257, (64 // mb) * 16 + 1))
                rs = k_rate(make, arr, arr.nbytes, 1, k2, reps=12)
                key = f"{fname}_{mb}mb"
                results[key] = round(statistics.median(rs) / 1e9, 2)
                log(f"{key}: {['%.1f' % (x/1e9) for x in rs]} GB/s (k2={k2})")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
