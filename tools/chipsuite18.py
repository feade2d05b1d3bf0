"""Round-4: the Pallas read path is the chain's cap — find the best front.

chipsuite17: pure-XLA xor reads distinct 12.4 MB chunks at 155 GB/s;
a TRIVIAL Pallas convert+rowsum kernel reads the same chunks at 34.8 —
the pallas_call streaming pipeline costs ~4.5x the XLA read path at
these tile shapes, and every kernel-fronted chain number (26-40) is
downstream of that.  Probe:

  fe_ab     frontend standalone: masked XLA / mm XLA dot / mm Pallas
  convt     convert+rowsum kernel at tile_rows 128/512/1024 + XLA twin
  chain_ab  full chain with each frontend (patched dispatch)
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
    phases = sys.argv[1:] or ["fe_ab", "convt", "chain_ab"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import dataclasses
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain, fmchunk
    from rx_tools_tpu.ops import frontend_mxu, pallas_frontend

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
    K1, K2 = 1, 9
    NPOOL = K2 * CH
    data = rng.integers(-16000, 16000,
                        (NPOOL, BL * 2 * n)).astype(np.int16)
    dd = jax.device_put(data)
    per_pass = CH * BL * 2 * n * 2

    def masked_fe(v, d=D, rotate=True):
        # the full masked path incl. the group-phase select (d % 4 != 0)
        y = v.astype(jnp.float32) * pallas_frontend._SCALE
        g = y.reshape(-1, 2 * d)
        a, b = pallas_frontend._fs4_decim_masks(d, rotate)
        zi = (g * jnp.asarray(a)[None, :]).sum(axis=1)
        zq = (g * jnp.asarray(b)[None, :]).sum(axis=1)
        if rotate and d % 4:
            kk = jnp.arange(zi.shape[0], dtype=jnp.int32)
            p = (kk * (d & 3)) & 3
            zi, zq = (jnp.where(p == 0, zi, jnp.where(p == 1, -zq,
                                jnp.where(p == 2, -zi, zq))),
                      jnp.where(p == 0, zq, jnp.where(p == 1, zi,
                                jnp.where(p == 2, -zq, -zi))))
        return zi, zq

    variants = {
        "masked": masked_fe,
        "mmx": lambda v: frontend_mxu.capture_frontend_mm(v, D),
        "t2": lambda v: frontend_mxu.capture_frontend_t2(v, D),
        "pal": lambda v: frontend_mxu.capture_frontend_mm_pallas(
            v, D, tile_rows=256),
    }

    if "fe_ab" in phases:
        for name, fn in variants.items():
            def mk(k, fn=fn):
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
                rs, rej = k_rate_gated(mk, dd, per_pass, K1, K2)
                results[f"fe_{name}"] = round(statistics.median(rs) / 1e9, 1)
                log(f"fe_{name}: {['%.1f' % (x/1e9) for x in rs]} (rej={rej})")
            except Exception as e:
                log(f"fe_{name} FAILED: {e!r}")
                results[f"fe_{name}"] = None

    if "convt" in phases:
        def conv_kernel(x_ref, o_ref):
            v = x_ref[:].astype(jnp.float32)
            o_ref[:] = jnp.sum(v.reshape(v.shape[0], v.shape[1] // 128,
                                         128), axis=1)

        def conv_read(flat, t):
            rows = flat.shape[0] // 3584
            x = flat.reshape(rows, 3584)
            return pl.pallas_call(
                conv_kernel,
                grid=(rows // t,),
                in_specs=[pl.BlockSpec((t, 3584), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((t, 128), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            )(x)

        for t in (128, 432, 864):           # rows=1728/chunk: divisors
            def mk(k, t=t):
                @jax.jit
                def run(pool):
                    acc = jnp.zeros(())
                    for r in range(k):
                        for c in range(CH):
                            acc = acc + jnp.sum(
                                conv_read(pool[r * CH + c], t))
                    return acc
                return run
            try:
                rs, rej = k_rate_gated(mk, dd, per_pass, K1, K2)
                results[f"convk_t{t}"] = round(
                    statistics.median(rs) / 1e9, 1)
                log(f"convk_t{t}: {['%.1f' % (x/1e9) for x in rs]} (rej={rej})")
            except Exception as e:
                log(f"convk_t{t} FAILED: {e!r}")

        def mk_xla(k):
            @jax.jit
            def run(pool):
                acc = jnp.zeros(())
                for r in range(k):
                    for c in range(CH):
                        v = pool[r * CH + c].astype(jnp.float32)
                        acc = acc + jnp.sum(
                            v.reshape(-1, 28, 128).sum(axis=1))
                return acc
            return run
        rs, rej = k_rate_gated(mk_xla, dd, per_pass, K1, K2)
        results["convk_xla"] = round(statistics.median(rs) / 1e9, 1)
        log(f"convk_xla: {['%.1f' % (x/1e9) for x in rs]} (rej={rej})")

    if "chain_ab" in phases:
        ddc = dd.reshape(NPOOL, BL, 2 * n)
        base = fmchain.FmConfig(
            mode="fm", rate_in=2_400_000 // D, rate_out=2_400_000 // D,
            rate_out2=32_000, downsample=D, custom_atan=1,
            deemph_a=ops.deemph_alpha(2_400_000 // D, 75),
            squelch_level=0.0)
        orig = ops.capture_frontend_planar

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
                rs, rej = k_rate_gated(make, (st0, ddc), per_pass, K1, 5)
                results[tag] = round(statistics.median(rs) / 1e9, 2)
                log(f"{tag}: {['%.2f' % (x/1e9) for x in rs]} (rej={rej})")
            except Exception as e:
                log(f"{tag} FAILED: {e!r}")
                results[tag] = None

        for i, (name, fn) in enumerate(variants.items()):
            ops.capture_frontend_planar = (
                lambda v, d, rotate=True, fn=fn: fn(v))
            try:
                chain_rate(dataclasses.replace(base, output_scale=10 + i),
                           f"ch_{name}")
            finally:
                ops.capture_frontend_planar = orig

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
