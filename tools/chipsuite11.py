"""Round-3b: pin the int16 frontend cap, then run the official bench.

chipsuite10: the block-banded matmul on a PRE-converted f32 pool runs at
505-568 GB/s int16-equivalent, while every int16-input frontend variant
(masked, mm, Pallas fused-convert) sits at 18-31 GB/s.  Suspects: the
int16 xor perturbation materializing an int16 array (the honest-method
cost, not a chain cost), and/or int16->f32 convert feeding a dot.
Probes (all same 4-chunk bench-geometry pool):

  xor_sum       xor -> convert -> reduce (roofline repro at this size)
  xor_barrier   xor -> optimization_barrier -> convert+reduce (forces the
                int16 store)
  cvt_mm        convert+scale first, perturb in f32, then the mm matmul
                (no int16 elementwise op in the loop)
  cvt_masked    same f32 perturb feeding the masked-reduce frontend
  pal_mperturb  Pallas fused-convert kernel, perturbation folded into the
                tiny mask operand (pool untouched: measures the kernel's
                raw int16 HBM read rate)

Then runs bench.py's main() in-process for the official BENCH numbers.
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
    phases = sys.argv[1:] or ["probes", "bench"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
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
    K = BL * n // D
    HI = jax.lax.Precision.HIGHEST
    SCALE = np.float32(128.0 / 32767.0)

    if "probes" in phases:
        data = rng.integers(-16000, 16000, (CH, BL * 2 * n)).astype(np.int16)
        dd = jax.device_put(data)

        def xor_sum(v16, r):
            w = jnp.bitwise_xor(v16, (r + 1).astype(jnp.int16))
            return jnp.sum(w.astype(jnp.float32))

        def xor_barrier(v16, r):
            w = jnp.bitwise_xor(v16, (r + 1).astype(jnp.int16))
            w = jax.lax.optimization_barrier(w)
            return jnp.sum(w.astype(jnp.float32))

        def cvt_mm(v16, r):
            y = (v16.astype(jnp.float32) * SCALE
                 + r.astype(jnp.float32) * 1e-3)
            g = y.reshape(K // 32, 32 * 2 * D)
            m = jnp.asarray(frontend_mxu._fs4_decim_matrix(D, 32, True))
            out = jax.lax.dot_general(g, m, (((1,), (0,)), ((), ())),
                                      precision=HI)
            return jnp.sum(out)

        def cvt_masked(v16, r):
            y = (v16.astype(jnp.float32) * SCALE
                 + r.astype(jnp.float32) * 1e-3)
            g = y.reshape(-1, 2 * D)
            a, b = pallas_frontend._fs4_decim_masks(D, True)
            zi = (g * jnp.asarray(a)[None, :]).sum(axis=1)
            zq = (g * jnp.asarray(b)[None, :]).sum(axis=1)
            k = jnp.arange(zi.shape[0], dtype=jnp.int32)
            p = (k * (D & 3)) & 3
            zi2 = jnp.where(p == 0, zi, jnp.where(p == 1, -zq,
                            jnp.where(p == 2, -zi, zq)))
            zq2 = jnp.where(p == 0, zq, jnp.where(p == 1, zi,
                            jnp.where(p == 2, -zq, -zi)))
            return jnp.sum(zi2) + jnp.sum(zq2)

        for name, fn in (("xor_sum", xor_sum), ("xor_barrier", xor_barrier),
                         ("cvt_mm", cvt_mm), ("cvt_masked", cvt_masked)):
            def make(k, fn=fn):
                @jax.jit
                def run(pool):
                    def body(r, acc):
                        s = jnp.zeros((), jnp.float32)
                        for c in range(CH):
                            s = s + fn(pool[c], r)
                        return acc + s
                    return jax.lax.fori_loop(0, k, body,
                                             jnp.zeros((), jnp.float32))
                return run
            try:
                rs = k_rate(make, dd, data.nbytes, 1, 17)
                results[name] = round(statistics.median(rs) / 1e9, 2)
                log(f"{name}: {['%.1f' % (x/1e9) for x in rs]} GB/s")
            except Exception as e:
                log(f"{name} FAILED: {e!r}")
                results[name] = None

        # Pallas kernel with the perturbation folded into the mask operand:
        # the int16 pool is read untouched by the kernel each pass
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        import functools as _ft

        mmat_np = frontend_mxu._fs4_decim_matrix(D, 32, True)
        x2 = dd.reshape(CH, K // 32, 32 * 2 * D)

        def make_pal(k):
            rows = K // 32
            t = 128
            grid = (rows + t - 1) // t

            @jax.jit
            def run(args):
                pool, mmat = args

                def body(r, acc):
                    m_r = mmat + r.astype(jnp.float32) * 1e-30
                    s = jnp.zeros((), jnp.float32)
                    for c in range(CH):
                        out = pl.pallas_call(
                            _ft.partial(frontend_mxu._mm_kernel,
                                        scale=float(SCALE)),
                            grid=(grid,),
                            in_specs=[
                                pl.BlockSpec((t, 32 * 2 * D), lambda g: (g, 0),
                                             memory_space=pltpu.VMEM),
                                pl.BlockSpec((32 * 2 * D, 64), lambda g: (0, 0),
                                             memory_space=pltpu.VMEM)],
                            out_specs=pl.BlockSpec((t, 64), lambda g: (g, 0),
                                                   memory_space=pltpu.VMEM),
                            out_shape=jax.ShapeDtypeStruct((rows, 64),
                                                           jnp.float32),
                        )(pool[c], m_r)
                        s = s + jnp.sum(out)
                    return acc + s
                return jax.lax.fori_loop(0, k, body,
                                         jnp.zeros((), jnp.float32))
            return run

        try:
            rs = k_rate(make_pal, (x2, jnp.asarray(mmat_np)), data.nbytes,
                        1, 17)
            results["pal_mperturb"] = round(statistics.median(rs) / 1e9, 2)
            log(f"pal_mperturb: {['%.1f' % (x/1e9) for x in rs]} GB/s")
        except Exception as e:
            log(f"pal_mperturb FAILED: {e!r}")
            results["pal_mperturb"] = None

        print(json.dumps(results), flush=True)

    if "bench" in phases:
        log("running bench.py main() in-process...")
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench
        bench.main()


if __name__ == "__main__":
    main()
