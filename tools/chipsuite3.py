"""Round-3 micro-bisection: which construct de-vectorizes the frontend?

Context (tools/chipsuite2.py): plain int16->f32 convert+reduce runs at
~900 GB/s at ANY size, but the planar frontend (bitcast deinterleave +
iota-where rotate) is pinned at 1.8 GB/s — suspiciously ~one int16
element per cycle, i.e. a scalar loop — and the production interleaved
frontend at 0.6 GB/s.  Each variant here isolates one construct on the
same 4 MB int16 argument pool so the guilty op is unambiguous:

  pair_convert   x.reshape(N,2) -> f32 -> sum            ((N,2) shape)
  slice_deint    I=x2[:,0], Q=x2[:,1] -> f32 sums        (strided slices)
  bitcast_deint  int32 bitcast -> shifts -> f32 sums     (bitcast, NO rotate)
  iota_where     f32 flat, m=iota&3, where(m==0,y,-y)    (rotate-style select)
  rot_prod       ops.rotate_fs4 on (N,2) f32 -> sum      (production rotate)
  decim_inter    (K,14,2) f32 sum(axis=1) -> sum         (production decimate)
  decim_flat     (K,28) f32 sum(axis=1) -> sum           (flat-mixed decimate)

Methodology: bench.py rules, fori_loop passes, xor perturbation,
K-differenced marginals, medians.
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
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")

    S = np.float32(128.0 / 32767.0)
    elems = 2 * 1024 * 1024          # 4 MB of int16, divisible by 4*14*2
    elems = (elems // (4 * 14 * 2)) * (4 * 14 * 2)
    arr = jax.device_put(rng.integers(-16000, 16000, elems).astype(np.int16))

    def pair_convert(v):
        return (v.reshape(-1, 2).astype(jnp.float32) * S,)

    def slice_deint(v):
        x2 = v.reshape(-1, 2)
        return (x2[:, 0].astype(jnp.float32) * S,
                x2[:, 1].astype(jnp.float32) * S)

    def bitcast_deint(v):
        w = jax.lax.bitcast_convert_type(v.reshape(-1, 2), jnp.int32)
        i = jnp.left_shift(w, 16) >> 16
        q = w >> 16
        return (i.astype(jnp.float32) * S, q.astype(jnp.float32) * S)

    def iota_where(v):
        y = v.astype(jnp.float32) * S
        m = jnp.arange(y.shape[0], dtype=jnp.int32) & 3
        return (jnp.where(m == 0, y, -y),)

    def rot_prod(v):
        x = v.reshape(-1, 2).astype(jnp.float32) * S
        return (ops.rotate_fs4(x),)

    def decim_inter(v):
        x = v.reshape(-1, 14, 2).astype(jnp.float32) * S
        return (x.sum(axis=1),)

    def decim_flat(v):
        x = v.reshape(-1, 28).astype(jnp.float32) * S
        return (x.sum(axis=1),)

    variants = [("pair_convert", pair_convert),
                ("slice_deint", slice_deint),
                ("bitcast_deint", bitcast_deint),
                ("iota_where", iota_where),
                ("rot_prod", rot_prod),
                ("decim_inter", decim_inter),
                ("decim_flat", decim_flat)]
    which = set(sys.argv[1:]) or {n for n, _ in variants}
    results = {}
    for name, f in variants:
        if name not in which:
            continue
        log(f"{name}...")

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

        rs = k_rate(make, arr, arr.nbytes, 1, 129)
        results[name] = round(statistics.median(rs) / 1e9, 2)
        log(f"{name}: {['%.1f' % (x/1e9) for x in rs]} GB/s")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
