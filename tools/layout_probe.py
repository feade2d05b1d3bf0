"""Layout experiments for the capture-rate hot path (real chip).

docs/PERF.md round-3 question: the chain runs at ~5% of the measured
~795 GB/s delivered bandwidth — what bounds it?  Hypothesis: the chain's
``(N, 2)`` interleaved-pair layout leaves the VPU's 128-wide lane axis
nearly idle, and the ``(K, D=14)`` boxcar reduce is equally lane-hostile.
This probe measures planar variants (I and Q as separate flat arrays,
deinterleaved for free by an int32 bitcast — the Pallas kernel's trick,
kept in pure jnp so XLA can still fuse):

  interleave   current capture_frontend_jnp ((N,2) f32 path)
  planar       bitcast -> shifts -> planar rotate -> (K, D) sum per plane
  planar_nod   planar convert+rotate only (no decimate) — isolates the
               reduce cost
  planar_mm    planar with the boxcar as a (K, D) @ ones(D) matvec

All bench.py methodology (fori_loop passes keyed on the loop index,
xor perturbation, checksummed, K-differenced, medians of rounds).
Hot loops: rtl_fm.c:845-848, :309-327, :351-371.
"""

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.roofline import k_differenced_rate  # noqa: E402

_SCALE = np.float32(128.0 / 32767.0)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops

    D = 14
    n = 262192                  # per-block, bench.py geometry — compile
    BLOCKS = 4                  # time explodes on multi-M-sample arrays
    N_CHUNKS = 1                # and with instance count: keep tiny bodies
    rng = np.random.default_rng(0)
    data = rng.integers(-16000, 16000,
                        (N_CHUNKS, BLOCKS, 2 * n)).astype(np.int16)
    data_dev = jax.device_put(data)
    float(jnp.sum(data_dev[0][0][:8].astype(jnp.float32)))
    print(f"# backend={jax.default_backend()}", file=sys.stderr)

    def planar_parts(v16):
        w = jax.lax.bitcast_convert_type(v16.reshape(-1, 2), jnp.int32)
        i = jnp.left_shift(w, 16) >> 16          # low half, sign-extended
        q = w >> 16                              # arithmetic high half
        fi = i.astype(jnp.float32) * _SCALE
        fq = q.astype(jnp.float32) * _SCALE
        m = jnp.arange(fi.shape[0], dtype=jnp.int32) & 3
        ri = jnp.where(m == 0, fi, jnp.where(m == 1, -fq,
                       jnp.where(m == 2, -fi, fq)))
        rq = jnp.where(m == 0, fq, jnp.where(m == 1, fi,
                       jnp.where(m == 2, -fq, -fi)))
        return ri, rq

    def frontend_planar(v16):
        ri, rq = planar_parts(v16)
        k = ri.shape[0] // D
        zi = ri.reshape(k, D).sum(axis=1)
        zq = rq.reshape(k, D).sum(axis=1)
        return zi, zq

    def frontend_planar_nod(v16):
        return planar_parts(v16)

    def frontend_planar_mm(v16):
        ri, rq = planar_parts(v16)
        k = ri.shape[0] // D
        ones = jnp.ones((D,), jnp.float32)
        zi = ri.reshape(k, D) @ ones
        zq = rq.reshape(k, D) @ ones
        return zi, zq

    variants = {
        "interleave": lambda v: (ops.capture_frontend_jnp(v, D),),
        "planar": frontend_planar,
        "planar_nod": frontend_planar_nod,
        "planar_mm": frontend_planar_mm,
    }
    which = set(sys.argv[1:]) or set(variants)
    results = {}
    for name, fe in variants.items():
        if name not in which:
            continue

        def make(n_passes, fe=fe):
            @jax.jit
            def run(pool):
                def body(r, acc):
                    for c in range(N_CHUNKS):      # static indices: the
                        for b in range(BLOCKS):    # dynamic-slice cliff
                            v = jnp.bitwise_xor(pool[c, b],
                                                (r + 1).astype(jnp.int16))
                            for part in fe(v):
                                acc = acc + jnp.sum(part)
                    return acc
                return jax.lax.fori_loop(0, n_passes, body,
                                         jnp.zeros((), jnp.float32))
            return run

        rs = k_differenced_rate(make, data_dev, data.nbytes, 1, 33, reps=20)
        results[name] = statistics.median(rs) / 1e9
        print(f"# {name} rounds: {['%.1f' % (x/1e9) for x in rs]} GB/s",
              file=sys.stderr)
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
