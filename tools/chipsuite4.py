"""Round-3 rotate-fix candidates + honest Pallas A/B (one process).

chipsuite3 verdict: the production ``rotate_fs4`` (column slices + stack
over an (N/4, 4, 2) view) runs SCALAR at 0.6 GB/s and is the frontend
bottleneck; flat iota-where selects and the (K,14,2) boxcar reduce both
run at ~1 TB/s.  Candidates measured here, all full frontends
(int16 arg pool -> rescale -> fs/4 rotate -> decimate by 14 -> checksum):

  jnp_fe      current production composition (baseline, ~0.6 GB/s)
  rev_fe      rotate via ONE lax.rev pair-swap + flat sign/select masks
  group_fe    rotate folded into the decimator: within-group +/- weighted
              sums (A = even-j, B = odd-j terms), one (K,2) combine
              z = A + i*B, per-group (-1)^k sign — the capture-rate work
              is pure broadcast-multiply + reduce
  pallas_fe   the round-2 Pallas kernel (honest: pool as argument)
  rev_only    lax.rev on the (N,2) minor axis alone (is rev vectorized?)

Correctness of each candidate is asserted against the jnp reference on
the first block before timing.
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
    D = 14
    elems = (2 * 1024 * 1024 // (4 * D * 2)) * (4 * D * 2)   # ~4 MB int16
    n = elems // 2
    arr = jax.device_put(rng.integers(-16000, 16000, elems).astype(np.int16))

    def jnp_fe(v):
        return (ops.capture_frontend_jnp(v, D),)

    def rev_fe(v):
        # rescale
        x2 = v.reshape(-1, 2).astype(jnp.float32) * S          # (N, 2)
        sw = jax.lax.rev(x2, dimensions=(1,))                  # pair swap
        xf, sf = x2.reshape(-1), sw.reshape(-1)                # flat (2N,)
        p = jnp.arange(xf.shape[0], dtype=jnp.int32)
        m = (p >> 1) & 3                                       # sample mod 4
        c = p & 1                                              # component
        # m=0: x; m=2: -x; m=1: (-Q, I) = sf * (c ? +1 : -1);
        # m=3: (Q, -I) = sf * (c ? -1 : +1)
        even = jnp.where(m == 0, xf, -xf)
        sgn_odd = jnp.where((m == 1) == (c == 1), sf, -sf)
        out = jnp.where((m & 1) == 0, even, sgn_odd)
        z = out.reshape(-1, D, 2).sum(axis=1)
        return (z,)

    def group_fe(v):
        x = (v.reshape(-1, 7, 2, 2).astype(jnp.float32) * S)   # (K,7,2,2)
        w = jnp.asarray([1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0],
                        jnp.float32)[None, :, None, None]
        ab = (x * w).sum(axis=1)                               # (K, 2, 2)
        a, b = ab[:, 0, :], ab[:, 1, :]                        # (K, 2) each
        ib = jax.lax.rev(b, dimensions=(1,)) * jnp.asarray([-1.0, 1.0],
                                                           jnp.float32)
        z = a + ib                                             # z = A + iB
        k = jnp.arange(z.shape[0], dtype=jnp.int32)
        z = jnp.where(((k & 1) == 0)[:, None], z, -z)          # i^(14k)
        return (z,)

    def pallas_fe(v):
        from rx_tools_tpu.ops.pallas_frontend import capture_frontend_pallas
        return (capture_frontend_pallas(v, D),)

    def rev_only(v):
        x2 = v.reshape(-1, 2).astype(jnp.float32) * S
        return (jax.lax.rev(x2, dimensions=(1,)),)

    # ---- correctness gate (vs the golden-tested jnp composition) -------
    probe = np.asarray(arr[: 4 * D * 2 * 64])
    ref = np.asarray(ops.capture_frontend_jnp(jnp.asarray(probe), D))
    for name, f in (("rev_fe", rev_fe), ("group_fe", group_fe)):
        got = np.asarray(f(jnp.asarray(probe))[0])
        err = float(np.max(np.abs(got - ref)))
        log(f"{name} max|err| vs jnp reference: {err:.2e}")
        assert err < 1e-3, (name, err)

    variants = [("jnp_fe", jnp_fe), ("rev_fe", rev_fe),
                ("group_fe", group_fe), ("pallas_fe", pallas_fe),
                ("rev_only", rev_only)]
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
