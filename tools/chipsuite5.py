"""Round-3: the masked-sum frontend (no pair ops at capture rate).

Every rotate formulation that touches I/Q pairs at capture rate lowers
scalar (~0.6-1.2 GB/s, chipsuite4 — even the Pallas kernel, whose
outside bitcast is the scalar part).  But trailing-axis masked reduces
run at ~800 GB/s (chipsuite3 decim_flat).  The fix: fold rescale, fs/4
rotate AND the boxcar decimate into TWO masked sums over the flat
interleaved stream.

Derivation: rotated sample n contributes x[n]*i^n; the decimated output
z[k] = sum_{j<D} x[Dk+j] * i^(Dk+j) = i^(Dk) * sum_j x[Dk+j] * i^j.
Over the FLAT interleaved f32 array y (2N,), each element lands in
exactly one of Re(z) or Im(z) with sign +/-1: element (n, I): m=n%4 ->
0:+Re 1:+Im 2:-Re 3:-Im; element (n, Q): m -> 0:+Im 1:-Re 2:-Im 3:+Re.
So with fixed 2D-length patterns a (Re mask) and b (Im mask) in
{+1,0,-1}:

    zi[k] = sum(y[28k:28k+28] * a);  zq[k] = ... * b        (K, 28) reduces
    z[k] *= i^(Dk)  (D=14: (-1)^k, a flat select at K scale)

Variants:  masked_planar (keep zi, zq as separate planes — the planar
chain's input), masked_pair (+ final stack to (K,2) for drop-in
compatibility), masked_digest (planar + a discriminator-style consumer
probe: shifted products on contiguous slices — are flat shifts fast?).
Correctness asserted vs ops.capture_frontend_jnp before timing.
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


def fs4_masks(d: int) -> tuple[np.ndarray, np.ndarray]:
    """(2D,) Re/Im masks in {+1,0,-1} for one decimation group."""
    a = np.zeros(2 * d, np.float32)
    b = np.zeros(2 * d, np.float32)
    for j in range(d):
        m = j & 3
        if m == 0:
            a[2 * j] = 1.0; b[2 * j + 1] = 1.0
        elif m == 1:
            b[2 * j] = 1.0; a[2 * j + 1] = -1.0
        elif m == 2:
            a[2 * j] = -1.0; b[2 * j + 1] = -1.0
        else:
            b[2 * j] = -1.0; a[2 * j + 1] = 1.0
    return a, b


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
    elems = (2 * 1024 * 1024 // (4 * D * 2)) * (4 * D * 2)
    arr = jax.device_put(rng.integers(-16000, 16000, elems).astype(np.int16))
    a_np, b_np = fs4_masks(D)
    A, B = jnp.asarray(a_np), jnp.asarray(b_np)

    def masked_planar(v):
        y = v.astype(jnp.float32) * S               # flat (2N,)
        g = y.reshape(-1, 2 * D)                    # (K, 28)
        zi = (g * A[None, :]).sum(axis=1)
        zq = (g * B[None, :]).sum(axis=1)
        k = jnp.arange(zi.shape[0], dtype=jnp.int32)
        s = jnp.where((k & 1) == 0, 1.0, -1.0)      # i^(14k) = (-1)^k
        return zi * s, zq * s

    def masked_pair(v):
        zi, zq = masked_planar(v)
        return (jnp.stack([zi, zq], axis=-1),)

    def masked_digest(v):
        # the planar discriminator's shape of consumption: products of
        # the stream with a 1-shifted copy via CONTIGUOUS flat slices
        zi, zq = masked_planar(v)
        cr = zi[1:] * zi[:-1] + zq[1:] * zq[:-1]
        cj = zq[1:] * zi[:-1] - zi[1:] * zq[:-1]
        return cr, cj

    # ---- correctness vs the golden-tested jnp composition --------------
    probe = np.asarray(arr[: 4 * D * 2 * 64])
    ref = np.asarray(ops.capture_frontend_jnp(jnp.asarray(probe), D))
    got = np.asarray(masked_pair(jnp.asarray(probe))[0])
    err = float(np.max(np.abs(got - ref)))
    log(f"masked_pair max|err| vs jnp reference: {err:.2e}")
    assert err < 1e-3, err

    variants = [("masked_planar", masked_planar),
                ("masked_pair", masked_pair),
                ("masked_digest", masked_digest)]
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
