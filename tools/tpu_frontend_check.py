"""Real-TPU check of the fused Pallas capture frontend (no interpret mode).

Run on a machine with a TPU backend (the axon tunnel qualifies):

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/tpu_frontend_check.py

Verifies, on the actual chip:
  1. the Pallas kernel compiles and runs un-interpreted on real hardware;
  2. Pallas output == jnp composition output (f32, tight tolerance);
  3. the full `fm_chain_step` produces the same audio with the kernel
     opted in (RX_PALLAS=1) and off (default), so the opt-in is safe;
  4. marginal device time per block for both frontends (differenced
     repeat counts, median of rounds — bench.py methodology).

Measured round 2: the jnp path wins ~15x end-to-end because a pallas_call
is a fusion barrier (see ops/pallas_frontend.py); the kernel is opt-in.

Exit code 0 = all checks pass.  Used by tests/test_pallas_frontend.py's
TPU-gated wrapper and cited in docs/PERF.md.
"""

import os
import statistics
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    from rx_tools_tpu import ops
    from rx_tools_tpu.ops.pallas_frontend import (
        capture_frontend_jnp, capture_frontend_pallas)

    backend = jax.default_backend()
    print(f"backend={backend}", file=sys.stderr)
    if backend != "tpu":
        print("SKIP: no TPU backend", file=sys.stderr)
        return 0

    # wbfm-at-2.4M geometry (bench.py): D=14, 262192-sample blocks
    d = 14
    n = 262192
    # the opt-in dispatch falls back to jnp unless rows % 8 == 0 — assert
    # it here so check 3's chain A/B cannot silently compare jnp vs jnp
    # (advisor finding, round 2)
    assert (n // d) % 8 == 0, "geometry would bypass the Pallas dispatch"
    rng = np.random.default_rng(0)
    block = rng.integers(-32768, 32767, 2 * n).astype(np.int16)
    bdev = jax.device_put(block)

    # --- 1+2: kernel vs jnp on the chip ---------------------------------
    a = np.asarray(capture_frontend_pallas(bdev, d, True))
    b = np.asarray(capture_frontend_jnp(bdev, d, True))
    err = float(np.max(np.abs(a - b)))
    print(f"pallas_vs_jnp_max_abs_err={err:.3e}", file=sys.stderr)
    assert err < 1e-2, err     # f32 sum-order differences only

    # --- 3: dispatcher A/B (kernel opt-in vs default) --------------------
    # (the production chain is planar and no longer routes through the
    # dispatcher — round 3; this validates the opt-in surface itself)
    os.environ["RX_PALLAS"] = "1"
    try:
        a_on = np.asarray(jax.jit(
            lambda v: ops.capture_frontend(v, d, True))(bdev))
    finally:
        del os.environ["RX_PALLAS"]
    a_off = np.asarray(jax.jit(
        lambda v: ops.capture_frontend(v, d, True))(bdev))
    aerr = float(np.max(np.abs(a_on - a_off)))
    print(f"dispatch_pallas_vs_default_max_abs_err={aerr:.3e}",
          file=sys.stderr)
    assert aerr < 1e-2, aerr

    # --- 4: marginal per-call device time, both frontends ---------------
    def bench(fn, reps=11, k1=2, k2=8):
        def make(k):
            @jax.jit
            def run(x0):
                acc = jnp.zeros(())
                x = x0
                for i in range(k):
                    out = fn(x)
                    acc = acc + jnp.sum(out)
                    # feed distinct data each iter: XLA must not hoist
                    x = x + jnp.int16(i + 1)
                return acc
            return run
        r1, r2 = make(k1), make(k2)
        float(r1(bdev)); float(r2(bdev))
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); float(r1(bdev))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(r2(bdev))
            t2s.append(time.perf_counter() - t0)
        dt = (statistics.median(t2s) - statistics.median(t1s)) / (k2 - k1)
        return max(dt, 1e-12)

    tp = bench(lambda x: capture_frontend_pallas(x, d, True))
    tj = bench(lambda x: capture_frontend_jnp(x, d, True))
    bytes_in = 4 * n
    print(f"pallas: {tp*1e6:.1f} us/block  {bytes_in/tp/1e9:.1f} GB/s in-stream",
          file=sys.stderr)
    print(f"jnp:    {tj*1e6:.1f} us/block  {bytes_in/tj/1e9:.1f} GB/s in-stream",
          file=sys.stderr)
    print("OK", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
