"""Round-3: honest PFB channelizer re-measure + frontend geometry probe.

  pfb     models/pfb.py 64-channel channelizer, pool-as-argument (the
          round-2 "~0.57 G capture samp/s / ~15 000 channel-RT" numbers
          predate the constant-folding discovery and need re-grounding)
  fegeom  masked-sum frontend rate vs flat operand size (2/8/32 M
          elements) — why 39 GB/s at the 2 MB probe but 13 GB/s at
          bench geometry?
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
    phases = sys.argv[1:] or ["pfb", "fegeom"]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops

    log(f"backend={jax.default_backend()} phases={phases}")
    rng = np.random.default_rng(0)
    t0 = time.time()
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))
    log(f"first fetch: {time.time()-t0:.0f}s")
    results = {}

    if "pfb" in phases:
        from rx_tools_tpu.models import pfb
        cfg = pfb.PfbConfig(capture_rate=2_400_000, n_channels=64,
                            custom_atan=1, deemph_a=7, rate_out2=32_000)
        n = pfb.block_samples(cfg)
        CH = 4
        data = rng.integers(-16000, 16000, (CH, 2 * n)).astype(np.int16)
        dd = jax.device_put(data)
        st0 = pfb.init_state(cfg)
        log(f"pfb: block={n} channels=64")

        def make(k):
            @jax.jit
            def run(args):
                st, pool = args
                acc = jnp.zeros(())
                for r in range(k):
                    for c in range(CH):
                        st, audio, nv = pfb.pfb_step(
                            cfg, st, pool[c] + jnp.int16(r))
                        acc = (acc + jnp.sum(audio)
                               + nv.sum().astype(jnp.float32))
                return acc + st.deemph_avg.sum()
            return run

        rs = k_rate(make, (st0, dd), data.nbytes, 1, 5)
        g = statistics.median(rs)
        samps = g / 4.0                    # int16 pairs
        results["pfb_gbs"] = round(g / 1e9, 3)
        results["pfb_gsamps"] = round(samps / 1e9, 3)
        # channel-RT equivalents: each of 64 channels consumes
        # capture_rate samples per second of signal
        results["pfb_channel_rt"] = round(samps / 2_400_000 * 64, 0)
        log(f"pfb: {['%.2f' % (x/1e9) for x in rs]} GB/s -> "
            f"{samps/1e9:.3f} G samp/s, {samps/2.4e6*64:.0f} channel-RT")

    if "fegeom" in phases:
        D = 14
        for me in (2, 8, 32):
            elems = (me * 1024 * 1024 // (4 * D * 2)) * (4 * D * 2)
            arr = jax.device_put(
                rng.integers(-16000, 16000, elems).astype(np.int16))

            def make(k):
                @jax.jit
                def run(p):
                    def body(r, acc):
                        v = jnp.bitwise_xor(p, (r + 1).astype(jnp.int16))
                        zi, zq = ops.capture_frontend_planar(v, D)
                        return acc + jnp.sum(zi) + jnp.sum(zq)
                    return jax.lax.fori_loop(0, k, body,
                                             jnp.zeros((), jnp.float32))
                return run

            k2 = max(9, 129 // me * 2 + 1)
            rs = k_rate(make, arr, arr.nbytes, 1, k2)
            results[f"fe_{me}m"] = round(statistics.median(rs) / 1e9, 1)
            log(f"fe_{me}m: {['%.1f' % (x/1e9) for x in rs]} GB/s (k2={k2})")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
