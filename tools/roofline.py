"""Delivered-bandwidth roofline for the WBFM chain on the real chip.

Answers the round-2 open question (docs/PERF.md): is the chain's
~9-10 G I/Q samples/s at the machine's delivered HBM bandwidth, or is
there headroom nobody has looked for?  Measurements, all with the
bench.py methodology (resident data, per-pass perturbation so nothing is
loop-invariant, checksummed outputs, K-differenced marginal device time,
medians of rounds):

  ceiling   int16 xor-reduce over a large resident pool — the purest
            "read HBM, touch every byte once" op.  XOR (not add) so the
            reduction cannot be algebraically split into
            sum(pool) + f(perturbation) and hoisted.
  convert   int16 -> f32 scale + reduce — adds the dtype widening the
            chain's capture stage does.
  frontend  ops.capture_frontend_jnp (rescale + fs/4 rotate + boxcar
            decimate by 14) + checksum — the capture-rate 95% of the
            chain's work, without the demod tail.
  chain     the full flat-engine WBFM chain (bench.py's measurement).

Programs are kept SMALL (few unrolled passes) because XLA compile time
on this backend grows steeply with program size (CLAUDE.md); the
marginal work is instead kept above the tunnel's ms-scale RPC jitter by
using a large pool.  Run phases selectively (each compiles ~2 programs):

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/roofline.py ceiling
    python tools/roofline.py convert frontend
    python tools/roofline.py chain

Hot loops being rooflined: ``src/rtl_fm.c:845-848`` (rescale),
``:309-327`` (rotate), ``:351-371`` (boxcar).
"""

import json
import os
import statistics
import sys
import time

import numpy as np


def k_differenced_rate(make_run, state0, work_units, k1, k2, reps=14,
                       rounds=3):
    """Marginal device time per pass via median(t(k2)) - median(t(k1)).

    ``make_run(k)`` must return a jitted fn of ``state0`` whose result is
    a scalar that depends on every pass's work.  Returns units/s for each
    of ``rounds`` measurement rounds (the chip's delivered rate
    fluctuates over seconds — never trust a single round).
    """
    out = []
    r1, r2 = make_run(k1), make_run(k2)
    float(r1(state0))                      # compile + first-fetch
    float(r2(state0))
    for _ in range(rounds):
        t1s, t2s = [], []
        for _ in range(reps):
            t0 = time.perf_counter(); float(r1(state0))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(r2(state0))
            t2s.append(time.perf_counter() - t0)
        dt = (statistics.median(t2s) - statistics.median(t1s)) / (k2 - k1)
        out.append(work_units / dt if dt > 0 else 0.0)
    return out


def main():
    phases = set(sys.argv[1:]) or {"ceiling", "convert", "frontend", "chain"}
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu import ops
    from rx_tools_tpu.models import fmchain, fmchunk

    print(f"# backend={jax.default_backend()} phases={sorted(phases)}",
          file=sys.stderr)

    D = 14
    n = fmchain.block_samples(
        fmchain.FmConfig(mode="fm", rate_in=2_400_000 // D,
                         rate_out=2_400_000 // D, rate_out2=32_000,
                         downsample=D), target=262144)
    BLOCKS = 12
    rng = np.random.default_rng(0)

    results = {}

    def report(name, rs):
        results[f"{name}_gbs"] = statistics.median(rs) / 1e9
        print(f"# {name} rounds: {['%.1f' % (x/1e9) for x in rs]} GB/s",
              file=sys.stderr)

    # ---- pure-bandwidth phases: ONE flat 256 MB pool -------------------
    # The per-pass body runs under lax.fori_loop keyed on the loop index
    # (whole-pool reads, NO dynamic slicing — the scan cliff does not
    # apply), so large pass counts compile in seconds and the K-marginal
    # can be sized to ~20 ms of device work, far above the tunnel's
    # ms-scale RPC jitter.  The pool is a function ARGUMENT, not a
    # closure — a closed-over device array gets baked into the
    # remote-compile payload on this backend (HTTP 413 above ~100 MB).
    if phases & {"ceiling", "convert"}:
        flat = jax.device_put(
            rng.integers(-16000, 16000, 128 * 1024 * 1024).astype(np.int16))
        float(jnp.sum(flat[:8].astype(jnp.float32)))      # first-fetch warmup

        if "ceiling" in phases:
            def make_ceiling(n_passes):
                @jax.jit
                def run(pool):
                    def body(r, acc):
                        v = jnp.bitwise_xor(pool, (r + 1).astype(jnp.int16))
                        return acc + jnp.sum(v.astype(jnp.int32))
                    return jax.lax.fori_loop(0, n_passes, body,
                                             jnp.zeros((), jnp.int32))
                return run
            report("ceiling",
                   k_differenced_rate(make_ceiling, flat, flat.nbytes, 1, 41))

        if "convert" in phases:
            def make_convert(n_passes):
                @jax.jit
                def run(pool):
                    def body(r, acc):
                        v = jnp.bitwise_xor(pool, (r + 1).astype(jnp.int16))
                        return acc + jnp.sum(v.astype(jnp.float32)
                                             * jnp.float32(128.0 / 32767.0))
                    return jax.lax.fori_loop(0, n_passes, body,
                                             jnp.zeros((), jnp.float32))
                return run
            report("convert",
                   k_differenced_rate(make_convert, flat, flat.nbytes, 1, 41))

    # ---- frontend: rescale + rotate + boxcar decimate ------------------
    if "frontend" in phases:
        N_CHUNKS = 4
        data = rng.integers(-16000, 16000,
                            (N_CHUNKS, BLOCKS * 2 * n)).astype(np.int16)
        data_dev = jax.device_put(data)
        float(jnp.sum(data_dev[0][:8].astype(jnp.float32)))

        def make_frontend(n_passes):
            @jax.jit
            def run(pool):
                def body(r, acc):
                    for c in range(N_CHUNKS):      # static chunk indices
                        v = jnp.bitwise_xor(pool[c], (r + 1).astype(jnp.int16))
                        acc = acc + jnp.sum(ops.capture_frontend_jnp(v, D))
                    return acc
                return jax.lax.fori_loop(0, n_passes, body,
                                         jnp.zeros((), jnp.float32))
            return run
        report("frontend",
               k_differenced_rate(make_frontend, data_dev, data.nbytes, 1, 21))

    # ---- full chain (bench.py geometry: 4 chunks x 12 blocks) ----------
    if "chain" in phases:
        CHAIN_CHUNKS = 4
        data = rng.integers(-16000, 16000,
                            (CHAIN_CHUNKS, BLOCKS, 2 * n)).astype(np.int16)
        data_dev = jax.device_put(data)
        float(jnp.sum(data_dev[0][0][:8].astype(jnp.float32)))
        cfg = fmchain.FmConfig(
            mode="fm", rate_in=2_400_000 // D, rate_out=2_400_000 // D,
            rate_out2=32_000, downsample=D, custom_atan=1,
            deemph_a=ops.deemph_alpha(2_400_000 // D, 75), squelch_level=0.0)
        state0 = fmchain.init_state(cfg)

        def make_chain(n_passes):
            @jax.jit
            def run(args):
                st, pool = args
                acc = jnp.zeros(())
                for r in range(n_passes):
                    for c in range(CHAIN_CHUNKS):
                        st, audio, n_valid, levels = fmchunk.fm_chunk_step(
                            cfg, st, pool[c] + jnp.int16(r))
                        acc = (acc + jnp.sum(audio)
                               + n_valid.sum().astype(jnp.float32)
                               + jnp.sum(levels))
                return acc + st.deemph_avg + st.prev_iq[0]
            return run
        report("chain",
               k_differenced_rate(make_chain, (state0, data_dev),
                                  data.nbytes, 1, 4))
        results["chain_samps"] = results["chain_gbs"] * 1e9 / 4.0

    if results.get("ceiling_gbs") and results.get("chain_gbs"):
        results["fraction_of_ceiling"] = (
            results["chain_gbs"] / results["ceiling_gbs"])
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
