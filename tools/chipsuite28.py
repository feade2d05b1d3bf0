"""Round-5c: mixer channelizer cm-vs-tmaj in-step A/B, interleaved.

  mixer_cm    channel-major float-NCO engine (channelize_step)
  mixer_tmaj  time-major mix-folded-into-decimator engine
              (channelize_step_tmaj) — one MXU dot + M-rate phasor

C=64 arbitrary (non-uniform) integer offsets, 2.4 Msps capture, D=16,
32 kHz audio per channel.

Run: PYTHONPATH=/root/repo python tools/chipsuite28.py > /tmp/cs28.log 2>&1
"""

import json
import os
import statistics
import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    import jax.numpy as jnp
    from rx_tools_tpu.models import channelizer as chan

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))

    fs, d, c = 2_400_000, 16, 64
    offs = tuple(float(v) for v in
                 rng.choice(np.arange(-fs // 2 + 20000, fs // 2 - 20000,
                                      1000), c, replace=False))
    cfg = chan.ChannelizerConfig(capture_rate=fs, offsets=offs,
                                 downsample=d, mode="fm", custom_atan=1,
                                 deemph_a=7, rate_out2=32_000)
    n = chan.block_samples(cfg, target=131072)
    CH, K1, K2 = 4, 1, 9
    pool = jax.device_put(rng.integers(
        -16000, 16000, (K2 * CH, 2 * n)).astype(np.int16))
    per_pass = CH * 2 * n * 2.0
    log(f"block {n}, C={c}, marginal {(K2-K1)*CH*2*n*2 >> 20} MB")

    def mk(step, init, k):
        st0 = init(cfg)

        @jax.jit
        def run(pool):
            st = st0
            acc = jnp.zeros(())
            for r in range(k):
                for cc in range(CH):
                    st, audio, nv = step(cfg, st, pool[r * CH + cc])
                    acc = (acc + jnp.sum(audio)
                           + jnp.sum(nv).astype(jnp.float32))
            return acc + st.deemph_avg.sum()
        return run

    variants = {
        "mixer_cm": (chan.channelize_step, chan.init_state),
        "mixer_tmaj": (chan.channelize_step_tmaj, chan.init_state_tmaj),
    }
    runs = {}
    for name, (step, init) in variants.items():
        r1, r2 = mk(step, init, K1), mk(step, init, K2)
        t0 = time.time(); float(r1(pool)); float(r2(pool))
        log(f"{name} compiled in {time.time()-t0:.0f}s")
        runs[name] = (r1, r2)

    rounds = {k: [] for k in runs}
    for _ in range(4):
        for name, (r1, r2) in runs.items():
            t1s, t2s = [], []
            for _ in range(10):
                t0 = time.perf_counter(); float(r1(pool))
                t1s.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); float(r2(pool))
                t2s.append(time.perf_counter() - t0)
            dt = (statistics.median(t2s) - statistics.median(t1s)) / (K2 - K1)
            if dt > 0:
                rounds[name].append(per_pass / dt)
    results = {}
    for name, rs in rounds.items():
        g = statistics.median(rs) if rs else 0.0
        results[name + "_gbs"] = round(g / 1e9, 2)
        results[name + "_chanrt"] = round(g / 4.0 / fs * c, 0)
        log(f"{name}: {['%.2f' % (x/1e9) for x in rs]} GB/s")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
