"""Round-5c: time-major PFB step ablation at the official bench geometry
(524288-sample blocks, C=64), interleaved rounds.

  tmaj_full / tmaj_nors / tmaj_nodnr / tmaj_fbonly / cm_full

Locates what the tmaj tail still costs after the round-5 rebuild.

Run: PYTHONPATH=/root/repo python tools/chipsuite27.py > /tmp/cs27.log 2>&1
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
    import dataclasses
    import jax.numpy as jnp
    from rx_tools_tpu.models import pfb

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    float(jnp.sum(jax.device_put(np.ones(8, np.int16)).astype(jnp.float32)))

    cfg = pfb.PfbConfig(capture_rate=2_400_000, n_channels=64,
                        custom_atan=1, deemph_a=7, rate_out2=32_000)
    nb = pfb.block_samples(cfg, target=524288)
    CH, K1, K2 = 4, 1, 13
    pool = jax.device_put(rng.integers(
        -16000, 16000, (K2 * CH, 2 * nb)).astype(np.int16))
    per_pass = CH * 2 * nb * 2.0
    log(f"block {nb}, pool {pool.nbytes >> 20} MB, "
        f"marginal {(K2 - K1) * CH * 2 * nb * 2 >> 20} MB")

    cfgs = {
        "tmaj_full": cfg,
        "tmaj_nors": dataclasses.replace(cfg, rate_out2=-1),
        "tmaj_nodnr": dataclasses.replace(cfg, rate_out2=-1, deemph_a=0),
    }

    def mk_tmaj(cfgv, k):
        st0 = pfb.init_state_tmaj(cfgv)

        @jax.jit
        def run(pool):
            st = st0
            acc = jnp.zeros(())
            for r in range(k):
                for c in range(CH):
                    st, audio, nv = pfb.pfb_step_tmaj(cfgv, st,
                                                      pool[r * CH + c])
                    acc = acc + jnp.sum(audio) + nv.astype(jnp.float32)
            return acc + st.deemph_avg.sum()
        return run

    def mk_fbonly(k):
        st0 = pfb.init_state_tmaj(cfg)

        @jax.jit
        def run(pool):
            tail = st0.tailx
            acc = jnp.zeros(())
            for r in range(k):
                for c in range(CH):
                    tail, ch2 = pfb.filterbank_tmaj(cfg, tail,
                                                    pool[r * CH + c])
                    acc = acc + jnp.sum(ch2)
            return acc
        return run

    def mk_cm(k):
        st0 = pfb.init_state(cfg)

        @jax.jit
        def run(pool):
            st = st0
            acc = jnp.zeros(())
            for r in range(k):
                for c in range(CH):
                    st, audio, nv = pfb.pfb_step(cfg, st, pool[r * CH + c])
                    acc = (acc + jnp.sum(audio)
                           + jnp.sum(nv).astype(jnp.float32))
            return acc + st.deemph_avg.sum()
        return run

    runs = {}
    for name, cfgv in cfgs.items():
        r1, r2 = mk_tmaj(cfgv, K1), mk_tmaj(cfgv, K2)
        t0 = time.time(); float(r1(pool)); float(r2(pool))
        log(f"{name} compiled in {time.time()-t0:.0f}s")
        runs[name] = (r1, r2)
    r1, r2 = mk_fbonly(K1), mk_fbonly(K2)
    t0 = time.time(); float(r1(pool)); float(r2(pool))
    log(f"tmaj_fbonly compiled in {time.time()-t0:.0f}s")
    runs["tmaj_fbonly"] = (r1, r2)
    r1, r2 = mk_cm(K1), mk_cm(K2)
    t0 = time.time(); float(r1(pool)); float(r2(pool))
    log(f"cm_full compiled in {time.time()-t0:.0f}s")
    runs["cm_full"] = (r1, r2)

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
        log(f"{name}: {['%.1f' % (x/1e9) for x in rs]} GB/s")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
