"""``rx_channels`` — demodulate MANY stations from one capture (beyond
the reference: rx_fm does exactly one channel per process per dongle,
``src/rtl_fm.c:189-193`` "multiple of these, eventually").

Two engines:

- ``-n D``: polyphase filterbank (``models/pfb.py``) — D uniform channels
  spaced fs/D across the capture, one FIR + one FFT for all of them.
- ``-k f1[,f2,...]``: mixer channelizer (``models/channelizer.py``) —
  arbitrary station frequencies, ``-D`` sets the per-channel decimation.

Each channel's audio is written to ``<outdir>/chNN_<freq>.s16`` (16-bit
PCM, same sample format as rx_fm's output).  Device flags mirror the
other tools (`-d -f -s -g -p -a`).  Scaling: ``-t N`` shards the PFB
channel axis over local devices (parallel/chanshard.py), and a
multi-process job (JAX_COORDINATOR_ADDRESS/...) divides the channel
axis across processes with zero cross-process communication — each
process computes and writes only its own channels.

    # all 64 FM-band channels of a 2.4 Msps capture, 32 kHz audio each
    rx_channels -f 98M -s 2.4M -n 64 -M fm -A fast -c us -r 32k \\
                -d file=band.cs16,rate=2.4M out/

    # two named stations through the mixer engine
    rx_channels -f 100M -s 2.4M -k 100.3M,101.1M -D 16 -r 32k out/
"""

from __future__ import annotations

import getopt
import os
import sys

import numpy as np

from rx_tools_tpu import ops
from rx_tools_tpu.apps import common
from rx_tools_tpu.models import channelizer, fmchain, pfb
from rx_tools_tpu.utils.logging import log
from rx_tools_tpu.utils.units import atofs

USAGE = """rx_channels (rx_tools_tpu), multi-channel demodulator

Usage:\t -f center_frequency [Hz]
\t[-s capture samplerate (default: 2400000 Hz)]
\t[-n channels: polyphase filterbank, n uniform channels]
\t[-k f1[,f2,...]: mixer engine, explicit station frequencies]
\t[-D decimation for -k (default: 16)]
\t[-M mode fm|am|usb|lsb|raw (default: fm)]
\t[-A std|fast|lut|ale atan mode (default: fast)]
\t[-c deemphasis us|eu|N_us|off (default: us)]
\t[-r audio resample rate (default: 32k; 0 = channel rate)]
\t[-b block size in capture samples (default: 131072)]
\t[-e exit after N seconds of signal]
\t[-d device key/value query] [-g gain] [-p ppm] [-a antenna]
\toutput directory (channel files chNN_<freq>.s16)
"""


def usage():
    sys.stderr.write(USAGE + "\n")
    raise SystemExit(1)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    common.select_platform()
    try:
        opts, args = getopt.getopt(argv, "f:s:n:k:D:M:A:c:r:b:e:d:g:p:a:t:")
    except getopt.GetoptError as e:
        log("%s", str(e))
        usage()

    freq = None
    rate = 2_400_000
    n_uniform = 0
    stations: list[float] = []
    decim = 16
    mode = "fm"
    atan = "fast"
    deemph_arg = "us"
    rate_out2 = 32_000
    block_target = 131072
    exit_s = 0.0
    dev_query = ""
    gain_str = None
    ppm = 0.0
    antenna = None
    dev_parallel = 1

    for opt, arg in opts:
        if opt == "-f":
            freq = atofs(arg)
        elif opt == "-s":
            rate = int(atofs(arg))
        elif opt == "-n":
            n_uniform = int(arg)
        elif opt == "-k":
            stations = [atofs(v) for v in arg.split(",") if v]
        elif opt == "-D":
            decim = int(arg)
        elif opt == "-M":
            mode = arg
        elif opt == "-A":
            atan = arg
        elif opt == "-c":
            deemph_arg = arg
        elif opt == "-r":
            rate_out2 = int(atofs(arg))
        elif opt == "-b":
            block_target = int(atofs(arg))
        elif opt == "-e":
            exit_s = float(atofs(arg))
        elif opt == "-d":
            dev_query = arg
        elif opt == "-g":
            gain_str = arg
        elif opt == "-p":
            ppm = atofs(arg)
        elif opt == "-a":
            antenna = arg
        elif opt == "-t":
            dev_parallel = int(arg)

    outdir = args[0] if args else None
    if outdir is None or freq is None:
        usage()
    if bool(n_uniform) == bool(stations):
        log("exactly one of -n (PFB) or -k (mixer stations) is required")
        return 1
    if mode not in ("fm", "am", "usb", "lsb", "raw"):
        log("unsupported mode: %s", mode)
        return 1

    d = n_uniform if n_uniform else decim
    channel_rate = rate // d
    tmaj_layout = False
    scan_step = None

    # --- multi-process channel division (round-5) -----------------------
    # the channel axis partitions across processes exactly like rx_power's
    # hop axis: each process computes ONLY its contiguous channel slice
    # (its own mixer columns / PFB DFT rows + tails; the shared
    # capture-rate front replicates) and writes ONLY its channel files —
    # zero cross-process communication, deterministic sources required
    from rx_tools_tpu.parallel import multihost
    multihost.init()
    n_proc = multihost.process_count()
    pid = 0
    if n_proc > 1:
        import jax as _jx0
        pid = _jx0.process_index()
    deemph_a = 0
    if mode == "fm" and deemph_arg != "off":
        tc_us = {"us": 75, "eu": 50}.get(deemph_arg)
        if tc_us is None:
            tc_us = int(float(deemph_arg))
        # demod_tail applies de-emphasis at channel_rate, BEFORE the
        # audio resampler, so alpha must be computed at that rate (the
        # reference computes it at the rate the filter runs, rtl_fm.c:1412)
        deemph_a = ops.deemph_alpha(channel_rate, tc_us)

    chan_index0 = 0                   # global index of this process's ch 0
    if n_uniform:
        cfg = pfb.PfbConfig(capture_rate=rate, n_channels=n_uniform,
                            mode=mode, custom_atan=ops.disc_mode(atan),
                            deemph_a=deemph_a,
                            rate_out2=rate_out2 if rate_out2 > 0 else -1)
        freqs = [freq + off for off in cfg.channel_freqs()]
        state = pfb.init_state(cfg)
        step = pfb.pfb_step
        block_size = pfb.block_samples(cfg, target=block_target)
        my_n = n_uniform
        if n_proc > 1:
            per = -(-n_uniform // n_proc)
            chan_index0 = min(pid * per, n_uniform)
            my_hi = min(chan_index0 + per, n_uniform)
            my_n = my_hi - chan_index0
            freqs = freqs[chan_index0:my_hi]
            log("Multi-process channels: process %d/%d owns channels "
                "%d..%d of %d.", pid, n_proc, chan_index0, my_hi - 1,
                n_uniform)
        # round-5: the channel axis shards over local devices (zero
        # steady-state collectives, bit-identical — parallel/chanshard.py)
        import jax as _jax
        local_devs = (_jax.local_devices() if n_proc > 1
                      else _jax.devices())
        want = (len(local_devs) if dev_parallel <= 0
                else min(dev_parallel, len(local_devs)))
        n_mesh = 1
        for cand in range(min(want, my_n), 0, -1):
            if my_n % cand == 0:
                n_mesh = cand
                break
        if n_mesh > 1 or n_proc > 1:
            from rx_tools_tpu.parallel import (make_mesh,
                                               channel_sharded_pfb_step)
            mesh_c = make_mesh(n_mesh, axis="c", devices=local_devs)
            rng_c = (chan_index0, chan_index0 + my_n)
            state = pfb.PfbState(
                tail=state.tail,
                prev_iq=state.prev_iq[rng_c[0]: rng_c[1]],
                deemph_avg=state.deemph_avg[rng_c[0]: rng_c[1]],
                resamp=type(state.resamp)(
                    state.resamp.acc[rng_c[0]: rng_c[1]],
                    state.resamp.phase[rng_c[0]: rng_c[1]]))

            def step(c, s, b, _m=mesh_c, _r=rng_c):
                return channel_sharded_pfb_step(c, s, b, _m, channels=_r)
            log("Sharding %d channels over %d devices.", my_n, n_mesh)
        elif (os.environ.get("RX_PFB", "tmaj") == "tmaj"
              and mode != "raw"
              and (block_size // n_uniform) % 128 == 0):
            # round-5 single-device default: the time-major step — every
            # tail construct row-major, measured ~6x the channel-major
            # step on TPU (models/pfb.py pfb_step_tmaj; RX_PFB=cm
            # restores the channel-major engine, which is also what the
            # -t sharded path runs per shard)
            state = pfb.init_state_tmaj(cfg)
            step = pfb.pfb_step_tmaj
            scan_step = pfb.pfb_scan_blocks_tmaj
            tmaj_layout = True
    else:
        offsets = tuple(f - freq for f in stations)
        span = max(abs(o) for o in offsets)
        if span > rate / 2:
            log("station %s is outside the capture bandwidth", max(stations))
            return 1
        if n_proc > 1:
            per = -(-len(stations) // n_proc)
            chan_index0 = min(pid * per, len(stations))
            my_hi = min(chan_index0 + per, len(stations))
            stations = stations[chan_index0:my_hi]
            offsets = offsets[chan_index0:my_hi]
            log("Multi-process channels: process %d/%d owns stations "
                "%d..%d.", pid, n_proc, chan_index0, my_hi - 1)
        cfg = channelizer.ChannelizerConfig(
            capture_rate=rate, offsets=offsets, downsample=decim,
            mode=mode, custom_atan=ops.disc_mode(atan), deemph_a=deemph_a,
            rate_out2=rate_out2 if rate_out2 > 0 else -1)
        freqs = list(stations)
        state = channelizer.init_state(cfg)
        step = channelizer.channelize_step
        block_size = channelizer.block_samples(cfg, target=block_target)
        if (os.environ.get("RX_MIXER", "tmaj") == "tmaj"
                and channelizer.tmaj_supported(cfg, block_size)):
            # round-5: the time-major mixer folds the per-channel mix
            # INTO the decimation window (one MXU dot, no capture-rate
            # per-channel intermediate) with an exact integer NCO;
            # RX_MIXER=cm restores the float-NCO channel-major engine
            state = channelizer.init_state_tmaj(cfg)
            step = channelizer.channelize_step_tmaj
            scan_step = channelizer.channelize_scan_blocks_tmaj
            tmaj_layout = True

    do_exit = [False]
    common.install_sigint(lambda *a: do_exit.__setitem__(0, True))

    with common.suppress_stdout():
        src = common.verbose_device_search(dev_query)
        common.verbose_set_sample_rate(src, rate)
        common.verbose_set_frequency(src, freq)
        common.verbose_gain_str_set(src, gain_str)
        if antenna:
            common.verbose_antenna_str_set(src, antenna)
        common.verbose_ppm_set(src, ppm)
        # activation inside the suppression window too (rtl_fm.c:880)
        src.activate()

    if n_proc > 1:
        from rx_tools_tpu.iq.sources import FileSource, SynthSource
        if not isinstance(src, (FileSource, SynthSource)):
            log("multi-process rx_channels needs a deterministic "
                "replayable source (file=/synth=).")
            return 1
    os.makedirs(outdir, exist_ok=True)
    files = []
    for i, f in enumerate(freqs):
        path = os.path.join(
            outdir, f"ch{chan_index0 + i:02d}_{int(round(f))}.s16")
        files.append(open(path, "wb"))
    log("rx_channels: %d channels at %.0f S/s audio -> %s",
        len(freqs), float(rate_out2 if rate_out2 > 0 else channel_rate),
        outdir)

    import jax
    import jax.numpy as jnp
    read_total = 0
    rc = 0
    pend = np.empty(0, np.int16)      # partial-block accumulator
    eof = False
    # chunked dispatch (time-major engine): up to CHUNK full blocks go to
    # the device in ONE dispatch (models/pfb.pfb_scan_blocks_tmaj) — the
    # per-block host->device round trip (~26 ms on a tunneled TPU) is the
    # CLI's real throughput ceiling, exactly the dispatch-amortization
    # story of stream/chunked.py; bit-identical to per-block dispatch
    chunk_cap = (int(os.environ.get("RX_CHANNELS_CHUNK", "8"))
                 if tmaj_layout else 1)

    # device-side PCM quantization (same trunc(clip) as
    # fmchain.audio_to_int16): the tunneled fetch was the measured CLI
    # bottleneck (tools/clibench.py) — int16 halves the transfer
    _to_i16 = jax.jit(lambda a: jnp.trunc(
        jnp.clip(a, -32768, 32767)).astype(jnp.int16))

    def _emit(audio, n_valid, valid):
        if tmaj_layout:
            # time-major engine: audio is (cap, C) with one shared valid
            # count — transpose is a free numpy view
            audio = np.asarray(audio).T
            n_valid = np.full(audio.shape[0], int(n_valid))
        frac = valid / block_size
        for i, fh in enumerate(files):
            keep = int(round(int(n_valid[i]) * frac))
            fh.write(np.ascontiguousarray(audio[i, :keep]).tobytes())

    def _drain(pending):
        if pending is None:
            return
        audio_d, nv_d, vals, batched = pending
        audio_h, nv_h = jax.device_get((audio_d, nv_d))
        if batched:
            for j, valid in enumerate(vals):
                _emit(audio_h[j], nv_h[j], valid)
        else:
            _emit(audio_h, nv_h, vals)

    pending = None       # previous chunk's device handles: drained AFTER
    try:                 # the next chunk is dispatched (fetch overlaps)
        while not do_exit[0] and not eof:
            fulls, valids = [], []
            while len(fulls) < chunk_cap and not do_exit[0]:
                # accumulate partial reads until a full block (a short
                # read is a stall or tail, not EOF — only n == 0 ends)
                while pend.size < 2 * block_size:
                    n, buf = src.read_stream(block_size - pend.size // 2)
                    if n == 0:
                        eof = True
                        break
                    if n < 0:
                        sys.stderr.write("O")
                        sys.stderr.flush()
                        continue
                    pend = np.concatenate([pend, buf[: 2 * n]])
                    read_total += n
                valid = pend.size // 2
                if valid == 0:
                    break
                if valid < block_size:        # EOF tail: zero-pad + trim
                    pend = np.concatenate(
                        [pend,
                         np.zeros(2 * (block_size - valid), np.int16)])
                fulls.append(pend[: 2 * block_size])
                valids.append(valid)
                pend = np.empty(0, np.int16)
                if eof or (exit_s and read_total >= exit_s * rate):
                    break
            if not fulls:
                break
            if tmaj_layout and len(fulls) > 1:
                state, audio_b, nv_b = scan_step(cfg, state,
                                                 np.stack(fulls))
                _drain(pending)          # fetch prev while this computes
                pending = (_to_i16(audio_b), nv_b, list(valids), True)
            else:
                for j, valid in enumerate(valids):
                    state, audio, n_valid = step(cfg, state, fulls[j])
                    _drain(pending)
                    pending = (_to_i16(audio), n_valid, valid, False)
            if exit_s and read_total >= exit_s * rate:
                break
        _drain(pending)
        pending = None
    finally:
        src.deactivate()
        src.close()
        for fh in files:
            fh.close()
    log("rx_channels: processed %d capture samples", read_total)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
