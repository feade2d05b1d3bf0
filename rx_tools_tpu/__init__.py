"""rx_tools_tpu — a TPU-native software-radio framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``rxseger/rx_tools`` (reference mounted at /root/reference): the three SDR
receive tools ``rx_fm`` (FM/AM/SSB demodulation), ``rx_power`` (windowed-FFT
power-spectrum sweeps) and ``rx_sdr`` (raw I/Q recording with format
conversion), rebuilt as a layered library:

- :mod:`rx_tools_tpu.iq`       — sample formats (CU8/CS8/CS12/CS16/CF32) and
                                 block sources (files, stdin, synthetic signal
                                 generators).  Mirrors the format-conversion
                                 semantics of ``src/rtl_sdr.c:348-391``.
- :mod:`rx_tools_tpu.ops`      — the DSP kernels (decimators, discriminators,
                                 IIRs, windows, power spectra) in two
                                 numerically distinct flavours: ``exact``
                                 (bit-faithful to the reference's int16 C
                                 arithmetic, used for golden tests) and
                                 ``fast`` (float32 block kernels built for the
                                 TPU VPU/MXU).
- :mod:`rx_tools_tpu.models`   — full signal chains ("models"): WBFM/NBFM/AM/
                                 USB/LSB demodulation pipelines and the
                                 power-sweep spectral pipeline, as jittable
                                 ``(state, block) -> (state, out)`` step
                                 functions.
- :mod:`rx_tools_tpu.stream`   — the block-streaming runtime: carried-state
                                 pytrees, `lax.scan` pipelines, double-buffered
                                 host feeding, checkpoint/resume.
- :mod:`rx_tools_tpu.parallel` — device meshes, overlap-save halo exchange for
                                 time-sharded FIR chains, hop-sharded sweeps.
- :mod:`rx_tools_tpu.apps`     — argument-compatible CLI front-ends
                                 ``rx_fm`` / ``rx_power`` / ``rx_sdr``.
- :mod:`rx_tools_tpu.native`   — C++ host runtime (ring-buffer block feeder,
                                 packed-format codecs) loaded via ctypes.
"""

__version__ = "0.1.0"

from rx_tools_tpu.utils import units  # noqa: F401
