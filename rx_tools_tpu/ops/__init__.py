"""DSP kernels.

Each op is a pure function over float32 blocks (shape ``(N, 2)`` interleaved
I/Q pairs, or ``(N,)`` real audio), with any cross-block memory passed
explicitly as a small carried state — the functional re-design of the
reference's stateful C filters (``struct demod_state`` hist/accumulator
fields, ``src/rtl_fm.c:124-159``).  Ops compose under ``jit``/``vmap``/
``scan``/``shard_map``; carried states are the exact halos the parallel layer
exchanges between time shards.
"""

from rx_tools_tpu.ops.cic import CIC_9_TABLES, cic_9_taps
from rx_tools_tpu.ops.rotate import rotate_fs4_int16, rotate_fs4
from rx_tools_tpu.ops.fir import (
    boxcar_decimate, BoxcarState,
    fifth_order_decimate, fifth_order_cascade, FifthOrderState,
    droop_fir, DroopState,
    low_pass_simple,
)
from rx_tools_tpu.ops.discriminators import (
    polar_discriminant, fast_atan2, polar_disc_fast, polar_disc_lut,
    esbensen_disc,
    fm_discriminate, fm_discriminate_planar, fm_discriminate_batch,
    fm_discriminate_batch_planar, disc_mode,
    DISC_STD, DISC_FAST, DISC_LUT, DISC_ALE,
)
from rx_tools_tpu.ops.demods import am_demod, usb_demod, lsb_demod
from rx_tools_tpu.ops.filters import (
    deemph_filter, deemph_alpha,
    dc_block_audio, dc_block_raw, rms_level, rms_level_planar, mad_level,
)
from rx_tools_tpu.ops.pallas_frontend import (
    capture_frontend, capture_frontend_pallas, capture_frontend_jnp,
    capture_frontend_planar,
)
from rx_tools_tpu.ops.resample import (
    resample_divisible, resample_rational, resample_rational_batch,
    ResampleState)
from rx_tools_tpu.ops.windows import window, window_coefs_int, WINDOWS
from rx_tools_tpu.ops.spectrum import (
    segmented_power_spectrum, remove_dc, fftshift_quirks, power_to_dbm,
)

__all__ = [k for k in dir() if not k.startswith("_")]
