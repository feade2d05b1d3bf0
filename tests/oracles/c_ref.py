"""Bit-faithful NumPy oracles of the reference DSP (the "virtual binaries").

The reference ships no tests (SURVEY.md §4); these oracles re-state its C99
semantics — int16 wraparound stores, truncation-toward-zero division,
arithmetic shifts, the exact rounding biases — in plain Python loops, so the
TPU kernels can be golden-tested against them: bit-for-bit for the
integer-exact ops, SNR-bounded for the float fast path.

Each function cites the reference location it models.  Python ints are
arbitrary precision, so C's implicit int-width behaviour is made explicit
with :func:`i16` (wrap to int16) and :func:`cdiv` (truncating division).
"""

from __future__ import annotations

import math

import numpy as np


def i16(v):
    """Wrap to int16 like a C ``int16_t`` store."""
    return int((int(v) + 0x8000) % 0x10000 - 0x8000)


def i8(v):
    """Wrap to int8 like a C ``int8_t`` store."""
    return int((int(v) + 0x80) % 0x100 - 0x80)


def cdiv(a, b):
    """C integer division: truncate toward zero."""
    q = abs(int(a)) // abs(int(b))
    return q if (a >= 0) == (b >= 0) else -q


def ctrunc(x):
    """C double->int conversion: truncate toward zero."""
    return int(math.trunc(x))


# ---------------------------------------------------------------------------
# rtl_fm.c kernels
# ---------------------------------------------------------------------------

CIC_9_TABLES = [
    [0] * 9,
    [-156,  -97, 2798, -15489, 61019, -15489, 2798,  -97, -156],
    [-128, -568, 5593, -24125, 74126, -24125, 5593, -568, -128],
    [-129, -639, 6187, -26281, 77511, -26281, 6187, -639, -129],
    [-122, -612, 6082, -26353, 77818, -26353, 6082, -612, -122],
    [-120, -602, 6015, -26269, 77757, -26269, 6015, -602, -120],
    [-120, -582, 5951, -26128, 77542, -26128, 5951, -582, -120],
    [-119, -580, 5931, -26094, 77505, -26094, 5931, -580, -119],
    [-119, -578, 5921, -26077, 77484, -26077, 5921, -578, -119],
    [-119, -577, 5917, -26067, 77473, -26067, 5917, -577, -119],
    [-199, -362, 5303, -25505, 77489, -25505, 5303, -362, -199],
]


def rescale_cs16_to_8bit(buf):
    """rtlsdr_callback capture rescale (rtl_fm.c:845-848)."""
    return [i16(ctrunc(int(v) / 32767.0 * 128.0 + 0.4)) for v in buf]


def rotate16_90(buf):
    """+fs/4 mix by i^n sign/swap (rtl_fm.c:309-327); len % 8 == 0."""
    b = [int(v) for v in buf]
    for i in range(0, len(b), 8):
        tmp = i16(-b[i + 3])
        b[i + 3] = b[i + 2]
        b[i + 2] = tmp
        b[i + 4] = i16(-b[i + 4])
        b[i + 5] = i16(-b[i + 5])
        tmp = i16(-b[i + 6])
        b[i + 6] = b[i + 7]
        b[i + 7] = tmp
    return b


def low_pass(lowpassed, downsample, now_r=0, now_j=0, prev_index=0):
    """Boxcar decimate with carry (rtl_fm.c:351-371).

    Returns (out, (now_r, now_j, prev_index)).
    """
    out = []
    i = 0
    while i < len(lowpassed):
        now_r += int(lowpassed[i])
        now_j += int(lowpassed[i + 1])
        i += 2
        prev_index += 1
        if prev_index < downsample:
            continue
        out += [i16(now_r), i16(now_j)]
        prev_index = 0
        now_r = 0
        now_j = 0
    return out, (now_r, now_j, prev_index)


def low_pass_simple(signal2, step):
    """Block-sum post-decimate (rtl_fm.c:373-387); returns len//step values."""
    out = []
    for i in range(0, len(signal2) - len(signal2) % step, step):
        out.append(i16(sum(int(signal2[i + k]) for k in range(step))))
    return out


def low_pass_real(result, rate_out, rate_out2, now_lpr=0, prev_lpr_index=0):
    """Rational resampler (rtl_fm.c:389-409).

    Returns (out, (now_lpr, prev_lpr_index)).
    """
    fast, slow = int(rate_out), int(rate_out2)
    out = []
    for v in result:
        now_lpr += int(v)
        prev_lpr_index += slow
        if prev_lpr_index < fast:
            continue
        out.append(i16(cdiv(now_lpr, cdiv(fast, slow))))
        prev_lpr_index -= fast
        now_lpr = 0
    return out, (now_lpr, prev_lpr_index)


def fifth_order_fm(data, hist):
    """Stateful halfband decimator, one component of interleaved data
    (rtl_fm.c:411-440).  ``data``: interleaved list; operates on even
    indices; returns (new_data, new_hist).  Mirrors in-place C semantics:
    outputs land at data[i/2]."""
    d = [int(v) for v in data]
    h = [int(v) for v in hist]
    length = len(d)
    a, b, c, dd, e, f = h[1], h[2], h[3], h[4], h[5], d[0]
    d[0] = i16((a + (b + e) * 5 + (c + dd) * 10 + f) >> 4)
    i = 4
    while i < length:
        a, b = c, dd
        c, dd = e, f
        e = d[i - 2]
        f = d[i]
        d[i // 2] = i16((a + (b + e) * 5 + (c + dd) * 10 + f) >> 4)
        i += 4
    return d, [a, b, c, dd, e, f]


def generic_fir_fm(data, fir, hist):
    """Stateful 9-tap droop FIR, one component (rtl_fm.c:442-465).

    ``fir`` is a CIC_9_TABLES row (9 taps, index 0..8 but C indexes the
    row's taps as fir[1..5] of the {length, taps...} layout — here ``fir``
    is the plain 9-tap list, so fir[1..5] maps to taps[0..4]).
    Returns (new_data, new_hist)."""
    d = [int(v) for v in data]
    h = [int(v) for v in hist]
    t = [0] + list(fir)   # emulate the C {length, coefs...} layout
    for idx in range(0, len(d), 2):
        temp = d[idx]
        s = 0
        s += (h[0] + h[8]) * t[1]
        s += (h[1] + h[7]) * t[2]
        s += (h[2] + h[6]) * t[3]
        s += (h[3] + h[5]) * t[4]
        s += h[4] * t[5]
        d[idx] = i16(s >> 15)
        h = h[1:] + [temp]
    return d, h


def multiply(ar, aj, br, bj):
    return ar * br - aj * bj, aj * br + ar * bj


def polar_discriminant(ar, aj, br, bj):
    """atan2 discriminator, pi -> 1<<14 with the 3.14159 literal
    (rtl_fm.c:476-483)."""
    cr, cj = multiply(ar, aj, br, -bj)
    angle = math.atan2(float(cj), float(cr))
    return ctrunc(angle / 3.14159 * (1 << 14))


def fast_atan2(y, x):
    """Integer octant approximation (rtl_fm.c:485-506)."""
    pi4, pi34 = 1 << 12, 3 * (1 << 12)
    if x == 0 and y == 0:
        return 0
    yabs = -y if y < 0 else y
    if x >= 0:
        angle = pi4 - cdiv(pi4 * (x - yabs), x + yabs)
    else:
        angle = pi34 - cdiv(pi4 * (x + yabs), yabs - x)
    return -angle if y < 0 else angle


def polar_disc_fast(ar, aj, br, bj):
    cr, cj = multiply(ar, aj, br, -bj)
    return fast_atan2(cj, cr)


ATAN_LUT_SIZE = 131072
ATAN_LUT_COEF = 8
_atan_lut = None


def _get_atan_lut():
    global _atan_lut
    if _atan_lut is None:
        _atan_lut = [ctrunc(math.atan(i / (1 << ATAN_LUT_COEF)) / 3.14159 * (1 << 14))
                     for i in range(ATAN_LUT_SIZE)]
    return _atan_lut


def polar_disc_lut(ar, aj, br, bj):
    """LUT discriminator (rtl_fm.c:528-564)."""
    lut = _get_atan_lut()
    cr, cj = multiply(ar, aj, br, -bj)
    if cr == 0 or cj == 0:
        if cr == 0 and cj == 0:
            return 0
        if cr == 0 and cj > 0:
            return 1 << 13
        if cr == 0 and cj < 0:
            return -(1 << 13)
        if cj == 0 and cr > 0:
            return 0
        if cj == 0 and cr < 0:
            return 1 << 14
    x = cdiv(cj * (1 << ATAN_LUT_COEF), cr)
    x_abs = abs(x)
    if x_abs >= ATAN_LUT_SIZE:
        return (1 << 13) if cj > 0 else -(1 << 13)
    if x > 0:
        return lut[x] if cj > 0 else lut[x] - (1 << 14)
    else:
        return (1 << 14) - lut[-x] if cj > 0 else -lut[-x]


def esbensen(ar, aj, br, bj):
    """Atan-free discriminator (rtl_fm.c:566-582)."""
    scaled_pi = 2608
    dr = (br - ar) * 2
    dj = (bj - aj) * 2
    cj = bj * dr - br * dj
    return cdiv(scaled_pi * cj, ar * ar + aj * aj + 1)


def fm_demod(lowpassed, pre_r, pre_j, custom_atan):
    """Per-block FM discriminator loop (rtl_fm.c:584-615).

    Returns (result, (pre_r, pre_j)).  Sample 0 always uses the std atan2.
    """
    lp = [int(v) for v in lowpassed]
    n = len(lp)
    result = [i16(polar_discriminant(lp[0], lp[1], pre_r, pre_j))]
    disc = {0: polar_discriminant, 1: polar_disc_fast,
            2: polar_disc_lut, 3: esbensen}[custom_atan]
    for i in range(2, n - 1, 2):
        result.append(i16(disc(lp[i], lp[i + 1], lp[i - 2], lp[i - 1])))
    return result, (lp[n - 2], lp[n - 1])


def am_demod(lowpassed, output_scale):
    """Envelope detector (rtl_fm.c:617-632)."""
    out = []
    for i in range(0, len(lowpassed), 2):
        pcm = int(lowpassed[i]) ** 2 + int(lowpassed[i + 1]) ** 2
        out.append(i16(i16(ctrunc(math.sqrt(pcm))) * output_scale))
    return out


def usb_demod(lowpassed, output_scale):
    return [i16(i16(int(lowpassed[i]) + int(lowpassed[i + 1])) * output_scale)
            for i in range(0, len(lowpassed), 2)]


def lsb_demod(lowpassed, output_scale):
    return [i16(i16(int(lowpassed[i]) - int(lowpassed[i + 1])) * output_scale)
            for i in range(0, len(lowpassed), 2)]


def deemph_filter(result, deemph_a, avg=0):
    """One-pole de-emphasis IIR with symmetric rounding (rtl_fm.c:667-682).

    Returns (out, avg)."""
    out = []
    a = int(deemph_a)
    for v in result:
        d = int(v) - avg
        if d > 0:
            avg += cdiv(d + cdiv(a, 2), a)
        else:
            avg += cdiv(d - cdiv(a, 2), a)
        out.append(i16(avg))
    return out, avg


def dc_block_audio(result, dc_avg, block_const=9):
    """(rtl_fm.c:684-697).  Returns (out, dc_avg)."""
    s = sum(int(v) for v in result)
    avg = cdiv(s, len(result))
    avg = cdiv(avg + dc_avg * block_const, block_const + 1)
    return [i16(int(v) - avg) for v in result], avg


def dc_block_raw(buf, dc_avgI, dc_avgQ, block_const=9):
    """(rtl_fm.c:699-721).  Returns (out, dc_avgI, dc_avgQ)."""
    n2 = len(buf) // 2
    sI = sum(int(buf[i]) for i in range(0, len(buf), 2))
    sQ = sum(int(buf[i]) for i in range(1, len(buf), 2))
    avgI = cdiv(sI, n2)
    avgQ = cdiv(sQ, n2)
    avgI = cdiv(avgI + dc_avgI * block_const, block_const + 1)
    avgQ = cdiv(avgQ + dc_avgQ * block_const, block_const + 1)
    out = []
    for i in range(0, len(buf), 2):
        out += [i16(int(buf[i]) - avgI), i16(int(buf[i + 1]) - avgQ)]
    return out, avgI, avgQ


def rms(samples, step=1):
    """Squelch power estimator (rtl_fm.c:739-757)."""
    p = t = 0
    n = len(samples)
    for i in range(0, n, step):
        s = int(samples[i])
        t += s
        p += s * s
    dc = float(t * step) / n
    err = t * 2 * dc - dc * dc * n
    return int(math.sqrt((p - err) / n))


class DemodState:
    """Mutable oracle mirror of ``struct demod_state`` (rtl_fm.c:124-159)."""

    def __init__(self, downsample=1, downsample_passes=0, comp_fir_size=0,
                 custom_atan=0, mode="fm", post_downsample=1, deemph_a=0,
                 dc_block_audio_flag=False, squelch_level=0,
                 rate_out=24000, rate_out2=-1, output_scale=1):
        self.downsample = downsample
        self.downsample_passes = downsample_passes
        self.comp_fir_size = comp_fir_size
        self.custom_atan = custom_atan
        self.mode = mode
        self.post_downsample = post_downsample
        self.deemph_a = deemph_a
        self.dc_block_audio = dc_block_audio_flag
        self.squelch_level = squelch_level
        self.squelch_hits = 11
        self.rate_out = rate_out
        self.rate_out2 = rate_out2
        self.output_scale = output_scale
        # carried DSP state
        self.lp_i_hist = [[0] * 6 for _ in range(10)]
        self.lp_q_hist = [[0] * 6 for _ in range(10)]
        self.droop_i_hist = [0] * 9
        self.droop_q_hist = [0] * 9
        self.now_r = self.now_j = 0
        self.prev_index = 0
        self.pre_r = self.pre_j = 0
        self.deemph_avg = 0
        self.dc_avg = 0
        self.now_lpr = 0
        self.prev_lpr_index = 0


def full_demod(s: DemodState, lowpassed):
    """The per-buffer DSP driver (rtl_fm.c:759-824).

    Returns the result block (list of ints, final audio samples).
    """
    lp = [int(v) for v in lowpassed]
    if s.downsample_passes:
        for p in range(s.downsample_passes):
            ln = len(lp) >> p
            # I component over lp[0:ln], Q over lp[1:ln] (C pointer + len-1)
            di, s.lp_i_hist[p] = fifth_order_fm(lp[:ln], s.lp_i_hist[p])
            lp[:ln] = di
            dq, s.lp_q_hist[p] = _fifth_order_odd(lp, ln, s.lp_q_hist[p])
        lp = lp[: len(lp) >> s.downsample_passes]
        if s.comp_fir_size == 9 and s.downsample_passes <= 10:
            fir = CIC_9_TABLES[s.downsample_passes]
            di, s.droop_i_hist = generic_fir_fm(lp, fir, s.droop_i_hist)
            lp = di
            lp, s.droop_q_hist = _generic_fir_odd(lp, fir, s.droop_q_hist)
    else:
        lp, (s.now_r, s.now_j, s.prev_index) = low_pass(
            lp, s.downsample, s.now_r, s.now_j, s.prev_index)
    if s.squelch_level:
        sr = rms(lp, 1)
        if sr < s.squelch_level:
            s.squelch_hits += 1
            lp = [0] * len(lp)
        else:
            s.squelch_hits = 0
    if s.mode == "fm":
        result, (s.pre_r, s.pre_j) = fm_demod(lp, s.pre_r, s.pre_j, s.custom_atan)
    elif s.mode == "am":
        result = am_demod(lp, s.output_scale)
    elif s.mode == "usb":
        result = usb_demod(lp, s.output_scale)
    elif s.mode == "lsb":
        result = lsb_demod(lp, s.output_scale)
    elif s.mode == "raw":
        return lp
    else:
        raise ValueError(s.mode)
    if s.post_downsample > 1:
        result = low_pass_simple(result, s.post_downsample)
    if s.deemph_a:
        result, s.deemph_avg = deemph_filter(result, s.deemph_a, s.deemph_avg)
    if s.dc_block_audio:
        result, s.dc_avg = dc_block_audio(result, s.dc_avg)
    if s.rate_out2 > 0:
        result, (s.now_lpr, s.prev_lpr_index) = low_pass_real(
            result, s.rate_out, s.rate_out2, s.now_lpr, s.prev_lpr_index)
    return result


def _fifth_order_odd(lp, ln, hist):
    """fifth_order on the Q component: C calls it on (data+1, len-1)."""
    # build the odd-offset view of length ln-1
    view = lp[1:ln]
    out, h = fifth_order_fm(view, hist)
    lp[1:ln] = out
    return None, h


def _generic_fir_odd(lp, fir, hist):
    view = lp[1:]
    out, h = generic_fir_fm(view, fir, hist)
    return [lp[0]] + out, h


# ---------------------------------------------------------------------------
# rtl_power.c kernels
# ---------------------------------------------------------------------------

def fix_mpy(a, b):
    """Q14 multiply with round-half bit (rtl_power.c:256-262)."""
    c = (i16(a) * i16(b)) >> 14
    rnd = c & 0x01
    return i16((c >> 1) + rnd)


def sine_table(log2_n_wave):
    n_wave = 1 << log2_n_wave
    return [int(round(32767 * math.sin(i * 2.0 * math.pi / n_wave)))
            for i in range(n_wave * 3 // 4)]


def fix_fft(iq, m, sinewave=None, log2_n_wave=None):
    """In-place int16 radix-2 DIT FFT (rtl_power.c:264-320).

    ``iq``: interleaved int list, length 2*(1<<m).  Returns the transformed
    list.  Unconditional >>1 per stage => output scaled by 1/n.
    """
    if log2_n_wave is None:
        log2_n_wave = m
    if sinewave is None:
        sinewave = sine_table(log2_n_wave)
    n_wave = 1 << log2_n_wave
    buf = [i16(v) for v in iq]
    n = 1 << m
    if n > n_wave:
        raise ValueError("fft size exceeds sine table")
    # bit-reverse reorder
    mr = 0
    nn = n - 1
    for mm in range(1, nn + 1):
        ell = n
        while True:
            ell >>= 1
            if mr + ell <= nn:
                break
        mr = (mr & (ell - 1)) + ell
        if mr <= mm:
            continue
        buf[2 * mm], buf[2 * mr] = buf[2 * mr], buf[2 * mm]
        buf[2 * mm + 1], buf[2 * mr + 1] = buf[2 * mr + 1], buf[2 * mm + 1]
    ell = 1
    k = log2_n_wave - 1
    while ell < n:
        istep = ell << 1
        for mm in range(ell):
            j = mm << k
            wr = sinewave[j + n_wave // 4] >> 1
            wi = i16(-sinewave[j]) >> 1
            for i in range(mm, n, istep):
                j2 = i + ell
                tr = i16(fix_mpy(wr, buf[2 * j2]) - fix_mpy(wi, buf[2 * j2 + 1]))
                ti = i16(fix_mpy(wr, buf[2 * j2 + 1]) + fix_mpy(wi, buf[2 * j2]))
                qr = i16(buf[2 * i]) >> 1
                qi = i16(buf[2 * i + 1]) >> 1
                buf[2 * j2] = i16(qr - tr)
                buf[2 * j2 + 1] = i16(qi - ti)
                buf[2 * i] = i16(qr + tr)
                buf[2 * i + 1] = i16(qi + ti)
        k -= 1
        ell = istep
    return buf


def fifth_order_power(data):
    """Stateless 'ease-in' decimator, one component (rtl_power.c:582-607)."""
    d = [int(v) for v in data]
    length = len(d)
    a, b, c, dd, e, f = d[0], d[2], d[4], d[6], d[8], d[10]
    d[0] = i16(((a + b) * 10 + (c + dd) * 5 + dd + f) >> 4)
    d[2] = i16(((b + c) * 10 + (a + dd) * 5 + e + f) >> 4)
    d[4] = i16((a + (b + e) * 5 + (c + dd) * 10 + f) >> 4)
    i = 12
    while i < length:
        a, b = c, dd
        c, dd = e, f
        e = d[i - 2]
        f = d[i]
        d[i // 2] = i16((a + (b + e) * 5 + (c + dd) * 10 + f) >> 4)
        i += 4
    return d


def remove_dc(data):
    """Per-component DC removal — note the reference divides the component
    sum by the *interleaved* length (rtl_power.c:609-624), removing only
    half the DC; reproduced faithfully."""
    d = [int(v) for v in data]
    s = sum(d[i] for i in range(0, len(d), 2))
    ave = i16(cdiv(s, len(d)))
    if ave == 0:
        return d
    for i in range(0, len(d), 2):
        d[i] = i16(d[i] - ave)
    return d


def generic_fir_power(data, fir):
    """Local-history droop FIR: first 18 interleaved samples pass
    unfiltered (rtl_power.c:626-654)."""
    d = [int(v) for v in data]
    t = [0] + list(fir)
    hist = [d[k] for k in range(0, 18, 2)]
    for idx in range(18, len(d), 2):
        temp = d[idx]
        sacc = 0
        sacc += (hist[0] + hist[8]) * t[1]
        sacc += (hist[1] + hist[7]) * t[2]
        sacc += (hist[2] + hist[6]) * t[3]
        sacc += (hist[3] + hist[5]) * t[4]
        sacc += hist[4] * t[5]
        d[idx] = i16(sacc >> 15)
        hist = hist[1:] + [temp]
    return d


def boxcar_decim_power(buf, ds):
    """scanner's in-place boxcar accumulate (rtl_power.c:723-733)."""
    b = [int(v) for v in buf]
    j, j2 = 2, 0
    while j < len(b):
        b[j2] = i16(b[j2] + b[j])
        b[j2 + 1] = i16(b[j2 + 1] + b[j + 1])
        b[j] = 0
        b[j + 1] = 0
        j += 2
        if j % (ds * 2) == 0:
            j2 += 2
    return b


def window_coefs_int(window_fn, length):
    """(int)(256 * w(i, N)) (rtl_power.c:1034-1037)."""
    return [ctrunc(256 * window_fn(i, length)) for i in range(length)]


def scanner_segment(buf16, bin_e, window_coefs, ds=1, ds_p=0, boxcar=True,
                    comp_fir_size=0, peak_hold=False, avg=None, samples=0,
                    sinewave=None):
    """One hop's post-read processing (rtl_power.c:714-770).

    ``buf16``: interleaved ints, length 2*bin_len*ds (or more).
    Returns (avg, samples).
    """
    bin_len = 1 << bin_e
    fft_buf = [i16(v) for v in buf16]
    buf_len = len(fft_buf)
    if avg is None:
        avg = [0] * bin_len
    if boxcar and ds > 1:
        fft_buf = boxcar_decim_power(fft_buf, ds)
    elif ds_p:
        for j in range(ds_p):
            ln = buf_len >> j
            seg = fifth_order_power(fft_buf[:ln])
            fft_buf[:ln] = seg
            odd = fifth_order_power(fft_buf[1:ln])
            fft_buf[1:ln] = odd
        if comp_fir_size == 9 and ds_p <= 10:
            ln = buf_len >> ds_p
            fir = CIC_9_TABLES[ds_p]
            fft_buf[:ln] = generic_fir_power(fft_buf[:ln], fir)
            fft_buf[1:ln] = generic_fir_power(fft_buf[1:ln], fir)
    eff = buf_len // ds
    fft_buf[:eff] = remove_dc(fft_buf[:eff])
    fft_buf[1:eff] = remove_dc(fft_buf[1:eff])
    if sinewave is None:
        sinewave = sine_table(bin_e)
    for offset in range(0, eff, 2 * bin_len):
        seg = fft_buf[offset: offset + 2 * bin_len]
        for j in range(bin_len):
            seg[2 * j] = i16(int(seg[2 * j]) * int(window_coefs[j]))
            seg[2 * j + 1] = i16(int(seg[2 * j + 1]) * int(window_coefs[j]))
        seg = fix_fft(seg, bin_e, sinewave, bin_e)
        for j in range(bin_len):
            p = int(seg[2 * j]) ** 2 + int(seg[2 * j + 1]) ** 2
            if peak_hold:
                avg[j] = max(avg[j], p)
            else:
                avg[j] += p
        samples += ds
    return avg, samples


def rms_power(buf16, avg0=0, samples=0, peak_hold=False):
    """Giant-bin total power (rtl_power.c:403-429).  Returns (avg0, samples)."""
    p = t = 0
    n = len(buf16)
    for v in buf16:
        s = int(v)
        t += s
        p += s * s
    dc = float(t) / n
    err = t * 2 * dc - dc * dc * n
    p -= int(round(err))
    if peak_hold:
        avg0 = max(avg0, p)
    else:
        avg0 += p
    return avg0, samples + 1


def csv_dbm(avg, bin_e, rate, samples, crop, freq, downsample):
    """Output math of csv_dbm (rtl_power.c:774-817).

    Returns (freq_low, freq_high, hz_step, samples, [dbm...]) with the
    DC-nuke/fftshift/crop/trailing-duplicate quirks applied.
    """
    ln = 1 << bin_e
    a = [int(v) for v in avg]
    if bin_e > 0:
        a[0] = a[1]
        a = a[ln // 2:] + a[: ln // 2]
    bin_count = int(ln * (1.0 - crop))
    bw2 = int((rate * bin_count) / (ln * 2 * downsample))
    hz_step = rate / float(ln * downsample)
    i1 = 0 + int(ln * crop * 0.5)
    i2 = (ln - 1) - int(ln * crop * 0.5)
    dbms = []
    for i in range(i1, i2 + 1):
        dbm = float(a[i]) / rate / samples
        dbms.append(10 * math.log10(dbm) if dbm > 0 else float("-inf"))
    dbm = float(a[i2]) / (rate * samples)
    if bin_e == 0:
        dbm = float(a[0]) / (rate * samples)
    dbms.append(10 * math.log10(dbm) if dbm > 0 else float("-inf"))
    return freq - bw2, freq + bw2, hz_step, samples, dbms
