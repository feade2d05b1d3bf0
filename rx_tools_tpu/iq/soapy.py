"""Real-hardware source: SoapySDR via ctypes (no compiled extension).

The reference's only hardware path is the SoapySDR C API
(``src/convenience/convenience.c:469-513``, stream I/O
``src/rtl_fm.c:870-899``).  This module binds the same C API with ctypes
so any SoapySDR-supported radio feeds the TPU pipelines — completing the
``-d driver=rtlsdr`` / ``driver=hackrf`` surface of the reference CLIs.

Gated: :func:`available` is False when ``libSoapySDR.so`` is absent (as on
TPU pod images); ``make_source`` then reports a clear error for
``driver=`` queries.  The binding uses the modern (0.8+) C API and always
requests CS16 — the wire format the reference requests
(``rtl_fm.c:1395``, ``rtl_power.c:975``).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

from rx_tools_tpu.iq.sources import Source, ERR_OVERFLOW, ERR_TIMEOUT
from rx_tools_tpu.utils.logging import log

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    name = ctypes.util.find_library("SoapySDR")
    for cand in ([name] if name else []) + ["libSoapySDR.so", "libSoapySDR.so.0.8"]:
        try:
            _LIB = ctypes.CDLL(cand)
            break
        except OSError:
            continue
    if _LIB is not None:
        _bind(_LIB)
    return _LIB


def _bind(lib):
    p = ctypes.c_void_p
    lib.SoapySDRDevice_makeStrArgs.argtypes = [ctypes.c_char_p]
    lib.SoapySDRDevice_makeStrArgs.restype = p
    lib.SoapySDRDevice_unmake.argtypes = [p]
    for name, args in [
        ("SoapySDRDevice_setSampleRate", [p, ctypes.c_int, ctypes.c_size_t,
                                          ctypes.c_double]),
        ("SoapySDRDevice_setFrequency", [p, ctypes.c_int, ctypes.c_size_t,
                                         ctypes.c_double, p]),
        ("SoapySDRDevice_setBandwidth", [p, ctypes.c_int, ctypes.c_size_t,
                                         ctypes.c_double]),
        ("SoapySDRDevice_setGain", [p, ctypes.c_int, ctypes.c_size_t,
                                    ctypes.c_double]),
        ("SoapySDRDevice_setGainElement", [p, ctypes.c_int, ctypes.c_size_t,
                                           ctypes.c_char_p, ctypes.c_double]),
        ("SoapySDRDevice_setGainMode", [p, ctypes.c_int, ctypes.c_size_t,
                                        ctypes.c_bool]),
        ("SoapySDRDevice_setAntenna", [p, ctypes.c_int, ctypes.c_size_t,
                                       ctypes.c_char_p]),
        ("SoapySDRDevice_setFrequencyCorrection", [p, ctypes.c_int,
                                                   ctypes.c_size_t,
                                                   ctypes.c_double]),
        ("SoapySDRDevice_writeSetting", [p, ctypes.c_char_p, ctypes.c_char_p]),
        ("SoapySDRDevice_activateStream", [p, p, ctypes.c_int,
                                           ctypes.c_longlong, ctypes.c_size_t]),
        ("SoapySDRDevice_deactivateStream", [p, p, ctypes.c_int,
                                             ctypes.c_longlong]),
        ("SoapySDRDevice_closeStream", [p, p]),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = args
        fn.restype = ctypes.c_int
    lib.SoapySDRDevice_getFrequency.argtypes = [p, ctypes.c_int, ctypes.c_size_t]
    lib.SoapySDRDevice_getFrequency.restype = ctypes.c_double
    lib.SoapySDRDevice_setupStream.argtypes = [
        p, ctypes.c_int, ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_size_t, p]
    lib.SoapySDRDevice_setupStream.restype = p
    lib.SoapySDRDevice_readStream.argtypes = [
        p, p, ctypes.POINTER(p), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_long]
    lib.SoapySDRDevice_readStream.restype = ctypes.c_int


def available() -> bool:
    return _load() is not None


_SOAPY_SDR_RX = 1


class SoapySource(Source):
    """A SoapySDR device as a block source (CS16 wire format)."""

    driver = "soapy"

    def __init__(self, query: str, channel: int = 0):
        super().__init__()
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "SoapySDR library not found; hardware sources need "
                "libSoapySDR installed (file=/synth= sources work without it)")
        self._lib = lib
        self._dev = lib.SoapySDRDevice_makeStrArgs(query.encode())
        if not self._dev:
            raise RuntimeError(f"SoapySDRDevice_makeStrArgs failed for {query!r}")
        self.channel = channel
        self.hardware = query
        chan = ctypes.c_size_t(channel)
        self._stream = lib.SoapySDRDevice_setupStream(
            self._dev, _SOAPY_SDR_RX, b"CS16", ctypes.byref(chan), 1, None)
        if not self._stream:
            raise RuntimeError("setupStream(CS16) failed")

    # -- configuration -----------------------------------------------------
    def set_sample_rate(self, rate):
        super().set_sample_rate(rate)
        return self._lib.SoapySDRDevice_setSampleRate(
            self._dev, _SOAPY_SDR_RX, self.channel, float(rate))

    def set_frequency(self, freq):
        super().set_frequency(freq)
        return self._lib.SoapySDRDevice_setFrequency(
            self._dev, _SOAPY_SDR_RX, self.channel, float(freq), None)

    def get_frequency(self):
        return self._lib.SoapySDRDevice_getFrequency(
            self._dev, _SOAPY_SDR_RX, self.channel)

    def set_bandwidth(self, bw):
        super().set_bandwidth(bw)
        return self._lib.SoapySDRDevice_setBandwidth(
            self._dev, _SOAPY_SDR_RX, self.channel, float(bw))

    def set_gain(self, value):
        super().set_gain(value)
        return self._lib.SoapySDRDevice_setGain(
            self._dev, _SOAPY_SDR_RX, self.channel, float(value))

    def set_gain_element(self, name, value):
        super().set_gain_element(name, value)
        return self._lib.SoapySDRDevice_setGainElement(
            self._dev, _SOAPY_SDR_RX, self.channel, name.encode(), float(value))

    def set_antenna(self, name):
        super().set_antenna(name)
        return self._lib.SoapySDRDevice_setAntenna(
            self._dev, _SOAPY_SDR_RX, self.channel, name.encode())

    def set_frequency_correction(self, ppm):
        super().set_frequency_correction(ppm)
        return self._lib.SoapySDRDevice_setFrequencyCorrection(
            self._dev, _SOAPY_SDR_RX, self.channel, float(ppm))

    def write_setting(self, key, value):
        super().write_setting(key, value)
        return self._lib.SoapySDRDevice_writeSetting(
            self._dev, key.encode(), value.encode())

    # -- streaming ---------------------------------------------------------
    def activate(self):
        self._lib.SoapySDRDevice_activateStream(self._dev, self._stream, 0, 0, 0)

    def deactivate(self):
        self._lib.SoapySDRDevice_deactivateStream(self._dev, self._stream, 0, 0)

    def read_stream(self, n_elems):
        buf = np.empty(2 * n_elems, np.int16)
        bufp = ctypes.c_void_p(buf.ctypes.data)
        flags = ctypes.c_int(0)
        time_ns = ctypes.c_longlong(0)
        r = self._lib.SoapySDRDevice_readStream(
            self._dev, self._stream, ctypes.byref(bufp), n_elems,
            ctypes.byref(flags), ctypes.byref(time_ns), 1_000_000)
        if r < 0:
            # SOAPY_SDR_OVERFLOW == -4, TIMEOUT == -1: same codes as ours
            return (ERR_OVERFLOW if r == -4 else ERR_TIMEOUT), buf[:0]
        return r, buf[: 2 * r]

    def close(self):
        if getattr(self, "_stream", None):
            self._lib.SoapySDRDevice_closeStream(self._dev, self._stream)
            self._stream = None
        if getattr(self, "_dev", None):
            self._lib.SoapySDRDevice_unmake(self._dev)
            self._dev = None
