"""rtl_tcp network source vs an in-process mock server: header handshake,
command wire format, CU8->CS16 conversion, EOF semantics."""

import socket
import struct
import threading

import numpy as np
import pytest

from rx_tools_tpu.iq import formats, rtltcp
from rx_tools_tpu.iq.sources import make_source


class MockRtlTcpServer:
    """Speaks the server side of the rtl_tcp protocol: sends the 12-byte
    header, streams ``payload``, records every 5-byte command received."""

    def __init__(self, payload: bytes, tuner_type=5, gain_count=29):
        self.payload = payload
        self.header = rtltcp.MAGIC + struct.pack(">II", tuner_type, gain_count)
        self.commands: list[tuple[int, int]] = []
        self._lsock = socket.socket()
        self._lsock.bind(("127.0.0.1", 0))
        self._lsock.listen(1)
        self.port = self._lsock.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        conn, _ = self._lsock.accept()
        conn.settimeout(5.0)
        try:
            conn.sendall(self.header)
            conn.sendall(self.payload)
            conn.shutdown(socket.SHUT_WR)       # EOF on the data plane
            buf = b""
            while True:                          # drain commands until close
                try:
                    chunk = conn.recv(4096)
                except socket.timeout:
                    break
                if not chunk:
                    break
                buf += chunk
                while len(buf) >= 5:
                    op, arg = struct.unpack(">BI", buf[:5])
                    self.commands.append((op, arg))
                    buf = buf[5:]
        finally:
            conn.close()
            self._lsock.close()

    def join(self):
        self._thread.join(timeout=5.0)


def test_handshake_stream_and_eof():
    rng = np.random.default_rng(0)
    cu8 = rng.integers(0, 256, 2 * 300, dtype=np.uint8)
    srv = MockRtlTcpServer(cu8.tobytes())

    src = make_source(f"rtltcp=127.0.0.1:{srv.port}")
    assert src.driver == "rtltcp"
    assert src.tuner_type == 5 and src.tuner_gain_count == 29

    n1, b1 = src.read_stream(128)
    assert n1 == 128 and b1.dtype == np.int16 and b1.shape == (256,)
    n2, b2 = src.read_stream(512)            # more than remains -> short read
    assert n2 == 300 - 128
    n3, _ = src.read_stream(16)
    assert n3 == 0                           # server EOF

    got = np.concatenate([b1, b2])
    want = formats.convert(cu8, "CU8", "CS16")
    np.testing.assert_array_equal(got, np.asarray(want, np.int16))
    src.close()
    srv.join()


def test_command_wire_format():
    srv = MockRtlTcpServer(b"")
    src = make_source({"driver": "rtltcp", "host": "127.0.0.1",
                       "port": str(srv.port)})
    src.set_frequency(100_300_000)
    src.set_sample_rate(2_400_000)
    src.set_gain(49.6)                       # dB -> tenths, manual mode first
    src.set_frequency_correction(-12)        # negative ppm wraps to u32
    src.write_setting("direct_samp", "2")
    src.write_setting("offset_tune", "true")
    src.write_setting("agc", "1")
    src.write_setting("biastee", "1")
    src.close()
    srv.join()

    assert srv.commands == [
        (rtltcp.CMD_SET_FREQ, 100_300_000),
        (rtltcp.CMD_SET_SAMPLE_RATE, 2_400_000),
        (rtltcp.CMD_SET_GAIN_MODE, 1),
        (rtltcp.CMD_SET_GAIN, 496),
        (rtltcp.CMD_SET_FREQ_CORRECTION, (-12) & 0xFFFFFFFF),
        (rtltcp.CMD_SET_DIRECT_SAMPLING, 2),
        (rtltcp.CMD_SET_OFFSET_TUNING, 1),
        (rtltcp.CMD_SET_AGC_MODE, 1),
        (rtltcp.CMD_SET_BIAS_TEE, 1),
    ]


def test_rx_sdr_records_from_rtltcp(tmp_path, monkeypatch):
    """E2E: the rx_sdr CLI captures from a remote rtl_tcp server."""
    monkeypatch.setenv("RX_PLATFORM", "cpu")
    from rx_tools_tpu.apps import rx_sdr

    rng = np.random.default_rng(2)
    cu8 = rng.integers(0, 256, 2 * 8192, dtype=np.uint8)
    srv = MockRtlTcpServer(cu8.tobytes())
    out = tmp_path / "cap.cs16"
    rc = rx_sdr.main(["-d", f"rtltcp=127.0.0.1:{srv.port}", "-f", "100M",
                      "-s", "2048k", "-n", "4096", "-F", "CS16", str(out)])
    srv.join()
    assert rc == 0
    got = np.frombuffer(out.read_bytes(), np.int16)
    want = np.asarray(formats.convert(cu8[: 2 * 4096], "CU8", "CS16"),
                      np.int16)
    np.testing.assert_array_equal(got, want)
    # the CLI's -f/-s flags must have reached the server as protocol commands
    assert (rtltcp.CMD_SET_FREQ, 100_000_000) in srv.commands
    assert (rtltcp.CMD_SET_SAMPLE_RATE, 2_048_000) in srv.commands
    # auto gain (no -g) applies the reference's RTLSDR 40 dB quirk
    # (verbose_auto_gain, convenience.c:253-262)
    assert (rtltcp.CMD_SET_GAIN_MODE, 1) in srv.commands
    assert (rtltcp.CMD_SET_GAIN, 400) in srv.commands


def test_bad_magic_rejected():
    lsock = socket.socket()
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]

    def serve():
        conn, _ = lsock.accept()
        conn.sendall(b"HTTP/1.1 400\r\n")
        conn.close()
        lsock.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    with pytest.raises(ConnectionError, match="not an rtl_tcp server"):
        rtltcp.RtlTcpSource({"rtltcp": f"127.0.0.1:{port}"})
    t.join(timeout=5.0)


def test_set_gain_mode_uses_agc_opcode():
    """rx_fm -E rtlagc over rtl_tcp: set_gain_mode sends the native
    CMD_SET_AGC_MODE opcode (round-3 verdict: the old digital_agc setting
    write was dropped with an 'ignoring unsupported setting' log while the
    CLI claimed success)."""
    srv = MockRtlTcpServer(b"")
    src = make_source({"driver": "rtltcp", "host": "127.0.0.1",
                       "port": str(srv.port)})
    assert src.set_gain_mode(True) == 0
    assert src.set_gain_mode(False) == 0
    src.close()
    srv.join()
    assert srv.commands == [(rtltcp.CMD_SET_AGC_MODE, 1),
                            (rtltcp.CMD_SET_AGC_MODE, 0)]
