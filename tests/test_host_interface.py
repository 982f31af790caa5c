"""TCP host interface tests: command port, data port, KISS framing."""

import socket
import time

import pytest

from ria_tpu.protocol.engine import ProtocolEngine
from ria_tpu.runtime.host_interface import HostInterface, kiss_escape, kiss_unescape


@pytest.fixture(params=["python", "native"])
def iface(request):
    if request.param == "native":
        from ria_tpu.runtime.native import available

        if not available():
            pytest.skip("native library unavailable")
    engine = ProtocolEngine()
    hi = HostInterface(engine, command_port=0, data_port=0, kiss_port=0,
                       backend=request.param)
    yield hi
    hi.close()


def _cmd(iface, line: str) -> str:
    s = socket.create_connection(("127.0.0.1", iface.cmd_srv.port), timeout=2)
    s.sendall((line + "\r").encode())
    deadline = time.time() + 2
    buf = b""
    s.settimeout(0.05)
    while time.time() < deadline and b"\r\n" not in buf:
        iface.poll(0.05)
        try:
            buf += s.recv(4096)
        except (TimeoutError, socket.timeout):
            pass
    s.close()
    # Async events (CONNECTED/DISCONNECTED) may precede the reply line.
    lines = [l for l in buf.decode().split("\r\n") if l]
    return lines[-1] if lines else ""


def test_version_and_state(iface):
    assert _cmd(iface, "VERSION").startswith("VERSION ria_tpu")
    assert _cmd(iface, "STATE") == "STATE DISCONNECTED"


def test_mycall_and_connect_flow(iface):
    assert _cmd(iface, "MYCALL w1aw") == "OK"
    assert iface.engine.conn.local_call == "W1AW"
    assert _cmd(iface, "CONNECT VE3ABC") == "PENDING"
    assert _cmd(iface, "ABORT") == "OK"
    assert _cmd(iface, "DISCONNECT") == "OK"


def test_config_commands(iface):
    assert _cmd(iface, "COMPRESSION OFF") == "OK"
    assert not iface.engine.compression_enabled
    assert _cmd(iface, "ENCRYPTKEY secret words") == "OK"
    assert iface.engine.encryption_enabled
    assert _cmd(iface, "WAVEFORM MC_DPSK") == "OK"
    assert _cmd(iface, "CODERATE R1_2") == "OK"
    assert iface.engine.conn.config.forced_rate == "R1_2"
    assert _cmd(iface, "BOGUS") .startswith("ERROR")


def test_kiss_framing_roundtrip():
    payload = bytes([1, 2, 0xC0, 3, 0xDB, 4])
    wire = kiss_escape(payload)
    assert wire[0] == 0xC0 and wire[-1] == 0xC0
    buf = bytearray(wire)
    frames = kiss_unescape(buf)
    assert frames == [payload]


def test_dual_modem_tcp_session():
    """Two full stacks (Station+Engine+HostInterface) cross-wired through
    simulated air, driven purely over TCP (reference test_dual_modem_tcp.sh):
    MYCALL/CONNECT on the command ports, payload through the data ports."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from tools.dual_modem_tcp import DualModemTcp, self_test
    from ria_tpu.sim import awgn

    dm = DualModemTcp(awgn(15.0), seed=42)
    try:
        assert self_test(dm) == 0
    finally:
        dm.close()


def test_cq_rawtx_ptt_cat_commands(iface):
    """Reference command set parity: CQ, RAWTX, PTT/PTTSTATE, CAT* commands
    (command_parser.hpp:21-83)."""
    assert _cmd(iface, "MYCALL W1AW") == "OK"
    assert _cmd(iface, "CQ hello") == "OK"
    assert _cmd(iface, "PTTSTATE").startswith("PTT ")
    # RAWTX without a station attached reports the error cleanly.
    assert _cmd(iface, "RAWTX MC_DPSK DBPSK R1_4 hi") == "ERROR No modem attached"
    assert _cmd(iface, "CATPTT ON") == "ERROR CAT not connected"
    assert _cmd(iface, "CATCONNECT") == "OK"
    assert _cmd(iface, "CATPTT ON") == "OK"
    assert _cmd(iface, "CATDISCONNECT") == "OK"
