"""Frame-v2 wire format and PHY modem round-trip tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ria_tpu.phy import (
    ControlFrame, DataFrame, ConnectFrame, FrameType, MCDPSKModem,
    crc16, hash_callsign, make_fixed_data_frame,
    encode_fixed_frame, decode_fixed_frame,
)
from ria_tpu.phy.frame_v2 import encode_snr, decode_snr, encode_fading_index, decode_fading_index
from ria_tpu.sim import apply_channel, awgn
from ria_tpu.wave.mc_dpsk import MCDPSKConfig


def test_crc16_ccitt_check_value():
    # Standard CRC-16/CCITT-FALSE check value for "123456789" is 0x29B1.
    assert crc16(b"123456789") == 0x29B1


def test_hash_callsign_is_24bit_and_case_insensitive():
    h1 = hash_callsign("W1AW")
    h2 = hash_callsign("w1aw")
    assert h1 == h2
    assert 0 <= h1 <= 0xFFFFFF


def test_control_frame_roundtrip():
    f = ControlFrame.make_nack("W1AW", hash_callsign("VE3ABC"), seq=7, cw_bitmap=0b1010)
    data = f.serialize()
    assert len(data) == 20
    g = ControlFrame.deserialize(data)
    assert g is not None
    assert g.type == FrameType.NACK and g.seq == 7
    assert g.src_hash == hash_callsign("W1AW")
    # corrupting any byte must fail CRC
    bad = bytearray(data)
    bad[5] ^= 0xFF
    assert ControlFrame.deserialize(bytes(bad)) is None


def test_data_frame_roundtrip():
    f = DataFrame.make_data("W1AW", "VE3ABC", 3, b"hello hf world")
    f.total_cw = 2
    data = f.serialize()
    g = DataFrame.deserialize(data)
    assert g is not None
    assert g.payload == b"hello hf world"
    assert g.total_cw == 2


def test_connect_frame_roundtrip():
    f = ConnectFrame(type=FrameType.CONNECT, seq=1, src_callsign="W1AW",
                     dst_callsign="VE3ABC", mode_capabilities=0x3F)
    g = ConnectFrame.deserialize(f.serialize())
    assert g is not None
    assert g.src_callsign == "W1AW" and g.dst_callsign == "VE3ABC"
    assert g.mode_capabilities == 0x3F


def test_snr_fading_encodings():
    assert abs(decode_snr(encode_snr(12.3)) - 12.25) < 0.26
    assert abs(decode_fading_index(encode_fading_index(0.62)) - 0.62) < 0.011
    assert decode_fading_index(0) == -1.0


def test_fixed_frame_encode_decode():
    f = make_fixed_data_frame("W1AW", "VE3ABC", 5, b"fixed frame payload", "R1_4")
    raw = f.serialize()
    bits = encode_fixed_frame(raw, "R1_4")
    assert bits.shape == (2592,)
    soft = np.where(bits > 0, -6.0, 6.0).astype(np.float32)
    oks, frame_bytes = decode_fixed_frame(soft, "R1_4")
    assert oks.all()
    g = DataFrame.deserialize(frame_bytes)
    assert g is not None
    assert g.payload.rstrip(b"\x00") == b"fixed frame payload"


@pytest.mark.parametrize("payload_len,rate", [(10, "R1_4"), (60, "R1_4"), (40, "R1_2")])
def test_modem_frame_roundtrip_awgn(payload_len, rate):
    """Full PHY path: frame -> audio -> AWGN -> sync -> CW0 peek -> decode."""
    modem = MCDPSKModem(MCDPSKConfig(bits_per_symbol=1), rate=rate)
    payload = bytes(range(payload_len))
    frame = DataFrame.make_data("W1AW", "VE3ABC", 9, payload)
    frame.total_cw = 0  # let TX patch it
    tx = modem.tx_frame(frame.serialize())
    audio = np.concatenate([np.zeros(4000, np.float32), tx, np.zeros(6000, np.float32)])
    out = np.asarray(apply_channel(jnp.asarray(audio), jax.random.PRNGKey(0), awgn(8.0)).samples)
    rx = modem.rx_frame(out)
    assert rx.ok, f"decode failed: header={rx.header} cw_ok={rx.cw_ok}"
    g = DataFrame.deserialize(rx.frame_bytes)
    assert g is not None
    assert g.payload == payload
    assert g.seq == 9


def test_modem_control_frame_roundtrip():
    modem = MCDPSKModem(MCDPSKConfig(bits_per_symbol=1), rate="R1_4")
    f = ControlFrame.make_ack("W1AW", hash_callsign("VE3ABC"), seq=42)
    tx = modem.tx_frame(f.serialize())
    audio = np.concatenate([np.zeros(2000, np.float32), tx, np.zeros(4000, np.float32)])
    out = np.asarray(apply_channel(jnp.asarray(audio), jax.random.PRNGKey(1), awgn(5.0)).samples)
    rx = modem.rx_frame(out)
    assert rx.ok
    g = ControlFrame.deserialize(rx.frame_bytes)
    assert g is not None and g.type == FrameType.ACK and g.seq == 42


def test_legacy_v1_frame_roundtrip():
    from ria_tpu.phy.legacy_v1 import V1FrameType, build_frame, parse_frame, V1ARQ

    f = build_frame(V1FrameType.DATA, 7, b"legacy payload")
    g = parse_frame(f)
    assert g is not None and g.seq == 7 and g.payload == b"legacy payload"
    bad = bytearray(f)
    bad[10] ^= 0xFF
    assert parse_frame(bytes(bad)) is None

    a, b = V1ARQ(), V1ARQ()
    a.on_transmit = lambda fr: b.on_frame(fr)
    b.on_transmit = lambda fr: a.on_frame(fr)
    got = []
    b.on_data = lambda p: got.append(p)
    assert a.send(b"v1 hello")
    assert got == [b"v1 hello"]
    assert a._pending is None  # acked
