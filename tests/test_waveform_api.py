"""Waveform abstraction tests: one TX->channel->RX pass per waveform/preamble
(reference tools/test_waveform_simple.cpp tier)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ria_tpu.phy import ControlFrame, DataFrame, FrameType, hash_callsign, make_fixed_data_frame
from ria_tpu.phy.frame_v2 import WaveformMode
from ria_tpu.sim import apply_channel, awgn, good
from ria_tpu.wave.api import create_waveform
from ria_tpu.wave.selection import recommend_waveform_and_rate, recommend_data_mode


def _through_channel(tx, snr_db, seed=0, channel=None, lead=3000, tail=4000):
    audio = np.concatenate([np.zeros(lead, np.float32), tx, np.zeros(tail, np.float32)])
    ch = channel or awgn(snr_db)
    return np.asarray(apply_channel(jnp.asarray(audio), jax.random.PRNGKey(seed), ch).samples)


@pytest.mark.parametrize("mode,mod,rate,snr,light", [
    (WaveformMode.MC_DPSK, "DBPSK", "R1_4", 0.0, False),
    (WaveformMode.MC_DPSK, "DBPSK", "R1_4", 5.0, True),
    (WaveformMode.OFDM_CHIRP, "DQPSK", "R1_2", 15.0, False),
    (WaveformMode.OFDM_CHIRP, "DQPSK", "R1_2", 15.0, True),
    (WaveformMode.OFDM_COX, "QPSK", "R1_2", 20.0, False),
    (WaveformMode.OFDM_COX, "QAM16", "R1_2", 20.0, False),
])
def test_data_frame_roundtrip(mode, mod, rate, snr, light):
    wf = create_waveform(mode, mod, rate)
    payload = b"The quick brown fox jumps over the lazy dog"
    if mode == WaveformMode.MC_DPSK:
        frame = DataFrame.make_data("W1AW", "VE3ABC", 3, payload)
    else:
        frame = make_fixed_data_frame("W1AW", "VE3ABC", 3, payload, rate)
    tx = wf.tx_frame(frame.serialize(), light=light)
    out = _through_channel(tx, snr)
    rx = wf.rx_frame(out, light=light)
    assert rx.ok, f"{mode.name} {mod} {rate} light={light} failed"
    g = DataFrame.deserialize(rx.frame_bytes)
    assert g is not None
    assert g.payload.rstrip(b"\x00")[: len(payload)] == payload
    assert g.seq == 3


@pytest.mark.parametrize("mode", [WaveformMode.MC_DPSK, WaveformMode.OFDM_CHIRP,
                                  WaveformMode.OFDM_COX])
def test_control_frame_roundtrip(mode):
    wf = create_waveform(mode)
    f = ControlFrame.make_ack("W1AW", hash_callsign("VE3ABC"), seq=99)
    light = mode == WaveformMode.MC_DPSK  # connected-mode ACKs ride ZC preamble
    tx = wf.tx_frame(f.serialize(), light=light)
    out = _through_channel(tx, 10.0, seed=2)
    rx = wf.rx_frame(out, light=light)
    assert rx.ok, f"{mode.name} control decode failed"
    g = ControlFrame.deserialize(rx.frame_bytes)
    assert g is not None and g.type == FrameType.ACK and g.seq == 99


def test_selection_tables():
    r = recommend_waveform_and_rate(-10.0, 0.1)
    assert r.waveform == WaveformMode.MC_DPSK and r.spreading == 4
    r = recommend_waveform_and_rate(-5.0, 0.1)
    assert r.spreading == 2
    r = recommend_waveform_and_rate(0.0, 0.1)
    assert r.modulation == "DBPSK" and r.spreading == 1
    r = recommend_waveform_and_rate(7.0, 0.1)
    assert r.modulation == "DQPSK" and r.waveform == WaveformMode.MC_DPSK
    r = recommend_waveform_and_rate(26.0, 0.05)
    assert r.modulation == "QAM64" and r.rate == "R3_4"
    r = recommend_waveform_and_rate(16.0, 0.5)
    assert r.waveform == WaveformMode.OFDM_CHIRP and r.modulation == "DQPSK"
    assert r.rate == "R1_2"
    mod, rate, spread = recommend_data_mode(-9.0, WaveformMode.MC_DPSK)
    assert (mod, rate, spread) == ("DBPSK", "R1_4", 4)


def test_ofdm_chirp_fading():
    wf = create_waveform(WaveformMode.OFDM_CHIRP, "DQPSK", "R1_4")
    payload = bytes(range(61))
    frame = make_fixed_data_frame("W1AW", "VE3ABC", 1, payload, "R1_4")
    tx = wf.tx_frame(frame.serialize())
    out = _through_channel(tx, 16.0, seed=5, channel=good(16.0))
    rx = wf.rx_frame(out)
    assert rx.ok
    g = DataFrame.deserialize(rx.frame_bytes)
    assert g.payload[: len(payload)] == payload


def test_ofdm_burst_interleave_roundtrip():
    """4-frame burst: one preamble, coded bytes spread across frames."""
    wf = create_waveform(WaveformMode.OFDM_CHIRP, "DQPSK", "R1_2")
    frames = []
    for i in range(4):
        f = make_fixed_data_frame("W1AW", "VE3ABC", i, f"burst frame {i}".encode(), "R1_2")
        frames.append(f.serialize())
    tx = wf.tx_burst(frames)
    out = _through_channel(tx, 15.0, seed=8)
    res = wf.rx_burst(out, group=4)
    assert res is not None
    res, _snr, _fading = res
    assert all(ok for ok, _ in res), [ok for ok, _ in res]
    for i, (ok, fb) in enumerate(res):
        g = DataFrame.deserialize(fb)
        assert g is not None and g.seq == i
        assert g.payload.rstrip(b"\x00") == f"burst frame {i}".encode()


def test_otfs_waveform_frame_roundtrip():
    wf = create_waveform(WaveformMode.OTFS_EQ, "QPSK", "R1_4")
    f = ControlFrame.make_ack("W1AW", hash_callsign("VE3ABC"), seq=5)
    tx = wf.tx_frame(f.serialize())
    out = _through_channel(tx, 18.0, seed=12)
    rx = wf.rx_frame(out)
    assert rx.ok
    g = ControlFrame.deserialize(rx.frame_bytes)
    assert g is not None and g.seq == 5


def test_otfs_waveform_data_frame():
    wf = create_waveform(WaveformMode.OTFS_EQ, "QPSK", "R1_4")
    frame = DataFrame.make_data("W1AW", "VE3ABC", 2, b"otfs data frame payload")
    frame.total_cw = 2
    tx = wf.tx_frame(frame.serialize())
    out = _through_channel(tx, 18.0, seed=13)
    rx = wf.rx_frame(out)
    assert rx.ok
    g = DataFrame.deserialize(rx.frame_bytes)
    assert g.payload == b"otfs data frame payload"


def test_mfsk_waveform_control_frame_low_snr():
    wf = create_waveform(WaveformMode.MFSK)
    f = ControlFrame.make_ack("W1AW", hash_callsign("VE3ABC"), seq=7)
    tx = wf.tx_frame(f.serialize())
    out = _through_channel(tx, -2.0, seed=14, lead=6000, tail=6000)
    rx = wf.rx_frame(out)
    assert rx.ok, f"MFSK control decode failed"
    g = ControlFrame.deserialize(rx.frame_bytes)
    assert g is not None and g.seq == 7


def test_dpsk_waveform_factory_roundtrip():
    """Single-carrier DPSK is factory-reachable (reference dpsk.hpp presets
    :1118) and decodes a data frame at -4 dB AWGN — the one-carrier power
    concentration niche."""
    import jax
    import jax.numpy as jnp

    from ria_tpu.phy.frame_v2 import DataFrame, WaveformMode, make_fixed_data_frame
    from ria_tpu.sim import apply_channel, awgn
    from ria_tpu.wave.api import create_waveform

    wf = create_waveform(WaveformMode.DPSK, "DQPSK", "R1_4")
    payload = b"single carrier dpsk frame"
    fb = make_fixed_data_frame("W1AW", "VE3ABC", 3, payload, "R1_4").serialize()
    tx = wf.tx_frame(fb)
    audio = np.concatenate([np.zeros(5000, np.float32), tx,
                            np.zeros(4000, np.float32)])
    out = np.asarray(apply_channel(jnp.asarray(audio), jax.random.PRNGKey(1),
                                   awgn(-4.0)).samples)
    rx = wf.rx_frame(out)
    assert rx.ok, "DPSK frame failed at -4 dB"
    g = DataFrame.deserialize(rx.frame_bytes)
    assert g.payload[: len(payload)] == payload
