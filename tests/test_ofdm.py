"""OFDM waveform tests: loopback at the reference operating points.

BASELINE.md targets covered:
- OFDM DQPSK R1/2, AWGN 15 dB (config #3 path)
- OFDM QAM16/32/64 coherent with pilots, AWGN 25 dB (config #4 path)
- Schmidl-Cox sync + CFO estimation
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ria_tpu.fec import LDPCCodec
from ria_tpu.sim import apply_channel, awgn, good
from ria_tpu.utils.bits import bytes_to_bits
from ria_tpu.wave.ofdm import (
    OFDMConfig, demodulate_presynced, generate_preamble, modulate,
    schmidl_cox_search, tx_frame, constellation_table, BITS_PER_SYMBOL,
)


def _loopback(cfg, rate, payload, snr_db, seed=0, channel=None):
    codec = LDPCCodec(rate)
    coded = codec.encode(payload)
    bits = bytes_to_bits(coded)
    num_bits = len(bits)
    tx = tx_frame(bits, cfg, preamble="cox")
    audio = np.concatenate([np.zeros(3000, np.float32), tx, np.zeros(4000, np.float32)])
    ch = channel or awgn(snr_db)
    out = np.asarray(apply_channel(jnp.asarray(audio), jax.random.PRNGKey(seed), ch).samples)

    sync = schmidl_cox_search(jnp.asarray(out), cfg)
    assert bool(sync.detected), f"no sync: metric={float(sync.metric):.3f} lts={float(sync.lts_corr):.3f}"
    start = int(sync.lts_start)
    S = cfg.num_symbols_for_bits(num_bits)
    need = (2 + S) * cfg.symbol_samples
    frame = np.zeros(need, np.float32)
    avail = out[start : start + need]
    frame[: len(avail)] = avail
    res = demodulate_presynced(jnp.asarray(frame), sync.cfo_hz, cfg, S, 2)
    soft = np.asarray(res.soft_bits)[:num_bits]
    ok, decoded = codec.decode_soft(soft)
    return ok, decoded[: len(payload)], res, sync


def test_constellations_unit_power():
    for mod in ("QPSK", "QAM16", "QAM32", "QAM64", "QAM256"):
        pts = constellation_table(mod)
        assert abs(np.mean(np.abs(pts) ** 2) - 1.0) < 1e-3, mod


def test_sc_sync_position_and_cfo():
    cfg = OFDMConfig(modulation="DQPSK")
    bits = np.random.default_rng(0).integers(0, 2, 648)
    tx = tx_frame(bits, cfg, preamble="cox", tx_cfo_hz=10.0)
    lead = 2500
    audio = np.concatenate([np.zeros(lead, np.float32), tx, np.zeros(3000, np.float32)])
    rng = np.random.default_rng(1)
    rms = np.sqrt(np.mean(tx**2))
    audio += rng.normal(0, rms * 10 ** (-15 / 20), audio.shape).astype(np.float32)
    sync = schmidl_cox_search(jnp.asarray(audio), cfg)
    assert bool(sync.detected)
    # LTS starts after guard + 4 STS
    expected_lts = lead + (cfg.fft_size + cfg.cp_len) + 4 * cfg.symbol_samples
    assert abs(int(sync.lts_start) - expected_lts) <= 8, (int(sync.lts_start), expected_lts)
    assert abs(float(sync.cfo_hz) - 10.0) < 5.0


@pytest.mark.parametrize("snr_db", [15.0, 12.0])
def test_dqpsk_r12_awgn(snr_db):
    """OFDM DQPSK R1/2 @ 15 dB AWGN — reference README.md:77 floor."""
    cfg = OFDMConfig(modulation="DQPSK", use_pilots=False)
    payload = bytes(range(80))
    ok, decoded, res, _ = _loopback(cfg, "R1_2", payload, snr_db)
    assert ok, f"decode failed at {snr_db} dB (snr_est={float(res.snr_db):.1f})"
    assert decoded == payload


@pytest.mark.parametrize("mod,rate,snr_db,spacing", [
    ("QPSK", "R1_2", 20.0, 5),
    ("QAM16", "R1_2", 18.0, 5),
    ("QAM32", "R3_4", 25.0, 8),
    ("QAM64", "R3_4", 25.0, 8),
])
def test_coherent_qam_awgn(mod, rate, snr_db, spacing):
    """Coherent pilot-assisted modes at their README operating points."""
    cfg = OFDMConfig(modulation=mod, use_pilots=True, pilot_spacing=spacing)
    payload = bytes(range(100))
    ok, decoded, res, _ = _loopback(cfg, rate, payload, snr_db)
    assert ok, f"{mod} {rate} failed at {snr_db} dB (snr_est={float(res.snr_db):.1f})"
    assert decoded == payload


def test_dqpsk_fading_good():
    """DQPSK R1/4 through the Good fading channel at 16 dB."""
    cfg = OFDMConfig(modulation="DQPSK")
    payload = bytes(range(40))
    ok, decoded, res, _ = _loopback(cfg, "R1_4", payload, 16.0, seed=3, channel=good(16.0))
    assert ok
    assert decoded == payload


def test_dbpsk_mode():
    cfg = OFDMConfig(modulation="DBPSK")
    payload = bytes(range(40))
    ok, decoded, _, _ = _loopback(cfg, "R1_2", payload, 12.0)
    assert ok
    assert decoded == payload


def test_d8psk_mode():
    """D8PSK with the two-pass decode path compiled in."""
    cfg = OFDMConfig(modulation="D8PSK", use_pilots=True, pilot_spacing=8)
    payload = bytes(range(40))
    ok, decoded, _, _ = _loopback(cfg, "R1_2", payload, 18.0)
    assert ok
    assert decoded == payload


def test_adaptive_equalizer_lms_rls():
    """LMS/RLS decision-directed equalizer on coherent QPSK."""
    for rls in (False, True):
        cfg = OFDMConfig(modulation="QPSK", use_pilots=True, pilot_spacing=5,
                         adaptive_eq=True, adaptive_rls=rls)
        payload = bytes(range(60))
        ok, decoded, _, _ = _loopback(cfg, "R1_2", payload, 20.0, seed=4 + rls)
        assert ok, f"adaptive eq rls={rls} failed"
        assert decoded == payload


def test_crc_aided_list_decode_rescues_ml_ambiguity():
    """The 648-bit code has low-weight codeword pairs (weight-6 observed):
    after a fade, BP can converge to a parity-valid NEIGHBOUR whose LLR
    correlation beats the truth's — undetectable by any metric, only the
    frame CRC can arbitrate.  This exact realization (Good fading, seed
    1006) used to lose the frame; CRC-aided candidate-list decoding
    (ria_tpu.fec.ldpc.decode_candidates) recovers it."""
    import jax
    from ria_tpu.phy.frame_v2 import WaveformMode, make_fixed_data_frame, DataFrame
    from ria_tpu.sim import PRESETS, apply_channel
    from ria_tpu.wave.api import create_waveform

    payload = b"acceptance sweep payload for seeds!"
    wf = create_waveform(WaveformMode.OFDM_CHIRP, "DQPSK", "R2_3")
    frame = make_fixed_data_frame("W1AW", "VE3ABC", 6, payload, "R2_3")
    tx = wf.tx_frame(frame.serialize())
    audio = np.concatenate([np.zeros(4000, np.float32), tx, np.zeros(6000, np.float32)])
    out = np.asarray(apply_channel(jnp.asarray(audio), jax.random.PRNGKey(1006),
                                   PRESETS["good"](20.0)).samples)
    rx = wf.rx_frame(out)
    assert rx.ok, "CRC-aided list decode failed to rescue the ML-ambiguous frame"
    got = DataFrame.deserialize(rx.frame_bytes)
    assert got is not None and got.payload[: len(payload)] == payload


def test_lts_cfo_estimation_and_decode_under_cfo():
    """Light-preamble (LTS-only) frames must carry their own CFO estimate:
    the inter-repeat phase of the two LTS training symbols gives CFO to
    within ~1 Hz (unambiguous +-21.4 Hz), and the frame decodes through the
    SSB-shift channel.  Without it connected-mode OFDM ran at cfo=0 and
    every data frame failed under a modest radio mistuning."""
    import jax
    from dataclasses import replace

    from ria_tpu.phy.frame_v2 import make_fixed_data_frame, DataFrame
    from ria_tpu.sim.channel import awgn, apply_channel
    from ria_tpu.wave import ofdm
    from ria_tpu.wave.api import OFDMChirpWaveform

    wf = OFDMChirpWaveform(modulation="DQPSK", rate="R1_2")
    frame = make_fixed_data_frame("W1AW", "VE3ABC", 0, b"cfo payload", "R1_2")
    tx = wf.tx_frame(frame.serialize(), light=True)
    for cfo in (8.0, -12.0):
        cfg = replace(awgn(15.0), cfo_hz=cfo, cfo_enabled=True)
        audio = np.zeros(48000, np.float32)
        audio[6000 : 6000 + len(tx)] = tx
        rx_audio = np.asarray(apply_channel(jnp.asarray(audio),
                                            jax.random.PRNGKey(5), cfg).samples)
        res = ofdm.lts_search(jnp.asarray(rx_audio), wf.cfg)
        assert bool(res.detected)
        assert abs(float(res.cfo_hz) - cfo) < 1.5, (cfo, float(res.cfo_hz))
        rx = wf.rx_frame(rx_audio, light=True)
        assert rx.ok, f"light decode failed at cfo={cfo}"
        got = DataFrame.deserialize(rx.frame_bytes)
        assert got is not None and got.payload.rstrip(b"\x00") == b"cfo payload"
        # Honest SNR through the bandlimited SSB-shift channel (the
        # out-of-band floor is filtered away; the inter-frame-gap noise
        # reference keeps the estimate from inflating to 25+ dB).
        assert 10.0 < rx.snr_db < 20.0, rx.snr_db


def test_lts_search_rejects_chirp_interference():
    """A co-channel chirp preamble (a connecting peer's retransmits) must
    not register as an LTS sync: it correlates at ~0.31, noise at ~0.14, a
    true LTS at >=0.70 even under fading — threshold 0.5 separates the
    populations.  False LTS syncs used to cost ~20 s of retry-ladder work
    each and starve the real handshake decode."""
    import jax

    from ria_tpu.sim.channel import awgn, apply_channel
    from ria_tpu.sync.chirp import ChirpConfig, generate
    from ria_tpu.wave import ofdm
    from ria_tpu.wave.api import OFDMChirpWaveform

    wf = OFDMChirpWaveform(modulation="DQPSK", rate="R1_2")
    ch = np.asarray(generate(ChirpConfig()))
    for seed in range(4):
        audio = np.zeros(48000, np.float32)
        n = min(len(ch), 47000)
        audio[1000 : 1000 + n] = ch[:n] * 0.3
        rx = np.asarray(apply_channel(jnp.asarray(audio),
                                      jax.random.PRNGKey(400 + seed),
                                      awgn(10.0)).samples)
        res = ofdm.lts_search(jnp.asarray(rx), wf.cfg)
        assert not bool(res.detected), float(res.corr)
