"""MFSK waveform tests: preamble sweep detection + decode at low SNR."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ria_tpu.fec import LDPCCodec
from ria_tpu.sim import apply_channel, awgn
from ria_tpu.utils.bits import bytes_to_bits
from ria_tpu.wave.mfsk import MFSKConfig, demodulate, find_preamble, tx_frame


def _loopback(cfg, snr_db, seed, payload=b"MFSK LOW SNR TEST!!!"):
    codec = LDPCCodec("R1_4")
    bits = bytes_to_bits(codec.encode(payload))
    tx = tx_frame(bits, cfg)
    lead = 5000
    audio = np.concatenate([np.zeros(lead, np.float32), tx, np.zeros(5000, np.float32)])
    out = np.asarray(apply_channel(jnp.asarray(audio), jax.random.PRNGKey(seed),
                                   awgn(snr_db)).samples)
    sync = find_preamble(jnp.asarray(out), cfg)
    if not bool(sync.detected):
        return False, None, sync
    start = int(sync.data_start)
    res = demodulate(jnp.asarray(out[start:]), cfg, len(bits))
    ok, decoded = codec.decode_soft(np.asarray(res.soft_bits))
    return ok, decoded[: len(payload)], sync


def test_preamble_detection_position():
    cfg = MFSKConfig(num_tones=8)
    bits = np.random.default_rng(0).integers(0, 2, 648)
    tx = tx_frame(bits, cfg)
    lead = 6000
    audio = np.concatenate([np.zeros(lead, np.float32), tx, np.zeros(4000, np.float32)])
    rng = np.random.default_rng(1)
    rms = np.sqrt(np.mean(tx**2))
    audio += rng.normal(0, rms * 10 ** (-5 / 20), audio.shape).astype(np.float32)
    sync = find_preamble(jnp.asarray(audio), cfg)
    assert bool(sync.detected)
    expected = lead + cfg.preamble_samples
    assert abs(int(sync.data_start) - expected) <= cfg.samples_per_symbol // 2


@pytest.mark.parametrize("tones,snr_db", [(8, -2.0), (4, -6.0), (16, 2.0)])
def test_mfsk_loopback(tones, snr_db):
    """Reference targets ~-4 dB for 8FSK, -8 dB for 4FSK (mfsk.hpp:16-22)."""
    cfg = MFSKConfig(num_tones=tones)
    ok, decoded, sync = _loopback(cfg, snr_db, seed=tones)
    assert ok, f"{tones}FSK failed at {snr_db} dB (score={float(sync.score):.2f})"
    assert decoded == b"MFSK LOW SNR TEST!!!"


def test_bfsk_preset_loopback():
    """BFSK preset parity (reference src/fsk/fsk.hpp): mark/space 1525/1475,
    31.25 baud, 4x repetition; target -4 dB in the 2.8 kHz reporting BW."""
    from ria_tpu.wave.mfsk import bfsk_config

    cfg = bfsk_config()
    assert cfg.tone_freq(0) == 1475.0 and cfg.tone_freq(1) == 1525.0
    assert cfg.samples_per_symbol == 1536 and cfg.bits_per_symbol == 1
    ok, decoded, sync = _loopback(cfg, -4.0, seed=77, payload=b"BFSK!")
    assert ok, f"BFSK failed at -4 dB (score={float(sync.score):.2f})"
    assert decoded == b"BFSK!"


def test_mfsk_preamble_rejects_sweeping_interferers():
    """The MFSK sync must not fire on other sweeping signals: an up-chirp
    scores 0.74 and an MC-DPSK preamble 0.73 on energy dominance alone —
    the per-symbol hard-decision sweep-match gate (>0.7) rejects both while
    true MFSK still detects at -8 dB."""
    import jax

    from ria_tpu.sim.channel import awgn, apply_channel
    from ria_tpu.sync.chirp import ChirpConfig, generate
    from ria_tpu.wave import mc_dpsk
    from ria_tpu.wave.mfsk import MFSKConfig, find_preamble, generate_preamble

    cfg = MFSKConfig()
    W = 96000

    def put(sig):
        a = np.zeros(W, np.float32)
        n = min(len(sig), W - 2000)
        a[2000 : 2000 + n] = np.asarray(sig[:n])
        return a

    for sig, snr, expect in [
        (generate_preamble(cfg), -8.0, True),
        (np.asarray(generate(ChirpConfig())), 5.0, False),
        (np.asarray(mc_dpsk.preamble(mc_dpsk.MCDPSKConfig())), 5.0, False),
    ]:
        rx = np.asarray(apply_channel(jnp.asarray(put(sig)),
                                      jax.random.PRNGKey(3), awgn(snr)).samples)
        res = find_preamble(jnp.asarray(rx), cfg)
        assert bool(res.detected) == expect, (snr, float(res.score))
