"""Zadoff-Chu sync tests (mirrors reference tools/test_zc_sync.cpp tiers:
detection floor sweep, CFO accuracy, root discrimination)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ria_tpu.sync.zc import (
    ZCConfig, ZC_PING, ZC_PONG, ZC_DATA, ZC_CONTROL,
    detect, generate_preamble, zc_sequence,
)


def _awgn(x, snr_db, rng):
    nz = np.abs(x) > 1e-6
    rms = np.sqrt(np.mean(x[nz] ** 2)) if nz.any() else 0.1
    return x + rng.normal(0, rms * 10 ** (-snr_db / 20), x.shape).astype(np.float32)


def test_zc_sequence_unit_modulus_and_cazac():
    zc = zc_sequence(5, 127)
    assert np.allclose(np.abs(zc), 1.0, atol=1e-6)
    # CAZAC: autocorrelation at nonzero cyclic lags ~ 0
    ac = np.fft.ifft(np.fft.fft(zc) * np.conj(np.fft.fft(zc)))
    assert abs(ac[0]) > 100
    assert np.max(np.abs(ac[1:])) < 1e-3 * abs(ac[0])


@pytest.mark.parametrize("ftype", [ZC_PING, ZC_PONG, ZC_DATA, ZC_CONTROL])
def test_root_discrimination(ftype):
    cfg = ZCConfig()
    rng = np.random.default_rng(ftype)
    pre = generate_preamble(cfg, ftype)
    lead = 1000
    audio = np.concatenate([np.zeros(lead, np.float32), pre, np.zeros(2000, np.float32)])
    audio = _awgn(audio, 10.0, rng)
    res = detect(jnp.asarray(audio), cfg)
    assert bool(res.detected)
    assert int(res.frame_type) == ftype
    # start_sample points past the preamble
    assert abs(int(res.start_sample) - (lead + cfg.preamble_samples)) <= 8


@pytest.mark.parametrize("snr_db", [10.0, 0.0, -3.0, -8.0])
def test_detection_floor(snr_db):
    cfg = ZCConfig()
    rng = np.random.default_rng(42)
    hits = 0
    for trial in range(5):
        pre = generate_preamble(cfg, ZC_DATA)
        audio = np.concatenate([np.zeros(1500, np.float32), pre, np.zeros(1500, np.float32)])
        audio = _awgn(audio, snr_db, rng)
        res = detect(jnp.asarray(audio), cfg)
        hits += int(bool(res.detected) and int(res.frame_type) == ZC_DATA)
    assert hits >= 4, f"{hits}/5 at {snr_db} dB"


@pytest.mark.parametrize("cfo", [5.0, -10.0, 20.0])
def test_cfo_estimation(cfo):
    cfg = ZCConfig()
    rng = np.random.default_rng(3)
    pre = generate_preamble(cfg, ZC_DATA)
    # Apply CFO via analytic rotation
    from ria_tpu.dsp.nco import freq_shift_real

    shifted, _ = freq_shift_real(jnp.asarray(pre), cfo, cfg.sample_rate)
    audio = np.concatenate([np.zeros(1200, np.float32), np.asarray(shifted, np.float32),
                            np.zeros(1200, np.float32)])
    audio = _awgn(audio, 15.0, rng)
    res = detect(jnp.asarray(audio), cfg)
    assert bool(res.detected)
    assert abs(float(res.cfo_hz) - cfo) < 2.5, f"cfo est {float(res.cfo_hz)} vs {cfo}"


def test_no_false_detect_on_noise():
    cfg = ZCConfig()
    rng = np.random.default_rng(9)
    noise = rng.normal(0, 0.1, 8000).astype(np.float32)
    res = detect(jnp.asarray(noise), cfg)
    assert not bool(res.detected)


def test_root_mask_restricts():
    from ria_tpu.sync.zc import ROOT_MASK_DATA, ROOT_MASK_CONTROL

    cfg = ZCConfig()
    rng = np.random.default_rng(11)
    pre = generate_preamble(cfg, ZC_PING)
    audio = _awgn(np.concatenate([np.zeros(800, np.float32), pre, np.zeros(800, np.float32)]), 15.0, rng)
    res = detect(jnp.asarray(audio), cfg, root_mask=ROOT_MASK_DATA | ROOT_MASK_CONTROL)
    # PING root is excluded; cross-correlation with DATA/CONTROL roots is low
    assert not bool(res.detected) or int(res.frame_type) in (ZC_DATA, ZC_CONTROL)


def test_cfar_low_snr_timing_and_root():
    """CFAR detector (zc.py ZC_CFAR_RATIO): exact timing + root at -10 dB in a
    realistic decode window (preamble followed by 20k samples of 'data')."""
    cfg = ZCConfig()
    rng = np.random.default_rng(77)
    pre = generate_preamble(cfg, ZC_DATA)
    lead = 5000
    audio = np.zeros(lead + len(pre) + 20000, np.float32)
    audio[lead:lead + len(pre)] = pre
    audio = _awgn(audio, -10.0, rng)
    res = detect(jnp.asarray(audio), cfg)
    assert bool(res.detected)
    assert int(res.frame_type) == ZC_DATA
    assert abs(int(res.start_sample) - (lead + cfg.preamble_samples)) <= 8


def test_cfar_no_false_alarm_on_noise_batch():
    """CFAR path must not raise the false-alarm rate: 50 noise-only windows."""
    cfg = ZCConfig()
    rng = np.random.default_rng(13)
    for _ in range(50):
        noise = rng.normal(0, 0.1, 30000).astype(np.float32)
        assert not bool(detect(jnp.asarray(noise), cfg).detected)
