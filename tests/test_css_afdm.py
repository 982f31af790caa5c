"""CSS sync and AFDM transform tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from ria_tpu.sync.css import (
    CSSConfig, CSS_PING, CSS_PONG, CSS_DATA, CSS_CONTROL, detect, generate_preamble,
)
from ria_tpu.wave.afdm import AFDMConfig, daft, idaft, modulate_block, demodulate_block


def _awgn(x, snr_db, rng):
    nz = np.abs(x) > 1e-6
    rms = np.sqrt(np.mean(x[nz] ** 2)) if nz.any() else 0.1
    return x + rng.normal(0, rms * 10 ** (-snr_db / 20), x.shape).astype(np.float32)


@pytest.mark.parametrize("ftype", [CSS_PING, CSS_PONG, CSS_DATA, CSS_CONTROL])
def test_css_frame_type_discrimination(ftype):
    cfg = CSSConfig()
    rng = np.random.default_rng(ftype)
    pre = generate_preamble(cfg, ftype)
    lead = 4000
    audio = _awgn(np.concatenate([np.zeros(lead, np.float32), pre,
                                  np.zeros(3000, np.float32)]), 5.0, rng)
    res = detect(jnp.asarray(audio), cfg)
    assert bool(res.detected)
    assert int(res.frame_type) == ftype


def test_daft_inverse():
    cfg = AFDMConfig(N=64, c1=0.01, c2=0.003)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype(np.complex64)
    y = daft(jnp.asarray(x), cfg)
    back = np.asarray(idaft(y, cfg))
    assert np.allclose(back, x, atol=1e-4)


def test_afdm_audio_profile_roundtrip():
    """c1=0 audio profile (the documented HF-compatible mode)."""
    cfg = AFDMConfig(N=64, c1=0.0, c2=0.0)
    rng = np.random.default_rng(1)
    qpsk = ((1 - 2 * rng.integers(0, 2, 64)) + 1j * (1 - 2 * rng.integers(0, 2, 64))) / np.sqrt(2)
    tx = modulate_block(qpsk.astype(np.complex64), cfg)
    rx = demodulate_block(tx, cfg)
    # constant scale from the OFDM carrier mapping; normalize and compare
    scale = np.mean(rx / qpsk)
    assert np.allclose(rx / scale, qpsk, atol=0.05)
