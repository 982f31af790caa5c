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


def test_afdm_chirped_profile_breaks_audio():
    """The reference's documented negative finding, DEMONSTRATED
    (afdm_config.hpp:33-47): a chirped AFDM block (c1 > 0) through the
    real-audio DSB path overlaps its own 2fc image and the roundtrip EVM
    explodes, while the c1=0 profile round-trips cleanly.  The waveform
    wrapper therefore refuses chirped audio profiles outright."""
    import pytest

    from ria_tpu.dsp.hilbert import analytic_signal

    N = 512
    fs, fc = 48000.0, 1500.0
    rng = np.random.default_rng(2)
    qpsk = ((1 - 2 * rng.integers(0, 2, 30))
            + 1j * (1 - 2 * rng.integers(0, 2, 30))) / np.sqrt(2)
    syms = np.zeros(N, np.complex64)
    syms[6:36] = qpsk.astype(np.complex64)  # 30 carriers, ~560-3280 Hz
    n = np.arange(N)
    carrier = np.exp(2j * np.pi * fc * n / fs)

    def dsb_evm(c1):
        cfg = AFDMConfig(N=N, c1=c1, c2=0.0)
        x = np.asarray(idaft(jnp.asarray(syms), cfg))  # TIME-domain block
        tx = np.real(x * carrier).astype(np.float32)   # real audio (DSB)
        z = np.asarray(analytic_signal(jnp.asarray(tx))) * np.conj(carrier)
        rx = np.asarray(daft(jnp.asarray(z.astype(np.complex64)), cfg))[6:36]
        scale = np.mean(rx / qpsk)
        return float(np.sqrt(np.mean(np.abs(rx / scale - qpsk) ** 2)))

    clean = dsb_evm(0.0)
    chirped = dsb_evm(1.0 / (2 * N))  # the canonical AFDM c1 = 1/(2N)
    # c1=0 (OFDM mode): positive-frequency carriers survive the real-audio
    # path.  c1>0: the quadratic phase sweeps the block across the whole
    # spectrum, the 2fc image folds onto the signal, and the constellation
    # is destroyed.
    assert clean < 0.05, clean
    assert chirped > 0.5, (clean, chirped)  # ~1.0 measured: unusable

    from ria_tpu.wave.afdm import AFDMWaveform

    with pytest.raises(ValueError, match="c1"):
        AFDMWaveform(cfg=AFDMConfig(c1=1.0 / 128))


def test_afdm_waveform_frame_roundtrip():
    """Factory-gated AFDMWaveform (WaveformMode.AFDM extension): a real
    modem roundtrip — ZC-synced, DQPSK-across-blocks differential, LDPC
    R1/4 — decodes a control frame at 5 dB AWGN, 5/5 seeds."""
    from ria_tpu.phy.frame_v2 import (ControlFrame, FrameType, WaveformMode,
                                      hash_callsign)
    from ria_tpu.wave.api import create_waveform

    wf = create_waveform(WaveformMode.AFDM)
    fb = ControlFrame(type=FrameType.KEEPALIVE, seq=1,
                      src_hash=hash_callsign("W1AW"),
                      dst_hash=hash_callsign("VE3ABC")).serialize()
    tx = wf.tx_frame(fb)
    rms = float(np.sqrt(np.mean(tx**2)))
    for s in range(5):
        rng2 = np.random.default_rng(100 + s)
        audio = np.concatenate([np.zeros(3000, np.float32), tx,
                                np.zeros(3000, np.float32)])
        audio += rng2.normal(0, rms * 10 ** (-5 / 20), audio.shape).astype(np.float32)
        ok, got, info = wf.rx_frame(audio, num_codewords=1)
        assert ok and got[:20] == fb, (s, info)


def test_afdm_waveform_cfo_roundtrip():
    """rx_frame must truly SHIFT the spectrum for CFO correction (a real
    multiply-and-take-real is an amplitude modulation that nulls blocks);
    tx_cfo_hz must actually move the carrier."""
    from ria_tpu.phy.frame_v2 import (ControlFrame, FrameType, WaveformMode,
                                      hash_callsign)
    from ria_tpu.wave.api import create_waveform

    wf = create_waveform(WaveformMode.AFDM)
    fb = ControlFrame(type=FrameType.KEEPALIVE, seq=2,
                      src_hash=hash_callsign("W1AW"),
                      dst_hash=hash_callsign("VE3ABC")).serialize()
    tx = wf.tx_frame(fb, tx_cfo_hz=10.0)
    rms = float(np.sqrt(np.mean(tx**2)))
    ok_n = 0
    for s in range(5):
        rng2 = np.random.default_rng(300 + s)
        audio = np.concatenate([np.zeros(3000, np.float32), tx,
                                np.zeros(3000, np.float32)])
        audio += rng2.normal(0, rms * 10 ** (-10 / 20), audio.shape).astype(np.float32)
        ok, got, info = wf.rx_frame(audio, num_codewords=1)
        if ok and got[:20] == fb:
            ok_n += 1
            assert abs(info["cfo_hz"] - 10.0) < 5.0, info
    assert ok_n >= 4, ok_n
