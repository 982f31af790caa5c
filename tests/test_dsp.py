"""DSP substrate tests: FIR design parity, biquad responses, AGC, resampler,
Hilbert, adaptive mode controller."""

import numpy as np
import jax.numpy as jnp

from ria_tpu.dsp.fir import design_lowpass, design_bandpass, fir_filter, fft_convolve
from ria_tpu.dsp.biquad import lowpass, bandpass, biquad_filter, agc
from ria_tpu.dsp.resampler import resample
from ria_tpu.dsp.hilbert import analytic_signal
from ria_tpu.phy.adaptive import AdaptiveModeController, CarrierSense, recommend_mode


def test_fir_lowpass_response():
    h = design_lowpass(101, 1000.0, 48000.0)
    assert abs(h.sum() - 1.0) < 1e-5  # normalized DC gain
    w = np.fft.rfftfreq(4096, 1 / 48000.0)
    H = np.abs(np.fft.rfft(h, 4096))
    assert H[np.argmin(np.abs(w - 100))] > 0.99
    assert H[np.argmin(np.abs(w - 5000))] < 0.01


def test_fir_streaming_matches_batch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=1000).astype(np.float32)
    h = design_lowpass(31, 3000.0, 48000.0)
    # one-shot causal
    y_full, _ = fir_filter(jnp.asarray(x), jnp.asarray(h))
    # streamed in two blocks with carried tail
    y1, tail = fir_filter(jnp.asarray(x[:400]), jnp.asarray(h))
    y2, _ = fir_filter(jnp.asarray(x[400:]), jnp.asarray(h), tail)
    y_stream = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert np.allclose(np.asarray(y_full), y_stream, atol=1e-4)


def test_biquad_lowpass_attenuates():
    fs = 48000.0
    t = np.arange(4800) / fs
    lo = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 8000 * t).astype(np.float32)
    c = lowpass(1000.0, 0.707, fs)
    y_lo, _ = biquad_filter(jnp.asarray(lo), c)
    y_hi, _ = biquad_filter(jnp.asarray(hi), c)
    assert np.std(np.asarray(y_lo)[2000:]) > 0.6
    assert np.std(np.asarray(y_hi)[2000:]) < 0.05


def test_agc_converges_to_target():
    x = (0.05 * np.sin(2 * np.pi * 1000 * np.arange(48000) / 48000)).astype(np.float32)
    y, gain = agc(jnp.asarray(x), target=0.5)
    tail = np.asarray(y)[-4800:]
    assert 0.3 < np.max(np.abs(tail)) < 0.8


def test_resampler_preserves_tone():
    fs_in, fs_out = 48000, 8000
    t = np.arange(fs_in) / fs_in
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), fs_in, fs_out))
    assert len(y) == fs_out
    spec = np.abs(np.fft.rfft(y[800:]))
    peak_hz = np.argmax(spec) * fs_out / len(y[800:])
    assert abs(peak_hz - 1000.0) < 5.0


def test_analytic_signal_quadrature():
    t = np.arange(4096) / 48000.0
    x = np.cos(2 * np.pi * 1500 * t).astype(np.float32)
    z = np.asarray(analytic_signal(jnp.asarray(x)))
    assert np.allclose(np.abs(z)[100:-100], 1.0, atol=0.01)
    # imag should be sin (90 deg shifted)
    assert np.allclose(np.imag(z)[100:-100], np.sin(2 * np.pi * 1500 * t)[100:-100], atol=0.02)


def test_adaptive_mode_ladder_and_hysteresis():
    assert recommend_mode(40.0) == ("QAM64", "R5_6")
    assert recommend_mode(10.0) == ("BPSK", "R1_4")
    ctl = AdaptiveModeController()
    changed = [ctl.update(35.0) for _ in range(4)]
    assert any(changed)  # switches after stability frames
    assert ctl.modulation == "QAM64"
    # small SNR wiggle within hysteresis: no switch
    assert not ctl.update(34.5)


def test_carrier_sense():
    cs = CarrierSense(threshold=0.05)
    for _ in range(50):
        cs.update(np.full(100, 0.3, np.float32))
    assert cs.busy
    for _ in range(200):
        cs.update(np.zeros(100, np.float32))
    assert not cs.busy


def test_spectral_snr_tracks_true_snr():
    """dsp/snr.py must track from -10 to 30 dB (the phase-variance estimate
    floored at ~13 dB, which blocked QAM negotiation entirely)."""
    import jax
    import jax.numpy as jnp

    from ria_tpu.dsp.snr import spectral_snr_db
    from ria_tpu.phy.adaptive import tx_post_process
    from ria_tpu.phy.frame_v2 import DataFrame, WaveformMode
    from ria_tpu.sim import PRESETS, apply_channel
    from ria_tpu.wave.api import create_waveform

    wf = create_waveform(WaveformMode.MC_DPSK, "DBPSK", "R1_4")
    frame = DataFrame.make_data("W1AW", "VE3ABC", 1, b"snr estimator payload")
    tx = tx_post_process(wf.tx_frame(frame.serialize()), lead_in_ms=0.0)
    for true_snr, tol in ((-10, 4.0), (0, 3.0), (12, 3.0), (25, 3.5)):
        ch = PRESETS["awgn"](true_snr)
        out = np.asarray(apply_channel(jnp.asarray(tx), jax.random.PRNGKey(3), ch).samples)
        est = spectral_snr_db(out)
        assert abs(est - true_snr) <= tol, (true_snr, est)


def test_spectral_snr_noise_only_reports_floor():
    from ria_tpu.dsp.snr import spectral_snr_db

    rng = np.random.default_rng(0)
    noise = rng.normal(0, 1, 48000).astype(np.float32)
    assert spectral_snr_db(noise) < -10.0
