"""Watterson channel model statistical tests.

Verifies the channel's numeric contracts (SNR calibration, Rayleigh fading
statistics, multipath delay, CFO shift) rather than bit-exact noise streams.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ria_tpu.sim import apply_channel, awgn, poor, flutter, ChannelConfig


def test_awgn_snr_calibration():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.3, 48000).astype(np.float32)
    cfg = awgn(snr_db=10.0)
    out = apply_channel(jnp.asarray(x), jax.random.PRNGKey(0), cfg).samples
    noise = np.asarray(out) - x
    snr = 10 * np.log10(np.mean(x**2) / np.mean(noise**2))
    assert abs(snr - 10.0) < 0.5, snr


def test_fading_is_rayleigh_like():
    # Long run: tap magnitude should have Rayleigh-like statistics with
    # mean power ~1 (the reference scales noise for unit output power).
    cfg = ChannelConfig(snr_db=100.0, doppler_spread_hz=10.0, multipath_enabled=False,
                        noise_enabled=False)
    x = jnp.ones(48000 * 4, jnp.float32)
    res = apply_channel(x, jax.random.PRNGKey(1), cfg)
    mag = np.asarray(res.fading_mag)
    # discard transient (IIR settles from init=1)
    mag = mag[96000:]
    mean_power = np.mean(mag**2)
    assert 0.5 < mean_power < 2.0, mean_power
    # Rayleigh: mean/sqrt(E[x^2]) = sqrt(pi/4) ~ 0.886
    ratio = np.mean(mag) / np.sqrt(mean_power)
    assert 0.8 < ratio < 0.95, ratio


def test_fading_rate_scales_with_doppler():
    x = jnp.ones(48000 * 2, jnp.float32)
    def crossing_rate(doppler):
        cfg = ChannelConfig(snr_db=100.0, doppler_spread_hz=doppler,
                            multipath_enabled=False, noise_enabled=False)
        mag = np.asarray(apply_channel(x, jax.random.PRNGKey(2), cfg).fading_mag)
        med = np.median(mag)
        above = mag > med
        return np.sum(above[1:] != above[:-1])
    slow = crossing_rate(0.1)
    fast = crossing_rate(10.0)
    assert fast > 5 * max(slow, 1), (slow, fast)


def test_cfo_shifts_spectrum():
    fs = 48000.0
    t = np.arange(48000) / fs
    tone = np.sin(2 * np.pi * 1500.0 * t).astype(np.float32)
    cfg = ChannelConfig(snr_db=100.0, cfo_hz=25.0, fading_enabled=False,
                        multipath_enabled=False, noise_enabled=False)
    out = np.asarray(apply_channel(jnp.asarray(tone), jax.random.PRNGKey(3), cfg).samples)
    spec = np.abs(np.fft.rfft(out[4800:]))
    peak_hz = np.argmax(spec) * fs / len(out[4800:])
    assert abs(peak_hz - 1525.0) < 3.0, peak_hz


def test_multipath_adds_delayed_copy():
    x = np.zeros(9600, np.float32)
    x[100] = 1.0
    cfg = ChannelConfig(snr_db=100.0, delay_spread_ms=2.0, fading_enabled=False,
                        noise_enabled=False, multipath_enabled=True)
    out = np.asarray(apply_channel(jnp.asarray(x), jax.random.PRNGKey(4), cfg).samples)
    delay = int(2.0 * 48000 / 1000)
    peaks = np.argsort(np.abs(out))[-2:]
    assert set(peaks) == {100, 100 + delay}, peaks


def test_streaming_channel_matches_oneshot_cfo():
    """Block-streamed CFO must be phase-continuous: splitting the input into
    blocks gives the same output as one shot (away from the lowpass edge)."""
    import jax

    from ria_tpu.sim.channel import (ChannelConfig, apply_channel,
                                     apply_channel_stream, init_channel_state)

    cfg = ChannelConfig(snr_db=60.0, cfo_hz=8.0, fading_enabled=False,
                        multipath_enabled=False, noise_enabled=False)
    rng = np.random.default_rng(0)
    n = 48000
    t = np.arange(n) / 48000.0
    x = jnp.asarray(np.sin(2 * np.pi * 1500.0 * t).astype(np.float32) * 0.5)
    key = jax.random.PRNGKey(1)

    full = np.asarray(apply_channel(x, key, cfg).samples)

    state = init_channel_state(cfg, jax.random.PRNGKey(2))
    parts = []
    block = 9600
    for i in range(0, n, block):
        res, state = apply_channel_stream(x[i : i + block], key, cfg, state)
        parts.append(np.asarray(res.samples))
    streamed = np.concatenate(parts)

    # Skip the 48-sample lowpass warm-up; elsewhere the two paths agree.
    err = np.abs(streamed[64:] - full[64:])
    assert float(err.max()) < 2e-3, float(err.max())


def test_streaming_channel_fading_continuity():
    """Fading taps carry across blocks: no magnitude jump at boundaries."""
    import jax

    from ria_tpu.sim.channel import (ChannelConfig, apply_channel_stream,
                                     init_channel_state)

    cfg = ChannelConfig(snr_db=60.0, doppler_spread_hz=1.0,
                        delay_spread_ms=0.0, multipath_enabled=False,
                        noise_enabled=False, cfo_enabled=False)
    x = jnp.ones(4800, jnp.float32)
    state = init_channel_state(cfg, jax.random.PRNGKey(0))
    mags = []
    for i in range(6):
        res, state = apply_channel_stream(x, jax.random.PRNGKey(10 + i), cfg, state)
        mags.append(np.asarray(res.fading_mag))
    # Across each boundary the AR(1) tap moves by at most a few noise steps:
    # |h[k+1]-h[k]| is O(sqrt(alpha)); check boundary step is same order as
    # the in-block per-sample steps, not a re-draw.
    inblock = np.abs(np.diff(mags[0]))
    step95 = np.quantile(inblock, 0.999) * 5 + 1e-4
    for a, b in zip(mags[:-1], mags[1:]):
        assert abs(float(b[0]) - float(a[-1])) < step95
