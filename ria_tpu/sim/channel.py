"""Watterson HF channel model (ITU-R F.1487), jittable and seeded.

Model contract from the reference (src/sim/hf_channel.hpp:35-303):
- two independent Rayleigh taps: complex one-pole IIR (alpha =
  1 - exp(-2 pi fd/fs)) driven by complex white Gaussian noise with
  std sqrt(1/alpha) per component, magnitude-only fading applied to the
  real signal;
- two-path multipath: direct + delayed (delay_spread_ms), gains 0.707/0.707;
- AWGN with sigma = rms(non-zero samples) * 10^(-SNR/20);
- CFO via mix-to-baseband at 1500 Hz (48-sample moving-average lowpass),
  complex rotation, mix back (applyCFO :182-241);
- ITU-R presets: Good 0.5ms/0.1Hz, Moderate 1.0/0.5, Poor 2.0/1.0,
  Flutter 0.5/10, AWGN-only.

TPU redesign: the per-sample IIR fading recurrence is an AR(1) process and is
evaluated with an associative scan (O(log n) depth) instead of a sequential
loop; everything else is elementwise/batched.  RNG is jax.random (counter
based) — seeds give reproducibility, but the noise stream is not bit-equal to
the reference's std::mt19937 (statistics and SNR contracts are identical).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ChannelConfig:
    snr_db: float = 15.0
    delay_spread_ms: float = 2.0
    doppler_spread_hz: float = 1.0
    cfo_hz: float = 0.0
    path1_gain: float = 0.707
    path2_gain: float = 0.707
    sample_rate: float = 48000.0
    fading_enabled: bool = True
    multipath_enabled: bool = True
    noise_enabled: bool = True
    cfo_enabled: bool = True

    @property
    def delay_samples(self) -> int:
        return int(self.delay_spread_ms * self.sample_rate / 1000.0)

    @property
    def fading_alpha(self) -> float:
        nd = self.doppler_spread_hz / self.sample_rate
        return 1.0 - float(np.exp(-2.0 * np.pi * nd))


def awgn(snr_db: float = 15.0) -> ChannelConfig:
    return ChannelConfig(snr_db=snr_db, delay_spread_ms=0.0, doppler_spread_hz=0.0,
                         path1_gain=1.0, path2_gain=0.0, fading_enabled=False,
                         multipath_enabled=False)


def good(snr_db: float = 20.0) -> ChannelConfig:
    return ChannelConfig(snr_db=snr_db, delay_spread_ms=0.5, doppler_spread_hz=0.1)


def moderate(snr_db: float = 20.0) -> ChannelConfig:
    return ChannelConfig(snr_db=snr_db, delay_spread_ms=1.0, doppler_spread_hz=0.5)


def poor(snr_db: float = 20.0) -> ChannelConfig:
    return ChannelConfig(snr_db=snr_db, delay_spread_ms=2.0, doppler_spread_hz=1.0)


def flutter(snr_db: float = 20.0) -> ChannelConfig:
    return ChannelConfig(snr_db=snr_db, delay_spread_ms=0.5, doppler_spread_hz=10.0)


PRESETS = {"awgn": awgn, "good": good, "moderate": moderate, "poor": poor, "flutter": flutter}


def _ar1_scan(noise: jnp.ndarray, alpha: float, init: jnp.ndarray) -> jnp.ndarray:
    """y[n] = (1-alpha) y[n-1] + alpha x[n], evaluated via associative scan.

    noise: [..., N] complex; init: [...] complex (y[-1]).
    """
    a = 1.0 - alpha
    b = alpha * noise
    # y[n] = a*y[n-1] + b[n]  ==  affine composition (a2*a1, a2*b1 + b2)
    n = noise.shape[-1]
    A = jnp.full(noise.shape, a, dtype=noise.dtype)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    As, Bs = jax.lax.associative_scan(combine, (A, b), axis=-1)
    return As * init[..., None] + Bs


class ChannelResult(NamedTuple):
    samples: jnp.ndarray
    fading_mag: jnp.ndarray  # tap-1 magnitude trace (diagnostics)


@functools.partial(jax.jit, static_argnames=("cfg",))
def apply_channel(x: jnp.ndarray, key: jax.Array, cfg: ChannelConfig) -> ChannelResult:
    """Pass samples [..., N] through the channel. Batched over leading axes."""
    n = x.shape[-1]
    k_fade1, k_fade2, k_noise = jax.random.split(key, 3)

    # Per-block SNR normalization against non-zero-sample RMS (:110-128).
    nz = (jnp.abs(x) > 1e-6).astype(jnp.float32)
    count = jnp.maximum(jnp.sum(nz, axis=-1, keepdims=True), 1.0)
    power = jnp.sum(jnp.square(x) * nz, axis=-1, keepdims=True) / count
    input_rms = jnp.where(jnp.sum(nz, axis=-1, keepdims=True) > 0, jnp.sqrt(power), 0.1)
    noise_std = input_rms * (10.0 ** (-cfg.snr_db / 20.0))

    out = x
    h1_mag = jnp.ones(x.shape, jnp.float32)
    if cfg.fading_enabled:
        alpha = cfg.fading_alpha
        scale = float(np.sqrt(1.0 / alpha))
        # Stationary AR(1) state variance per component: alpha^2 var_in /
        # (1 - (1-alpha)^2) = 1/(2-alpha).  Drawing y[-1] from the
        # stationary distribution makes the channel statistically
        # stationary from sample 0 — a deterministic y[-1]=1 start puts
        # BOTH taps at identical amplitude for the first ~1/alpha samples
        # (seconds at HF Doppler rates), i.e. the worst-case equal-power
        # two-ray channel with perfect spectral nulls, which biased every
        # short-lead simulation pessimistically.
        init_std = float(np.sqrt(1.0 / (2.0 - alpha)))

        def fade(k):
            k_init, k_noise_f = jax.random.split(k)
            nr = jax.random.normal(k_noise_f, x.shape + (2,), jnp.float32) * scale
            noise_c = jax.lax.complex(nr[..., 0], nr[..., 1])
            i0 = jax.random.normal(k_init, x.shape[:-1] + (2,), jnp.float32) * init_std
            init = jax.lax.complex(i0[..., 0], i0[..., 1])
            return _ar1_scan(noise_c, alpha, init)

        h1 = fade(k_fade1)
        h1_mag = jnp.abs(h1)
        if cfg.multipath_enabled and cfg.delay_samples > 0:
            h2 = fade(k_fade2)
            delayed = jnp.roll(x, cfg.delay_samples, axis=-1)
            ramp = (jnp.arange(n) >= cfg.delay_samples).astype(x.dtype)
            delayed = delayed * ramp
            out = x * cfg.path1_gain * h1_mag + delayed * cfg.path2_gain * jnp.abs(h2)
        else:
            out = x * h1_mag
    elif cfg.multipath_enabled and cfg.delay_samples > 0:
        delayed = jnp.roll(x, cfg.delay_samples, axis=-1)
        ramp = (jnp.arange(n) >= cfg.delay_samples).astype(x.dtype)
        out = x * cfg.path1_gain + delayed * ramp * cfg.path2_gain

    if cfg.noise_enabled:
        out = out + noise_std * jax.random.normal(k_noise, x.shape, jnp.float32)

    if cfg.cfo_enabled and abs(cfg.cfo_hz) > 1e-3:
        out = _apply_cfo(out, cfg)

    return ChannelResult(out, h1_mag)


def _apply_cfo(samples: jnp.ndarray, cfg: ChannelConfig) -> jnp.ndarray:
    """Mix to baseband at 1500 Hz, rotate by CFO, mix back (:182-241)."""
    fc = 1500.0
    fs = cfg.sample_rate
    n = samples.shape[-1]
    t = jnp.arange(n, dtype=jnp.float32) / fs
    mix = 2.0 * jnp.pi * fc * t
    i_bb = samples * jnp.cos(mix)
    q_bb = samples * jnp.sin(mix)

    # 48-sample trailing moving average (reference's cheap lowpass).
    win = 48
    kern = jnp.ones(win, jnp.float32)
    def mavg(v):
        c = jnp.cumsum(v, axis=-1)
        zero = jnp.zeros(v.shape[:-1] + (1,), v.dtype)
        cs = jnp.concatenate([zero, c], axis=-1)
        idx = jnp.arange(n)
        lo = jnp.maximum(idx + 1 - win, 0)
        span = jnp.minimum(idx + 1, win).astype(v.dtype)
        return (cs[..., idx + 1] - cs[..., lo]) / span
    del kern
    i_f = mavg(i_bb)
    q_f = mavg(q_bb)

    ph = 2.0 * jnp.pi * cfg.cfo_hz * jnp.arange(n, dtype=jnp.float32) / fs
    c, s = jnp.cos(ph), jnp.sin(ph)
    i_cfo = i_f * c - q_f * s
    q_cfo = i_f * s + q_f * c
    return 2.0 * (i_cfo * jnp.cos(mix) - q_cfo * jnp.sin(mix))
