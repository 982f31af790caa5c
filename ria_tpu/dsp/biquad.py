"""Biquad IIR filters and AGC (batched, scan-free where possible).

Coefficient formulas match the reference RBJ-style designs
(src/dsp/filters.cpp:108-172); the recurrence is evaluated with a
lax.scan (short state, sequential by nature) or transposed-direct-form
carried state for streaming blocks.  AGC matches filters.cpp:195-224.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BiquadCoeffs:
    b0: float
    b1: float
    b2: float
    a1: float
    a2: float


def _rbj(freq: float, q: float, fs: float):
    w0 = 2.0 * np.pi * freq / fs
    alpha = np.sin(w0) / (2.0 * q)
    return w0, alpha, np.cos(w0)


def lowpass(freq: float, q: float, fs: float) -> BiquadCoeffs:
    w0, alpha, c = _rbj(freq, q, fs)
    a0 = 1.0 + alpha
    return BiquadCoeffs(((1 - c) / 2) / a0, (1 - c) / a0, ((1 - c) / 2) / a0,
                        (-2 * c) / a0, (1 - alpha) / a0)


def highpass(freq: float, q: float, fs: float) -> BiquadCoeffs:
    w0, alpha, c = _rbj(freq, q, fs)
    a0 = 1.0 + alpha
    return BiquadCoeffs(((1 + c) / 2) / a0, -(1 + c) / a0, ((1 + c) / 2) / a0,
                        (-2 * c) / a0, (1 - alpha) / a0)


def bandpass(freq: float, q: float, fs: float) -> BiquadCoeffs:
    w0, alpha, c = _rbj(freq, q, fs)
    a0 = 1.0 + alpha
    return BiquadCoeffs(alpha / a0, 0.0, -alpha / a0, (-2 * c) / a0, (1 - alpha) / a0)


def notch(freq: float, q: float, fs: float) -> BiquadCoeffs:
    w0, alpha, c = _rbj(freq, q, fs)
    a0 = 1.0 + alpha
    return BiquadCoeffs(1.0 / a0, (-2 * c) / a0, 1.0 / a0, (-2 * c) / a0, (1 - alpha) / a0)


def biquad_filter(x: jnp.ndarray, c: BiquadCoeffs, state=None):
    """Transposed direct form II over the last axis; returns (y, state).

    state: (z1, z2) arrays broadcastable to x[..., 0].
    """
    if state is None:
        z = jnp.zeros(x.shape[:-1], x.dtype)
        state = (z, z)

    def step(carry, xi):
        z1, z2 = carry
        y = c.b0 * xi + z1
        z1n = c.b1 * xi - c.a1 * y + z2
        z2n = c.b2 * xi - c.a2 * y
        return (z1n, z2n), y

    xt = jnp.moveaxis(x, -1, 0)
    state, yt = jax.lax.scan(step, state, xt)
    return jnp.moveaxis(yt, 0, -1), state


def agc(x: jnp.ndarray, target: float = 0.5, attack: float = 0.01,
        decay: float = 0.001, gain0: float = 1.0):
    """Per-sample AGC recurrence (filters.cpp:195-211); returns (y, gain)."""

    def step(gain, xi):
        level = jnp.abs(xi) * gain
        gain = jnp.where(level > target,
                         gain - attack * (level - target),
                         gain + decay * (target - level))
        gain = jnp.clip(gain, 0.001, 1000.0)
        return gain, xi * gain

    xt = jnp.moveaxis(x, -1, 0)
    g0 = jnp.full(x.shape[:-1], gain0, x.dtype)
    gain, yt = jax.lax.scan(step, g0, xt)
    return jnp.moveaxis(yt, 0, -1), gain
