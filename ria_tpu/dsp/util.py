"""Small DSP utilities (rms/peak/normalize/dB), jnp-first.

Parity surface: reference include/ultra/dsp.hpp:183-204.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms(x: jnp.ndarray, axis=-1) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean(jnp.square(x), axis=axis))


def peak(x: jnp.ndarray, axis=-1) -> jnp.ndarray:
    return jnp.max(jnp.abs(x), axis=axis)


def normalize_rms(x: jnp.ndarray, target_rms: float = 0.25, axis=-1) -> jnp.ndarray:
    r = rms(x, axis=axis)
    scale = jnp.where(r > 1e-9, target_rms / jnp.maximum(r, 1e-9), 1.0)
    return x * jnp.expand_dims(scale, axis)


def db_to_linear(db):
    return 10.0 ** (db / 20.0)


def linear_to_db(lin):
    return 20.0 * jnp.log10(jnp.maximum(lin, 1e-12))
