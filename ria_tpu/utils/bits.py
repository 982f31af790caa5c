"""Bit packing/unpacking helpers (MSB-first, matching the reference wire order).

The reference framework serializes bytes MSB-first everywhere (e.g.
src/fec/ldpc_encoder.cpp:145-148).  These helpers exist in two flavours:
numpy (host-side framing) and jnp (inside jitted pipelines).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def bytes_to_bits(data: bytes | np.ndarray) -> np.ndarray:
    """Bytes -> uint8 bit array, MSB first."""
    arr = np.frombuffer(bytes(data), dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    return np.unpackbits(arr)


def bits_to_bytes(bits: np.ndarray) -> bytes:
    """uint8/bool bit array (MSB first) -> bytes. Pads the tail with zeros."""
    bits = np.asarray(bits).astype(np.uint8)
    return np.packbits(bits).tobytes()


def jnp_bits_to_bytes_array(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., 8*k] bits -> [..., k] uint8, MSB first (jittable)."""
    shape = bits.shape[:-1] + (bits.shape[-1] // 8, 8)
    weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.uint8)
    grouped = bits.reshape(shape).astype(jnp.uint8)
    return jnp.sum(grouped * weights, axis=-1).astype(jnp.uint8)


def jnp_bytes_to_bits(b: jnp.ndarray) -> jnp.ndarray:
    """[..., k] uint8 -> [..., 8*k] bits, MSB first (jittable)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (b[..., None] >> shifts) & 1
    return bits.reshape(b.shape[:-1] + (b.shape[-1] * 8,))
