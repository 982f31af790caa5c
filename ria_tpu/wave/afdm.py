"""AFDM (Affine Frequency Division Multiplexing) via the discrete affine
Fourier transform (DAFT).

Contract from the reference (src/afdm/daft.hpp, src/afdm/afdm_config.hpp):
- DAFT basis exp(j 2 pi (c1 n^2 + c2 m^2 + m n / N)), implemented as
  chirp-multiply -> FFT -> chirp-multiply;
- documented negative finding (afdm_config.hpp:33-47): chirped AFDM (c1>0)
  is incompatible with narrowband real audio (image overlap after DSB), so
  the HF audio profile runs c1=0 — which reduces AFDM to OFDM.  We reproduce
  both the transform (for completeness/testing) and the c1=0 audio profile.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AFDMConfig:
    N: int = 64            # subcarriers / block length
    c1: float = 0.0        # quadratic chirp rate (0 => OFDM mode for HF audio)
    c2: float = 0.0
    fft_size: int = 512
    cp_len: int = 64
    sample_rate: float = 48000.0
    center_freq: float = 1500.0


def daft(x: jnp.ndarray, cfg: AFDMConfig) -> jnp.ndarray:
    """Forward DAFT along the last axis: chirp -> FFT -> chirp."""
    N = cfg.N
    n = jnp.arange(N)
    c_pre = jnp.exp(-2j * jnp.pi * cfg.c1 * n * n)
    c_post = jnp.exp(-2j * jnp.pi * cfg.c2 * n * n)
    return c_post * jnp.fft.fft(x * c_pre, axis=-1) / jnp.sqrt(N)


def idaft(y: jnp.ndarray, cfg: AFDMConfig) -> jnp.ndarray:
    """Inverse DAFT: conj-chirp -> IFFT -> conj-chirp."""
    N = cfg.N
    n = jnp.arange(N)
    c_pre = jnp.exp(2j * jnp.pi * cfg.c1 * n * n)
    c_post = jnp.exp(2j * jnp.pi * cfg.c2 * n * n)
    return c_pre * jnp.fft.ifft(y * c_post, axis=-1) * jnp.sqrt(N)


def modulate_block(symbols: np.ndarray, cfg: AFDMConfig) -> np.ndarray:
    """AFDM symbols [N] -> passband samples for one block (audio profile)."""
    time_block = np.asarray(idaft(jnp.asarray(symbols.astype(np.complex64)), cfg))
    freq = np.zeros(cfg.fft_size, np.complex64)
    freq[1 : 1 + cfg.N] = time_block
    td = np.fft.ifft(freq).astype(np.complex64)
    with_cp = np.concatenate([td[-cfg.cp_len :], td])
    t = np.arange(len(with_cp), dtype=np.float64)
    carrier = np.exp(2j * np.pi * cfg.center_freq * t / cfg.sample_rate)
    return (np.real(with_cp * carrier) * 20.0).astype(np.float32)


def demodulate_block(samples: np.ndarray, cfg: AFDMConfig) -> np.ndarray:
    """Passband block -> AFDM symbols [N] (zero CFO, known timing)."""
    t = np.arange(len(samples), dtype=np.float64)
    bb = samples.astype(np.complex64) * np.exp(-2j * np.pi * cfg.center_freq * t / cfg.sample_rate)
    core = bb[cfg.cp_len : cfg.cp_len + cfg.fft_size]
    freq = np.fft.fft(core)[1 : 1 + cfg.N]
    return np.asarray(daft(jnp.asarray(freq.astype(np.complex64)), cfg))
