"""Dual linear-FM chirp synchronization (TPU-native FFT matched filter).

Numeric contract from the reference (src/sync/chirp_sync.hpp):
- up-chirp 300->2700 Hz over 500 ms, 100 ms gap, down-chirp 2700->300 Hz,
  100 ms gap (~1.2 s total), amplitude 0.5 (generate(): :61-108);
- detection = complex (analytic) template cross-correlation, magnitude peak,
  normalized by sqrt(sliding signal energy * template energy)
  (detectChirpTemplateFFT :627-709);
- dual-chirp CFO: correlation peaks shift by -/+ CFO*fs/chirp_rate for
  up/down chirps, so CFO = gap_error / (2*fs/chirp_rate) and the true
  up-chirp start is up_pos + CFO*fs/chirp_rate (detectDualChirp :352-512);
- reject |CFO| > 100 Hz; default threshold 0.15.

TPU redesign: the whole search window is one (batched) FFT correlation and an
argmax — there is no coarse/fine stepping; every lag is evaluated at once.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ChirpConfig:
    sample_rate: float = 48000.0
    f_start: float = 300.0
    f_end: float = 2700.0
    duration_ms: float = 500.0
    gap_ms: float = 100.0
    amplitude: float = 0.5
    use_dual_chirp: bool = True
    threshold: float = 0.15

    @property
    def chirp_samples(self) -> int:
        return int(self.sample_rate * self.duration_ms / 1000.0)

    @property
    def gap_samples(self) -> int:
        return int(self.sample_rate * self.gap_ms / 1000.0)

    @property
    def total_samples(self) -> int:
        if self.use_dual_chirp:
            return 2 * self.chirp_samples + 2 * self.gap_samples
        return self.chirp_samples + self.gap_samples

    @property
    def chirp_rate(self) -> float:
        return (self.f_end - self.f_start) / (self.duration_ms / 1000.0)

    @property
    def cfo_to_samples(self) -> float:
        """Correlation-peak shift per Hz of CFO (~10 samples/Hz)."""
        return self.sample_rate / self.chirp_rate


class ChirpSyncResult(NamedTuple):
    detected: jnp.ndarray   # bool
    start: jnp.ndarray      # int32, CFO-corrected up-chirp start
    cfo_hz: jnp.ndarray     # float32
    up_corr: jnp.ndarray    # float32
    down_corr: jnp.ndarray  # float32


def _chirp_phase(cfg: ChirpConfig, up: bool) -> np.ndarray:
    t = np.arange(cfg.chirp_samples, dtype=np.float64) / cfg.sample_rate
    k = cfg.chirp_rate
    if up:
        return 2.0 * np.pi * (cfg.f_start * t + 0.5 * k * t * t)
    return 2.0 * np.pi * (cfg.f_end * t - 0.5 * k * t * t)


@functools.lru_cache(maxsize=None)
def generate(cfg: ChirpConfig, tx_cfo_hz: float = 0.0) -> np.ndarray:
    """TX chirp sequence [up][gap][down][gap] as float32 samples."""
    t = np.arange(cfg.chirp_samples, dtype=np.float64) / cfg.sample_rate
    out = np.zeros(cfg.total_samples, dtype=np.float32)
    up = cfg.amplitude * np.sin(_chirp_phase(cfg, up=True) + 2 * np.pi * tx_cfo_hz * t)
    out[: cfg.chirp_samples] = up
    if cfg.use_dual_chirp:
        down_start = cfg.chirp_samples + cfg.gap_samples
        down = cfg.amplitude * np.sin(_chirp_phase(cfg, up=False) + 2 * np.pi * tx_cfo_hz * t)
        out[down_start : down_start + cfg.chirp_samples] = down
    return out


@functools.lru_cache(maxsize=None)
def _templates(cfg: ChirpConfig):
    """Unit-amplitude analytic templates (cos + j sin) and their energies."""
    up = np.exp(1j * _chirp_phase(cfg, up=True)).astype(np.complex64)
    down = np.exp(1j * _chirp_phase(cfg, up=False)).astype(np.complex64)
    # Template energy of the real (sin) template, as the reference normalizes
    # against its stored sin template: sum sin^2 ~= N/2.
    energy = float(np.sum(np.sin(_chirp_phase(cfg, up=True)) ** 2))
    return up, down, energy


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _norm_correlate(x: jnp.ndarray, tmpl_fft: jnp.ndarray, tmpl_energy: float,
                    chirp_len: int, nfft: int) -> jnp.ndarray:
    """Normalized correlation magnitude for every lag (batched over leading axes)."""
    X = jnp.fft.fft(x.astype(jnp.complex64), nfft)
    corr = jnp.fft.ifft(X * tmpl_fft)
    energy = jnp.cumsum(jnp.square(x), axis=-1)
    zero = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    csum = jnp.concatenate([zero, energy], axis=-1)
    n = x.shape[-1]
    num_lags = n - chirp_len
    win = csum[..., chirp_len : chirp_len + num_lags] - csum[..., :num_lags]
    denom = jnp.sqrt(jnp.maximum(win * tmpl_energy, 1e-20))
    return jnp.abs(corr[..., :num_lags]) / denom


@functools.partial(jax.jit, static_argnames=("cfg", "num_samples"))
def detect_dual_chirp(samples: jnp.ndarray, cfg: ChirpConfig, num_samples: int | None = None) -> ChirpSyncResult:
    """Detect the dual-chirp preamble in a (fixed-size) sample window.

    Returns per-window results; vmap over a leading batch axis for
    multi-channel search.  `num_samples` defaults to samples.shape[-1]
    (static under jit).
    """
    del num_samples
    n = samples.shape[-1]
    chirp_len = cfg.chirp_samples
    if n < cfg.total_samples + 64:
        # Window cannot hold the dual-chirp sequence (static shape check).
        shape = samples.shape[:-1]
        f = jnp.zeros(shape, jnp.float32)
        return ChirpSyncResult(jnp.zeros(shape, bool), jnp.full(shape, -1, jnp.int32),
                               f, f, f)
    nfft = _next_pow2(n + chirp_len)
    up_t, down_t, energy = _templates(cfg)
    up_fft = jnp.conj(jnp.fft.fft(jnp.asarray(up_t), nfft))
    down_fft = jnp.conj(jnp.fft.fft(jnp.asarray(down_t), nfft))

    up_corr = _norm_correlate(samples, up_fft, energy, chirp_len, nfft)
    num_lags = up_corr.shape[-1]
    up_pos = jnp.argmax(up_corr, axis=-1).astype(jnp.int32)
    up_val = jnp.take_along_axis(up_corr, up_pos[..., None], axis=-1)[..., 0]

    if not cfg.use_dual_chirp:
        ok = up_val >= cfg.threshold
        return ChirpSyncResult(ok, jnp.where(ok, up_pos, -1), jnp.zeros_like(up_val),
                               up_val, jnp.zeros_like(up_val))

    # Down-chirp: correlate everywhere, then mask to the window the reference
    # searches ([up+chirp/2, up+chirp+gap+10000+chirp]).
    down_corr = _norm_correlate(samples, down_fft, energy, chirp_len, nfft)
    lags = jnp.arange(num_lags, dtype=jnp.int32)
    lo = up_pos + chirp_len // 2
    hi = up_pos + chirp_len + cfg.gap_samples + 10000 + chirp_len
    mask = (lags >= lo[..., None]) & (lags <= hi[..., None])
    down_masked = jnp.where(mask, down_corr, -1.0)
    down_pos = jnp.argmax(down_masked, axis=-1).astype(jnp.int32)
    down_val = jnp.take_along_axis(down_masked, down_pos[..., None], axis=-1)[..., 0]

    expected_gap = chirp_len + cfg.gap_samples
    gap_error = (down_pos - up_pos - expected_gap).astype(jnp.float32)
    cfo = gap_error / (2.0 * cfg.cfo_to_samples)

    ok = (up_val >= cfg.threshold) & (down_val >= cfg.threshold) & (jnp.abs(cfo) <= 100.0)
    start = jnp.round(up_pos.astype(jnp.float32) + cfo * cfg.cfo_to_samples).astype(jnp.int32)
    return ChirpSyncResult(
        detected=ok,
        start=jnp.where(ok, start, -1),
        cfo_hz=jnp.where(ok, cfo, 0.0),
        up_corr=up_val,
        down_corr=down_val,
    )
