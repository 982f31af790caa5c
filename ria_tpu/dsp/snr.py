"""Spectral SNR estimation from received audio.

The reference does not actually measure SNR on the DPSK handshake path: in
simulation it feeds the *known* channel SNR straight into the protocol
(src/gui/app.cpp:309-316, "DPSK doesn't measure SNR"), and its waveform
selection tables were calibrated against the simulator's SNR definition
(noise_std = signal_rms * 10^(-SNR/20), white over the full 48 kHz band —
src/sim/hf_channel.hpp:125-128).

Here we measure it instead: Welch-averaged periodogram, noise floor from
out-of-band bins (the SSB signal occupies <2.8 kHz of the 24 kHz Nyquist
band, so 4-20 kHz is noise-only), in-band signal power as the above-floor
excess.  Reported SNR uses the same full-band-noise convention the
selection tables expect.  Unlike the differential-phase-variance estimate
(which floors at ~13 dB from inter-carrier leakage), this tracks SNR from
below -14 dB to 30+ dB, so mode negotiation can reach the coherent-QAM
rates without sim-truth side channels.
"""

from __future__ import annotations

import numpy as np

_window_cache: dict[int, np.ndarray] = {}


def _blackman_harris(n: int) -> np.ndarray:
    # 4-term Blackman-Harris: -92 dB sidelobes, so a 30 dB-above-noise
    # in-band signal leaks negligibly into the noise measurement region
    # (Hann's -31 dB first sidelobe biased the floor ~3 dB at high SNR).
    k = np.arange(n)
    a = (0.35875, 0.48829, 0.14128, 0.01168)
    return (a[0] - a[1] * np.cos(2 * np.pi * k / n)
            + a[2] * np.cos(4 * np.pi * k / n)
            - a[3] * np.cos(6 * np.pi * k / n))


def spectral_snr_db(audio: np.ndarray, fs: float = 48000.0,
                    signal_band: tuple[float, float] = (300.0, 2800.0),
                    noise_band: tuple[float, float] = (8000.0, 22000.0),
                    nfft: int = 4096) -> float:
    """Estimate full-band-noise SNR of a bandlimited signal in white noise.

    audio: real samples containing (mostly) the frame of interest.
    Returns 10*log10(P_signal / P_noise_total) with P_noise_total the noise
    power over the whole Nyquist band — the simulator's SNR definition.
    """
    x = np.asarray(audio, np.float64)
    hop = nfft // 2
    n_seg = max((len(x) - nfft) // hop + 1, 1)
    if len(x) < nfft:
        x = np.pad(x, (0, nfft - len(x)))
    idx = np.arange(nfft)[None, :] + hop * np.arange(n_seg)[:, None]
    segs = x[idx]
    win = _window_cache.get(nfft)
    if win is None:
        win = _blackman_harris(nfft)
        _window_cache[nfft] = win
    per_seg = np.abs(np.fft.rfft(segs * win, axis=-1)) ** 2

    freqs = np.fft.rfftfreq(nfft, 1.0 / fs)
    nz = (freqs >= noise_band[0]) & (freqs <= noise_band[1])
    sg = (freqs >= signal_band[0]) & (freqs <= signal_band[1])
    # Noise floor: median across segments per bin (robust to the frame's
    # on/off transients — one wideband segment must not lift the floor),
    # then median over noise bins (robust to narrowband interferers).
    # chi^2_2 median = ln(2) * mean — undo the bias.
    if n_seg > 2:
        noise_psd = np.median(per_seg[:, nz], axis=0) / np.log(2.0)
    else:
        noise_psd = np.mean(per_seg[:, nz], axis=0)
    noise_bin = float(np.median(noise_psd)) if nz.any() else float(np.mean(per_seg))
    noise_bin = max(noise_bin, 1e-30)

    # Signal power: plain mean across segments (the signal is not
    # exponential-distributed, and its transients are signal energy).
    psd_sig = np.mean(per_seg[:, sg], axis=0)
    sig_power = float(np.sum(np.maximum(psd_sig - noise_bin, 0.0)))
    total_noise = noise_bin * len(freqs)
    if sig_power <= 0.0:
        return -30.0
    return float(np.clip(10.0 * np.log10(sig_power / total_noise), -30.0, 50.0))
