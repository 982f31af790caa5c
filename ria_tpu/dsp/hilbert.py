"""FFT-based analytic signal (zero-group-delay Hilbert transform).

The reference uses a windowed-sinc FIR Hilbert in the modem path and an
FFT-based transform in its test harness (reference: src/sync/chirp_sync.hpp
notes "FFT-based Hilbert transform which has NO group delay").  On TPU the
FFT form is both faster and simpler, so it is used everywhere; CFO rotation
then happens on the complex baseband.
"""

from __future__ import annotations

import jax.numpy as jnp


def analytic_signal(x: jnp.ndarray) -> jnp.ndarray:
    """Real [..., N] -> complex analytic signal [..., N] (batched, jittable).

    Standard construction: double positive frequencies, zero negatives.
    """
    n = x.shape[-1]
    X = jnp.fft.fft(x, axis=-1)
    h = jnp.zeros(n, dtype=x.dtype)
    if n % 2 == 0:
        h = h.at[0].set(1.0).at[n // 2].set(1.0).at[1 : n // 2].set(2.0)
    else:
        h = h.at[0].set(1.0).at[1 : (n + 1) // 2].set(2.0)
    return jnp.fft.ifft(X * h, axis=-1)
