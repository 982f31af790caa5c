"""Native C++ runtime component tests (build on demand; skip if no g++)."""

import numpy as np
import pytest

from ria_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_ring_buffer_spsc():
    rb = native.NativeRingBuffer(1000)
    x = np.arange(600, dtype=np.float32)
    assert rb.write(x) == 600
    assert len(rb) == 600
    got = rb.read(100)
    assert np.array_equal(got, x[:100])
    assert len(rb) == 500
    # overflow accounting
    assert rb.write(np.zeros(2000, np.float32)) == 500
    assert rb.overflows == 1500
    # peek doesn't consume
    p = rb.peek(50)
    assert len(rb) == 1000 and len(p) == 50
    rb.consume(1000)
    assert len(rb) == 0


def test_native_resampler_tone():
    rs = native.NativeResampler(48000, 8000)
    t = np.arange(48000) / 48000.0
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = rs.process(x)
    assert abs(len(y) - 8000) <= 1
    spec = np.abs(np.fft.rfft(y[800:]))
    peak_hz = np.argmax(spec) * 8000 / len(y[800:])
    assert abs(peak_hz - 1000.0) < 5.0


def test_native_watterson_awgn_snr():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.3, 48000).astype(np.float32)
    ch = native.NativeWatterson(snr_db=10.0, noise=True)
    y = ch.process(x)
    noise = y - x
    snr = 10 * np.log10(np.mean(x**2) / np.mean(noise**2))
    assert abs(snr - 10.0) < 0.5


def test_native_watterson_fading_stats_match_jax():
    """The native per-sample reference model and the JAX AR(1)-scan model
    must agree statistically (mean fading power within a factor ~2)."""
    import jax
    import jax.numpy as jnp
    from ria_tpu.sim import apply_channel, ChannelConfig

    n = 48000 * 2
    x = np.ones(n, np.float32)
    nat = native.NativeWatterson(snr_db=100.0, doppler_hz=5.0, fading=True,
                                 multipath=False, noise=False)
    y_nat = nat.process(x)
    cfg = ChannelConfig(snr_db=100.0, doppler_spread_hz=5.0, multipath_enabled=False,
                        noise_enabled=False)
    y_jax = np.asarray(apply_channel(jnp.asarray(x), jax.random.PRNGKey(0), cfg).samples)
    p_nat = np.mean(y_nat[48000:] ** 2)
    p_jax = np.mean(y_jax[48000:] ** 2)
    assert 0.4 < p_nat / p_jax < 2.5, (p_nat, p_jax)


def test_native_crc_matches_python():
    from ria_tpu.phy.frame_v2 import crc16

    for data in (b"123456789", b"", b"\x00\xff" * 50):
        assert native.crc16_native(data) == crc16(data)
