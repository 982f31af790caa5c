"""Pallas LDPC BP kernel vs the XLA matmul decoder (interpret mode on CPU).

The kernel's Mosaic compilation + throughput are exercised on real TPU by
tools/pallas_bench.py; here the interpreter validates that the per-degree-
slot kernel computes the same normalized min-sum BP as fec/ldpc.py.
"""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def decoders():
    from ria_tpu.fec.ldpc import make_decoder, make_encoder
    from ria_tpu.fec.ldpc_pallas import make_pallas_decoder

    rate = "R1_2"
    return (make_pallas_decoder(rate, tile=8, max_iters=30, interpret=True),
            make_decoder(rate, max_iters=30), make_encoder(rate), rate)


def test_pallas_matches_xla_clean(decoders):
    pdec, xdec, enc, rate = decoders
    from ria_tpu.fec.ldpc_matrix import get_code

    code = get_code(rate)
    rng = np.random.default_rng(7)
    info = rng.integers(0, 2, (8, code.k)).astype(np.uint8)
    coded = np.asarray(enc(info))
    llr = ((1 - 2.0 * coded) * 8.0).astype(np.float32)
    r = pdec(jax.numpy.asarray(llr))
    assert np.asarray(r.success).all()
    assert (np.asarray(r.info_bits) == info).all()
    assert (np.asarray(r.iterations) >= 1).all()


def test_pallas_matches_xla_noisy(decoders):
    pdec, xdec, enc, rate = decoders
    from ria_tpu.fec.ldpc_matrix import get_code

    code = get_code(rate)
    rng = np.random.default_rng(3)
    info = rng.integers(0, 2, (16, code.k)).astype(np.uint8)
    coded = np.asarray(enc(info)).astype(np.float64)
    sigma = 10 ** (-2.0 / 20)
    y = (1 - 2.0 * coded) + rng.normal(0, sigma, coded.shape)
    llr = (2 * y / sigma**2).astype(np.float32)
    r = pdec(jax.numpy.asarray(llr))
    rx = xdec(jax.numpy.asarray(llr))
    ps, xs = np.asarray(r.success), np.asarray(rx.success)
    # identical message schedule => identical convergence set and bits
    assert (ps == xs).all()
    both = ps & xs
    assert both.any()
    assert (np.asarray(r.info_bits)[both] == np.asarray(rx.info_bits)[both]).all()
    assert (np.asarray(r.iterations)[both] == np.asarray(rx.iterations)[both]).all()
