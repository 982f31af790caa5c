"""LDPC bit-compatibility and decode-performance tests.

Golden vectors in tests/golden/ldpc_golden.txt were produced by compiling the
read-only reference implementation (tools/make_golden.sh); the encoder here
must match them byte-for-byte, which transitively pins the MT19937 stream and
the whole H-matrix construction.
"""

import pathlib

import numpy as np
import pytest

from ria_tpu.fec import CODE_PARAMS, LDPCCodec, get_code
from ria_tpu.fec.ldpc import make_decoder, make_encoder
from ria_tpu.utils.bits import bytes_to_bits
from ria_tpu.utils.mt19937 import MT19937

GOLDEN = pathlib.Path(__file__).parent / "golden" / "ldpc_golden.txt"


def _golden_vectors():
    out = {}
    for line in GOLDEN.read_text().splitlines():
        parts = line.split()
        if len(parts) == 5 and parts[1] == "in" and parts[3] == "out":
            out[parts[0]] = (bytes.fromhex(parts[2]), bytes.fromhex(parts[4]))
    return out


def test_mt19937_matches_cpp():
    # First few outputs of std::mt19937 seeded with 5489 (the documented
    # default sequence; value 10000th draw == 4123659995 is the canonical
    # C++ standard test vector).
    rng = MT19937(5489)
    draws = [rng() for _ in range(10000)]
    assert draws[9999] == 4123659995


@pytest.mark.parametrize("rate", list(CODE_PARAMS))
def test_encoder_matches_reference_golden(rate):
    golden = _golden_vectors()
    if rate not in golden:
        pytest.skip("no golden vector")
    data, expected = golden[rate]
    codec = LDPCCodec(rate)
    assert codec.encode(data) == expected


@pytest.mark.parametrize("rate", list(CODE_PARAMS))
def test_roundtrip_clean(rate):
    codec = LDPCCodec(rate)
    data = bytes(range(40))
    coded = codec.encode(data)
    ok, decoded = codec.decode_hard(coded)
    assert ok
    assert decoded[: len(data)] == data


@pytest.mark.parametrize("rate,snr_db", [("R1_4", 1.0), ("R1_2", 7.0), ("R3_4", 9.0)])
def test_decode_with_noise(rate, snr_db):
    """Soft decode survives AWGN-equivalent LLR noise at moderate Eb/N0."""
    code = get_code(rate)
    rng = np.random.default_rng(0)
    B = 16
    info = rng.integers(0, 2, size=(B, code.k)).astype(np.uint8)
    coded = np.asarray(make_encoder(rate)(info))
    # BPSK over AWGN: llr = 2*y/sigma^2, y = (1-2b) + noise
    sigma = 10 ** (-snr_db / 20)
    y = (1.0 - 2.0 * coded) + rng.normal(0, sigma, size=coded.shape)
    llr = 2.0 * y / sigma**2
    result = make_decoder(rate)(llr.astype(np.float32))
    assert np.asarray(result.success).mean() >= 0.85
    # Near threshold BP can occasionally converge to a *different* valid
    # codeword (undetected error, caught by the frame CRC in the protocol
    # layer) — so require near-perfect but not exact bit agreement.
    ok = np.asarray(result.success)
    agreement = (np.asarray(result.info_bits)[ok] == info[ok]).mean()
    assert agreement >= 0.99


def test_batched_decode_shapes():
    codec = LDPCCodec("R1_4")
    data = b"hello world, this is a multi-block payload for ldpc!" * 2
    coded = codec.encode(data)
    ok, decoded = codec.decode_hard(coded)
    assert ok
    assert decoded[: len(data)] == data


def test_r14_bytes_per_codeword():
    # Protocol contract: R1/4 codeword carries 20 usable bytes (162 bits).
    code = get_code("R1_4")
    assert code.k == 162 and code.n == 648


def test_decode_candidates_bounded_allocation(monkeypatch):
    """The CRC-aided candidate search is bounded (VERDICT r2 item 10):
    the single device call sees at most 29 rows per codeword (116 for a
    4-CW frame, ~0.3 MB) and scales DOWN when fewer codewords failed."""
    import ria_tpu.fec.ldpc as L

    seen = {}
    real = L.decode_batch

    def spy(llrs, factors, rate, max_iters=None):
        seen["rows"] = llrs.shape[0]
        return real(llrs, factors, rate, max_iters)

    monkeypatch.setattr(L, "decode_batch", spy)
    rng = np.random.default_rng(0)
    llrs = rng.normal(0, 4, (4, 648)).astype(np.float32)
    L.decode_candidates(llrs, "R1_4", num_failed=4)
    worst = seen["rows"]
    assert worst == len(L.candidate_plan(4)) * 4
    assert worst <= 29 * 4
    L.decode_candidates(llrs, "R1_4", num_failed=0)
    assert seen["rows"] < worst  # fewer probes when the primary decode held
