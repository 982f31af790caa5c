"""Single-carrier DPSK tests: Barker sync + decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ria_tpu.fec import LDPCCodec
from ria_tpu.sim import apply_channel, awgn
from ria_tpu.utils.bits import bytes_to_bits
from ria_tpu.wave.dpsk import DPSKConfig, demodulate, find_preamble, tx_frame


@pytest.mark.parametrize("bps,snr_db", [(1, 0.0), (2, 6.0), (3, 12.0)])
def test_dpsk_loopback(bps, snr_db):
    cfg = DPSKConfig(bits_per_symbol=bps, samples_per_symbol=512)
    codec = LDPCCodec("R1_4")
    payload = b"DPSK single carrier!"
    bits = bytes_to_bits(codec.encode(payload))
    tx = tx_frame(bits, cfg)
    lead = 3000
    audio = np.concatenate([np.zeros(lead, np.float32), tx, np.zeros(3000, np.float32)])
    out = np.asarray(apply_channel(jnp.asarray(audio), jax.random.PRNGKey(bps),
                                   awgn(snr_db)).samples)
    sync = find_preamble(jnp.asarray(out), cfg)
    assert bool(sync.detected), f"no barker sync (corr={float(sync.corr):.2f})"
    expected = lead + cfg.preamble_samples
    assert abs(int(sync.data_start) - expected) <= cfg.samples_per_symbol // 4
    res = demodulate(jnp.asarray(out[int(sync.data_start):]), cfg, len(bits))
    ok, decoded = codec.decode_soft(np.asarray(res.soft_bits))
    assert ok, f"decode failed bps={bps} at {snr_db} dB"
    assert decoded[: len(payload)] == payload
