"""Chase-combining cache tests (mirrors reference tools/test_chase_cache.cpp:
cache ops + LLR combining rescues decodes at low SNR)."""

import numpy as np

from ria_tpu.fec import get_code
from ria_tpu.fec.chase import ChaseCache, ChaseKey
from ria_tpu.fec.ldpc import make_decoder, make_encoder


def test_cache_ops():
    c = ChaseCache(max_entries=2, entry_ttl_s=30.0)
    k1 = ChaseKey(1, 0xAAA, 0xBBB)
    soft = np.ones(648, np.float32)
    assert c.store(k1, 0, soft, total_cw=4, frame_type=0x30)
    got = c.get_combined(k1, 0)
    assert got is not None and np.allclose(got, soft)
    # combine adds
    assert c.store(k1, 0, soft * 2, total_cw=4, frame_type=0x30)
    assert np.allclose(c.get_combined(k1, 0), soft * 3)
    assert c.get_combine_count(k1, 0) == 2
    # decoded CWs stop combining
    c.mark_decoded(k1, 0)
    assert not c.store(k1, 0, soft, 4, 0x30)
    # eviction at max_entries
    c.store(ChaseKey(2, 1, 1), 0, soft, 4, 0x30)
    c.store(ChaseKey(3, 1, 1), 0, soft, 4, 0x30)
    assert len(c) <= 2


def test_max_combines():
    c = ChaseCache()
    k = ChaseKey(5, 1, 2)
    soft = np.ones(648, np.float32)
    for i in range(6):
        c.store(k, 0, soft, 4, 0x30)
    assert c.get_combine_count(k, 0) == 4  # capped


def test_chase_combining_rescues_decode():
    """Two failed receptions at low SNR combine into a successful decode."""
    rate = "R1_2"
    code = get_code(rate)
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, size=(1, code.k)).astype(np.uint8)
    coded = np.asarray(make_encoder(rate)(info))[0]
    decoder = make_decoder(rate)

    snr_db = 2.0  # well below the ~6 dB single-shot threshold for R1/2
    sigma = 10 ** (-snr_db / 20)

    cache = ChaseCache()
    key = ChaseKey(7, 0x111, 0x222)

    successes_single = 0
    successes_combined = 0
    trials = 6
    for t in range(trials):
        cache.remove(key)
        llrs = []
        for rx in range(2):
            y = (1.0 - 2.0 * coded) + rng.normal(0, sigma, coded.shape)
            llr = (2.0 * y / sigma**2).astype(np.float32)
            llrs.append(llr)
        r1 = decoder(llrs[0][None])
        successes_single += int(bool(np.asarray(r1.success)[0]))
        cache.store(key, 0, llrs[0], 1, 0x30)
        cache.store(key, 0, llrs[1], 1, 0x30)
        combined = cache.get_combined(key, 0)
        r2 = decoder(combined[None])
        successes_combined += int(bool(np.asarray(r2.success)[0]))

    assert successes_combined > successes_single
    assert successes_combined >= trials - 1, (successes_single, successes_combined)


def test_ofdm_fixed_frame_chase_combining():
    """OFDM fixed frames chase-combine across retransmissions (reference
    gets ~3 dB/doubling on every waveform, chase_cache.hpp:27-168): two
    transmissions that EACH fail to decode at Moderate 9 dB combine to a
    validated frame.  All 4 CWs accumulate — per-CW parity is not
    acceptance for fixed frames (the retry ladder regularly converges to
    parity-valid neighbours that the frame CRC rejects)."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ria_tpu.fec.chase import ChaseCache
    from ria_tpu.phy.frame_v2 import WaveformMode, make_fixed_data_frame
    from ria_tpu.sim import PRESETS, apply_channel
    from ria_tpu.wave.api import create_waveform

    wf = create_waveform(WaveformMode.OFDM_CHIRP, "DQPSK", "R1_2")
    fb = make_fixed_data_frame("W1AW", "VE3ABC", 7, bytes(range(100)),
                               "R1_2").serialize()
    tx = wf.tx_frame(fb, light=True)

    def rx(seed, chase):
        audio = np.concatenate([np.zeros(3000, np.float32), tx,
                                np.zeros(4000, np.float32)])
        out = np.asarray(apply_channel(jnp.asarray(audio),
                                       jax.random.PRNGKey(seed),
                                       PRESETS["moderate"](9.0)).samples)
        return wf.rx_frame(out, light=True, chase=chase)

    # Seed pairs where both single transmissions fail standalone.
    pairs = [(8000, 8003), (8003, 8012), (8003, 8015)]
    rescued = 0
    for s1, s2 in pairs:
        assert not rx(s1, None).ok and not rx(s2, None).ok, (s1, s2)
        chase = ChaseCache()
        rx(s1, chase)
        r2 = rx(s2, chase)
        if r2.ok and chase.stats.recoveries > 0:
            rescued += 1
            assert r2.frame_bytes == fb
    assert rescued >= 2, f"only {rescued}/3 pairs chase-rescued"
