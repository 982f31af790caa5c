"""Audio engine, CAT controller, monitor, channel probe tests."""

import numpy as np
import pytest

from ria_tpu.runtime.audio import AudioEngine, LoopbackBackend, FileBackend, BLOCK_SAMPLES
from ria_tpu.runtime.cat import CatController, NullBackend
from ria_tpu.runtime.monitor import waterfall, ConstellationBuffer
from ria_tpu.phy.channel_probe import ChannelEstimate, ChannelReport, estimate_channel


def test_audio_loopback():
    got = []
    eng = AudioEngine(LoopbackBackend(), rx_callback=lambda b: got.append(b))
    eng.start()
    tone = np.sin(2 * np.pi * 1000 * np.arange(4096) / 48000).astype(np.float32)
    eng.queue_tx(tone)
    for _ in range(4):
        eng.process_block()
    eng.stop()
    out = np.concatenate(got)
    assert np.allclose(out, tone[: len(out)], atol=1e-6)


def test_audio_file_backend(tmp_path):
    rx_path = tmp_path / "rx.f32"
    tx_path = tmp_path / "tx.f32"
    ref = np.arange(2048, dtype=np.float32)
    ref.tofile(rx_path)
    got = []
    eng = AudioEngine(FileBackend(str(rx_path), str(tx_path)),
                      rx_callback=lambda b: got.append(b))
    eng.queue_tx(np.ones(BLOCK_SAMPLES, np.float32))
    eng.process_block()
    eng.process_block()
    eng.stop()
    assert np.array_equal(np.concatenate(got), ref)
    assert np.fromfile(tx_path, np.float32)[:BLOCK_SAMPLES].sum() == BLOCK_SAMPLES


def test_cat_ptt_sequencing():
    cat = CatController(NullBackend(), ptt_lead_ms=100, ptt_tail_ms=50)
    assert not cat.ptt
    cat.request_tx()
    assert cat.ptt and not cat.tx_ready  # lead delay
    cat.tick(100, tx_active=True)
    assert cat.tx_ready
    cat.tick(100, tx_active=True)
    assert cat.ptt
    # TX ends -> tail then release
    cat.tick(30, tx_active=False)
    assert cat.ptt
    cat.tick(30, tx_active=False)
    assert not cat.ptt


def test_waterfall_shows_tone():
    t = np.arange(48000) / 48000.0
    x = np.sin(2 * np.pi * 1500 * t).astype(np.float32)
    db, freqs = waterfall(x)
    assert db.shape[0] > 10
    peak_bin = np.argmax(db.mean(axis=0))
    assert abs(freqs[peak_bin] - 1500.0) < 50.0


def test_constellation_buffer():
    cb = ConstellationBuffer(max_symbols=10)
    cb.push(np.ones(20, np.complex64))
    assert len(cb.snapshot()) == 10


def test_channel_report_wire():
    r = ChannelReport(snr_db=15.0, delay_spread_ms=1.2, doppler_spread_hz=0.5,
                      recommended_mode=2, capabilities=0x3F)
    g = ChannelReport.decode(r.encode())
    assert abs(g.snr_db - 15.0) < 0.2
    assert abs(g.delay_spread_ms - 1.2) < 0.1
    assert abs(g.doppler_spread_hz - 0.5) < 0.1
    assert g.recommended_mode == 2


def test_channel_classification():
    assert ChannelEstimate(20, 0.5, 0.1).condition_name == "Good"
    assert ChannelEstimate(20, 1.0, 0.5).condition_name == "Moderate"
    assert ChannelEstimate(20, 2.0, 1.0).condition_name == "Poor"
    assert ChannelEstimate(20, 0.5, 10.0).condition_name == "Flutter"
    assert ChannelEstimate(20, 0.5, 0.1).recommended_mode() == "OTFS_EQ"
    assert ChannelEstimate(20, 1.0, 0.5).recommended_mode() == "OFDM"
    # Poor routes to equalized OTFS here (see channel_probe.recommended_mode
    # docstring for the measured deviation from the reference's OTFS_RAW).
    assert ChannelEstimate(20, 2.0, 1.0).recommended_mode() == "OTFS_EQ"


def test_estimate_channel_detects_delay():
    """Two-tap channel should show measurable delay spread."""
    rng = np.random.default_rng(0)
    C = 59
    spacing = 46.875
    # Frequency response of a 2-tap channel: 1 + a*exp(-j 2 pi f tau)
    tau = 1.0e-3  # 1 ms
    f = np.arange(C) * spacing
    h = 1.0 + 0.9 * np.exp(-2j * np.pi * f * tau)
    h_per_sym = np.tile(h, (4, 1))
    est = estimate_channel(h_per_sym, spacing, 1120 / 48000.0)
    assert est.delay_spread_ms > 0.2, est.delay_spread_ms
    flat = estimate_channel(np.ones((4, C), complex), spacing, 1120 / 48000.0)
    assert flat.delay_spread_ms < 0.1

def test_estimate_mc_dpsk_classifies_presets():
    """The handshake channel probe (OFDM<->OTFS routing input) must read
    the Watterson presets' two-path separation off a decoded CONNECT frame:
    the |H|^2 carrier ripple is sync-lock invariant, so the delay estimate
    pins each ITU-R class; Doppler only needs to stay out of the >= 2 Hz
    (Poor/Flutter) band for slow channels."""
    import jax
    import jax.numpy as jnp

    from ria_tpu.phy.channel_probe import estimate_mc_dpsk
    from ria_tpu.phy.frame_v2 import ConnectFrame, FrameType
    from ria_tpu.sim import PRESETS, apply_channel
    from ria_tpu.wave.api import MCDPSKWaveform

    fb = ConnectFrame(type=FrameType.CONNECT, seq=1, src_callsign="W1AW",
                      dst_callsign="VE3ABC").serialize()
    wf = MCDPSKWaveform(modulation="DBPSK", rate="R1_4")
    tx = wf.tx_frame(fb)

    def probe(preset, seed):
        ch = PRESETS[preset](16.0)
        audio = np.concatenate([np.zeros(20000, np.float32), tx,
                                np.zeros(4000, np.float32)])
        out = np.asarray(apply_channel(jnp.asarray(audio),
                                       jax.random.PRNGKey(seed), ch).samples)
        sync = wf.detect_sync(out)
        assert sync is not None
        _, res = wf._demod_bits(out, sync["start"], sync["cfo_hz"], 648)
        return estimate_mc_dpsk(np.asarray(res.zsym), wf.cfg, 16.0)

    for seed in (0, 1):
        awgn_est = probe("awgn", seed)
        assert awgn_est.delay_spread_ms == 0.0 and awgn_est.doppler_spread_hz == 0.0
        g = probe("good", seed)
        assert 0.25 < g.delay_spread_ms < 0.75, g
        m = probe("moderate", seed)
        assert 0.75 <= m.delay_spread_ms < 1.5, m
        p = probe("poor", seed)
        assert p.delay_spread_ms >= 1.5, p
        assert p.condition_name in ("Poor", "Flutter")
        f = probe("flutter", seed)
        assert f.doppler_spread_hz >= 2.0, f
