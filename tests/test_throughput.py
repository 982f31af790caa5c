"""Throughput acceptance: every operating point meets or beats the
reference's published bps (BASELINE.md rows; reference README.md:66-99),
and the mode ladder engages the reference's modes at the reference's SNRs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def test_operating_points_meet_reference_net():
    """THE throughput acceptance: NET steady payload bps (real TX chain,
    preambles/headers/padding included, at the burst group / MC profile /
    code rate this framework's own tables negotiate at the row's SNR) must
    meet or beat the reference's published GROSS bps for every row
    (tolerance 0.5% for the reference's own round-ups).  Asserting net —
    not capacity arithmetic — means regressions in preamble share, group
    negotiation, record overhead, or padding fail CI."""
    import tools.throughput_test as tt

    rows = tt.measure_rows()
    bad = [(r["name"], r["steady_desc"], round(r["net_ratio"], 3))
           for r in rows if r["net_ratio"] < 0.995]
    assert not bad, f"operating points below reference at NET level: {bad}"
    assert len(rows) == 12
    # Gross sanity: capacity math never below the reference either.
    gbad = [(r["name"], round(r["ratio"], 3)) for r in rows if r["ratio"] < 0.995]
    assert not gbad, f"gross capacity below reference: {gbad}"


def test_qam16_r12_sparse_pilots_decode():
    """The 56+3 pilot layout backing the QAM16 R1/2 row (README.md:80
    capacity) must actually decode across its engagement envelope: the
    selection tables only negotiate QAM16 R1/2 in the near-AWGN class
    (fading < 0.15, snr 18-22 — wave/selection.py), so the pilots' real job
    is common-phase tracking under residual CFO, not fading tracking."""
    from dataclasses import replace

    from ria_tpu.phy.frame_v2 import DataFrame, WaveformMode, make_fixed_data_frame
    from ria_tpu.sim import apply_channel, awgn
    from ria_tpu.wave.api import create_waveform

    wf = create_waveform(WaveformMode.OFDM_CHIRP, "QAM16", "R1_2")
    assert wf.cfg.num_data_carriers == 56  # 3 pilots at spacing 20
    payload = bytes(range(100))
    frame = make_fixed_data_frame("W1AW", "VE3ABC", 2, payload, "R1_2")
    cfo_ch = replace(awgn(18.0), cfo_hz=5.0, cfo_enabled=True)
    for ch, seed in [(awgn(18.0), 3), (cfo_ch, 4)]:
        tx = wf.tx_frame(frame.serialize())
        audio = np.concatenate([np.zeros(3000, np.float32), tx,
                                np.zeros(4000, np.float32)])
        out = np.asarray(apply_channel(jnp.asarray(audio),
                                       jax.random.PRNGKey(seed), ch).samples)
        rx = wf.rx_frame(out)
        assert rx.ok, f"QAM16 R1/2 sparse pilots failed on {ch}"
        g = DataFrame.deserialize(rx.frame_bytes)
        assert g.payload[: len(payload)] == payload


def test_snr_estimator_convention():
    """Measured SNR must track the simulator's definition (noise sized from
    whole-frame rms) within ~0.7 dB across the ladder's decision range —
    a 1.7 dB bias previously under-negotiated modes one rung down."""
    from ria_tpu.phy.frame_v2 import ConnectFrame, FrameType
    from ria_tpu.sim import apply_channel, awgn
    from ria_tpu.wave.api import MCDPSKWaveform

    fb = ConnectFrame(type=FrameType.CONNECT, seq=1, src_callsign="W1AW",
                      dst_callsign="VE3ABC").serialize()
    for true_snr in (10.0, 18.0, 25.0):
        wf = MCDPSKWaveform(modulation="DBPSK", rate="R1_4")
        tx = wf.tx_frame(fb)
        audio = np.concatenate([np.zeros(30000, np.float32), tx,
                                np.zeros(4000, np.float32)])
        out = np.asarray(apply_channel(jnp.asarray(audio), jax.random.PRNGKey(1),
                                       awgn(true_snr)).samples)
        rx = wf.rx_frame(out)
        assert rx.ok
        assert abs(rx.snr_db - true_snr) < 0.7, (true_snr, rx.snr_db)
