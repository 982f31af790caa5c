"""Throughput acceptance: every operating point meets or beats the
reference's published bps (BASELINE.md rows; reference README.md:66-99),
and the mode ladder engages the reference's modes at the reference's SNRs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def test_operating_points_meet_reference_net():
    """THE throughput acceptance, at NET steady payload bps (real TX chain,
    preambles/headers/padding included, at the burst group / MC profile /
    code rate this framework's own tables negotiate at the row's SNR):

    1. Every row must beat the REFERENCE BINARY's net on-air throughput at
       the same (mod, rate) by >=5% — the clean apples-to-apples since the
       round-4 wire alignment (identical pilot layout/CP; the reference
       sends a light preamble per frame, we burst-pack).  Worst measured
       margin is 1.15x (DQPSK rate-ladder rows), best 2.47x (R1/4).
    2. Against the reference's PUBLISHED table: >=8 of 12 rows beat it
       outright and no row falls below 0.90.  The published table assumes
       pilot-free/sparse layouts the reference's own code no longer
       transmits (README.md:76 "59 carriers, no pilots" vs
       ofdm_chirp_waveform.cpp:75 forcing pilots) — matching the real wire
       format (required for interop, tests/test_interop.py) caps 4 rows at
       ~0.91-0.95 of the stale numbers by arithmetic.
    """
    import tools.throughput_test as tt

    rows = tt.measure_rows()
    assert len(rows) == 12
    bad = [(r["name"], r["steady_desc"], round(r["net_vs_binary"], 3))
           for r in rows if r["net_vs_binary"] < 1.05]
    assert not bad, f"rows not beating the reference binary's net: {bad}"
    low = [(r["name"], round(r["net_ratio"], 3)) for r in rows
           if r["net_ratio"] < 0.90]
    assert not low, f"rows below 0.90x of the published table: {low}"
    beats = sum(1 for r in rows if r["net_ratio"] >= 0.995)
    assert beats >= 8, f"only {beats}/12 rows beat the published table"


def test_qam16_r12_sparse_pilots_decode():
    """The 56+3 sparse pilot layout (wave/selection.sparse_pilot_spacing)
    must actually decode across its engagement envelope.  Since the round-4
    wire alignment the DEFAULT layout is the reference's 47+12 (interop);
    the sparse trim stays available for explicitly-negotiated ria-to-ria
    links, where the pilots' real job is common-phase tracking under
    residual CFO, not fading tracking (QAM16 R1/2 is only negotiated in the
    near-AWGN class: fading < 0.15, snr 18-22 — wave/selection.py)."""
    from dataclasses import replace

    from ria_tpu.phy.frame_v2 import DataFrame, WaveformMode, make_fixed_data_frame
    from ria_tpu.sim import apply_channel, awgn
    from ria_tpu.wave.api import create_waveform
    from ria_tpu.wave.selection import sparse_pilot_spacing
    from ria_tpu.wave import ofdm

    wf = create_waveform(WaveformMode.OFDM_CHIRP, "QAM16", "R1_2")
    assert wf.cfg.num_data_carriers == 47  # reference wire layout by default
    wf.cfg = ofdm.OFDMConfig(modulation="QAM16", use_pilots=True,
                             pilot_spacing=sparse_pilot_spacing("QAM16", "R1_2"))
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
