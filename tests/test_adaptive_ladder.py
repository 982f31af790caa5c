"""CI pins for the adaptive mode ladder (VERDICT r2 item 6).

Two layers:
- the full-session good-fading SNR sweep (tools/adaptive_session_sweep.py
  grid): every point must deliver AND negotiate the pinned
  (waveform, modulation, rate) — the regression most likely to slip when
  selection tables, SNR estimation, or fading classification change;
- in-session upgrade paths: the LinkAdapter must lift the handshake
  bootstrap mode to the steady mode the throughput table's rows assume
  (docs/PARITY.md §6), including the opportunistic D8PSK rung and its
  failure fallback.
"""

from __future__ import annotations

import pytest

from ria_tpu.phy.frame_v2 import WaveformMode
from ria_tpu.protocol.connection import ConnectionConfig, LinkMode
from ria_tpu.sim.channel import awgn, good
from ria_tpu.sim.simulator import DualStationSim

# (snr_db, expected "WAVEFORM MOD RATE[ xspread]") — pinned from the
# 2026-08-20 sweep (tools/adaptive_session_sweep.py, seed 42, good fading,
# honest stationary noise).  Two messages per point: these pin the
# NEGOTIATED mode; steady-state upgrades are pinned separately below.
SWEEP_POINTS = [
    (-8.0, "MC_DPSK DBPSK R1_4 x2"),
    (-5.0, "MC_DPSK DBPSK R1_4"),
    (0.0, "MC_DPSK DBPSK R1_4"),
    (6.0, "MC_DPSK DQPSK R1_4"),
    (12.0, "OTFS_EQ QPSK R1_2"),
    # 18 dB Good keeps OFDM since round 4: the goodput harness
    # measured OTFS QPSK at <1 kbps with partial delivery there vs
    # the reference's own 4.9 kbps QAM16 point (connection.py
    # _route_otfs >= 18 dB gate).
    (18.0, "OFDM_CHIRP DQPSK R1_2"),
    (25.0, "OFDM_CHIRP DQPSK R1_2"),
]


def _link_str(link: LinkMode) -> str:
    s = f"{link.waveform.name} {link.modulation} {link.rate}"
    if link.spreading > 1:
        s += f" x{link.spreading}"
    return s


@pytest.mark.slow
@pytest.mark.parametrize("snr,expected", SWEEP_POINTS,
                         ids=[f"{s:+.0f}dB" for s, _ in SWEEP_POINTS])
def test_good_fading_ladder_point(snr, expected):
    import types

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from cli_simulator import run_session

    sess = types.SimpleNamespace(snr=snr, channel="good", waveform="AUTO",
                                 mod="AUTO", rate="AUTO", num_messages=2,
                                 file=False, save_signals=None)
    r = run_session(sess, 42)
    assert r["connected"] and r["messages"] == 2, r
    assert r["final_link"] == expected, (r["final_link"], expected)


def _upgrade_session(chan, n_msgs, no_otfs=False, seed=3):
    kw = {}
    if no_otfs:
        caps = (0x3F & ~(1 << int(WaveformMode.OTFS_EQ))
                & ~(1 << int(WaveformMode.OTFS_RAW))) | 0x40
        kw = {"config_a": ConnectionConfig(mode_capabilities=caps),
              "config_b": ConnectionConfig(mode_capabilities=caps)}
    sim = DualStationSim(channel_cfg=chan, seed=seed, **kw)
    got = []
    sim.bravo.conn.on_message = got.append
    assert sim.alpha.conn.connect("BRAVO")
    assert sim.run_until(sim.both_connected, max_ticks=600)
    for i in range(n_msgs):
        sim.alpha.conn.send_message(b"ladder %02d " % i * 4)
    sim.run_until(lambda: len(got) >= n_msgs, max_ticks=8000)
    return sim, got


@pytest.mark.slow
def test_d8psk_rung_engages_at_15db_awgn():
    """The opportunistic D8PSK rung (reference README D8PSK section):
    15 dB AWGN bootstraps D8PSK R1/2 and the adapter lifts it to R2/3 —
    the steady config behind no published row, pure gain over the
    reference's DQPSK R1/2 at the same point (+80% net)."""
    sim, got = _upgrade_session(awgn(15.0), 10)
    assert len(got) == 10
    # Bursts (default-on since round 4) finish the transfer faster than
    # the ACK-gated MODE_CHANGE cycle; keep the link ticking until both
    # ends settle on the upgraded rate (same pattern as the R1/2 test).
    sim.run_until(lambda: sim.alpha.conn.link.rate == "R2_3"
                  and sim.bravo.conn.link.rate == "R2_3", max_ticks=6000)
    link = sim.alpha.conn.link
    assert (link.waveform, link.modulation, link.rate) == \
        (WaveformMode.OFDM_CHIRP, "D8PSK", "R2_3"), _link_str(link)


@pytest.mark.slow
def test_d8psk_fallback_on_fading():
    """Failure fallback: a (stale) D8PSK link on Good-class fading steps
    down to the robust DQPSK ladder after a failure streak and traffic
    completes — opportunistic means safely abandonable."""
    sim, got = _upgrade_session(good(18.0), 0, seed=4)
    for st in (sim.alpha, sim.bravo):
        st.conn.link = LinkMode(waveform=WaveformMode.OFDM_CHIRP,
                                modulation="D8PSK", rate="R2_3")
        st._on_mode_changed(st.conn.link)
    got2 = []
    sim.bravo.conn.on_message = got2.append
    for i in range(8):
        sim.alpha.conn.send_message(b"fall %d " % i * 4)
    sim.run_until(lambda: len(got2) >= 8, max_ticks=8000)
    assert len(got2) == 8
    assert sim.alpha.conn.link.modulation == "DQPSK"


@pytest.mark.slow
def test_r12_upgrade_at_10db_good_backs_r14_row():
    """The PARITY §6 R1/4-row claim: at the reference's 'R1/4 @ 10 dB
    fading-OK' operating point, this stack's steady mode is DQPSK R1/2
    (in-session fading 0.35 = Good class; select_ofdm_code_rate >= 10 dB
    rung), netting 2125 bps vs the published 1264."""
    sim, got = _upgrade_session(good(10.0), 12, no_otfs=True)
    assert len(got) == 12
    # The ACK-gated MODE_CHANGE may still be in its retry cycle when the
    # last message lands; keep the link ticking (keepalives/ctrl frames
    # keep flowing) until both ends settle on the upgraded rate.
    sim.run_until(lambda: sim.alpha.conn.link.rate == "R1_2"
                  and sim.bravo.conn.link.rate == "R1_2", max_ticks=6000)
    for st in (sim.alpha, sim.bravo):
        link = st.conn.link
        assert (link.waveform, link.modulation, link.rate) == \
            (WaveformMode.OFDM_CHIRP, "DQPSK", "R1_2"), _link_str(link)


@pytest.mark.slow
def test_qam16_r23_upgrade_at_18db_awgn_backs_qam16_row():
    """The PARITY §6 QAM16-R1/2-row claim: at 18 dB AWGN the steady mode
    is QAM16 R2/3 (5050 bps net vs the published 4800)."""
    sim, got = _upgrade_session(awgn(18.0), 10)
    assert len(got) == 10
    link = sim.alpha.conn.link
    assert (link.waveform, link.modulation, link.rate) == \
        (WaveformMode.OFDM_CHIRP, "QAM16", "R2_3"), _link_str(link)
