"""ACK-gated MC-DPSK profile upgrade (FrameType.MC_PROFILE extension).

The reference pins in-session MC-DPSK to 10 carriers / R1/4
(waveform_selection.hpp:255-257), leaving its published 469/938 bps rows
(R1/2 capacity math) unreachable on its own link.  The extension upgrades
(carriers, modulation, rate) when the measured channel supports it:
proposer applies on ACK, peer applies only once a frame actually decodes
under the armed profile, and a transition dual-RX makes every
mismatch state (lost ACK, reference peer) non-fatal.
"""

from __future__ import annotations

import numpy as np

from ria_tpu.phy.frame_v2 import WaveformMode
from ria_tpu.sim.channel import awgn, good
from ria_tpu.sim.simulator import DualStationSim
from ria_tpu.wave.api import MCDPSKWaveform
from ria_tpu.wave.selection import recommend_mc_profile


def test_profile_ladder_table():
    # AWGN-class rungs (2 dB margin over measured floors -6/+3/+4)
    assert recommend_mc_profile(-4.0, 0.2) == (13, "DBPSK", "R1_2")
    assert recommend_mc_profile(4.5, 0.12) == (13, "DQPSK", "R1_2")
    assert recommend_mc_profile(7.0, 0.12) == (16, "DQPSK", "R1_2")
    # below the band, or any real fading: no upgrade (R1/2 collapses on
    # Rayleigh fades — measured 1/10 on Good even at +6 dB)
    assert recommend_mc_profile(-5.0, 0.2) is None
    assert recommend_mc_profile(6.0, 0.69) is None


def test_profile_floor_awgn_minus4():
    """The DBPSK row's operating point: 13c DBPSK R1/2 decodes 10/10 at
    -4 dB AWGN (2 dB above its measured -6 dB floor)."""
    wf = MCDPSKWaveform(num_carriers=13, modulation="DBPSK", rate="R1_2")
    from ria_tpu.phy.frame_v2 import DataFrame

    fr = DataFrame.make_data("W1AW", "VE3ABC", 0, bytes(200)).serialize()
    tx = np.asarray(wf.tx_frame(fr, light=True), np.float32)
    rms = float(np.sqrt(np.mean(tx**2)))
    ok = 0
    for s in range(10):
        rng = np.random.default_rng(1000 + s)
        audio = np.concatenate([np.zeros(4000, np.float32), tx,
                                np.zeros(6000, np.float32)])
        audio += rng.normal(0, rms * 10 ** (4 / 20), audio.shape).astype(np.float32)
        ok += bool(wf.rx_frame(audio, light=True).ok)
    assert ok == 10


def _run_session(chan, n_msgs=8, seed=3, nerf_bravo=False):
    sim = DualStationSim(channel_cfg=chan, seed=seed)
    got = []
    sim.bravo.conn.on_message = got.append
    if nerf_bravo:
        # Simulate a reference peer: drops the unknown MC_PROFILE control
        # type and never proposes one itself.
        sim.bravo.conn._handle_mc_profile = lambda ctrl: None
        sim.bravo.conn.request_mc_profile = lambda *a, **k: False
    assert sim.alpha.conn.connect("BRAVO")
    assert sim.run_until(sim.both_connected, max_ticks=600)
    for i in range(n_msgs):
        sim.alpha.conn.send_message(b"payload %d " % i * 3)
    sim.run_until(lambda: len(got) >= n_msgs, max_ticks=8000)
    return sim, got


def test_session_upgrade_at_minus4_awgn():
    """At the reference's DBPSK row floor (-4 dB AWGN) both ends converge
    on the 13-carrier R1/2 profile and deliver everything."""
    sim, got = _run_session(awgn(-4.0))
    assert len(got) == 8
    for st in (sim.alpha, sim.bravo):
        link = st.conn.link
        assert (link.mc_carriers, link.modulation, link.rate) == (13, "DBPSK", "R1_2")
        assert st.data_wf.cfg.num_carriers == 13


def test_session_upgrade_at_6db_awgn():
    sim, got = _run_session(awgn(6.0))
    assert len(got) == 8
    for st in (sim.alpha, sim.bravo):
        link = st.conn.link
        assert (link.mc_carriers, link.modulation, link.rate) == (16, "DQPSK", "R1_2")


def test_session_no_upgrade_on_fading():
    """Good-class fading: the upgrade must NOT engage (R1/2 MC-DPSK
    collapses under carrier fades) and traffic still flows on the
    standard reference profile."""
    sim, got = _run_session(good(6.0), n_msgs=6)
    assert len(got) == 6
    assert sim.alpha.conn.link.mc_carriers == 10
    assert sim.alpha.conn.link.rate == "R1_4"


def test_reference_peer_never_upgrades():
    """A peer that ignores MC_PROFILE (any reference build): the proposer
    stops after its attempt budget, stays on the standard profile, and
    delivery is unaffected."""
    sim, got = _run_session(awgn(6.0), nerf_bravo=True)
    assert len(got) == 8
    link = sim.alpha.conn.link
    assert link.mc_carriers == 10
    assert link.rate == "R1_4"
    assert sim.alpha.conn._profile_attempts <= sim.alpha.conn.MC_PROFILE_MAX_ATTEMPTS


def test_profile_ack_seq_cannot_collide_with_data_acks():
    """The profile is applied by an ACK seq match, so proposal seqs live
    in a dedicated range no data ACK can occupy."""
    from ria_tpu.protocol.connection import Connection, ConnectionConfig

    c = Connection(ConnectionConfig())
    c.local_call = "W1AW"
    c.state = type(c.state).CONNECTED
    c.link.waveform = WaveformMode.MC_DPSK
    sent = []
    c.on_transmit = lambda fb, handshake=False: sent.append(fb)
    c._tx = lambda fb, handshake=False: sent.append(fb)
    assert c.request_mc_profile(13, "DBPSK", "R1_2")
    seq = c._pending_profile[0]
    assert seq >= 0xFE00 and seq != 0xFFFF
