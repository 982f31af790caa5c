"""Aux subsystem tests: config presets/settings, logging, signal capture,
threaded continuous simulator."""

import numpy as np
import pytest

from ria_tpu.config import PRESETS, AppSettings, ModemPreset
from ria_tpu.utils.logging import get_logger, set_level, set_station_tag


def test_presets_table():
    assert set(PRESETS) == {"conservative", "balanced", "turbo", "high_throughput",
                            "high_speed", "maximum_speed"}
    b = PRESETS["balanced"]
    assert b.cp_len == 96 and b.modulation == "DQPSK" and not b.use_pilots
    t = PRESETS["turbo"]
    assert t.modulation == "QAM256" and t.code_rate == "R5_6"
    cfg = PRESETS["high_throughput"].ofdm_config()
    assert cfg.use_pilots and cfg.pilot_spacing == 4


def test_app_settings_roundtrip(tmp_path):
    s = AppSettings(mycall="W1AW", compression=False, preset="turbo",
                    forced_rate="R1_2", tx_drive=0.8)
    p = tmp_path / "settings.ini"
    s.save(p)
    g = AppSettings.load(p)
    assert g.mycall == "W1AW" and not g.compression
    assert g.preset == "turbo" and g.forced_rate == "R1_2"
    assert abs(g.tx_drive - 0.8) < 1e-9


def test_logging_categories(capsys):
    set_level("DEBUG")
    set_station_tag("ALPHA")
    get_logger("SYNC").debug("chirp at %d", 123)
    err = capsys.readouterr().err
    assert "[ALPHA]" in err and "ria.SYNC" in err and "chirp at 123" in err
    set_level("WARNING")


def test_save_signals(tmp_path):
    from ria_tpu.sim.simulator import DualStationSim
    from ria_tpu.sim import awgn

    sim = DualStationSim(awgn(15.0), seed=3, save_signals=str(tmp_path / "cap"))
    sim.alpha.conn.connect("BRAVO")
    for _ in range(5):
        sim.step()
    sim.close()
    data = np.fromfile(tmp_path / "cap_alpha_to_bravo.f32", np.float32)
    assert len(data) == 5 * sim.block
    assert np.abs(data).max() > 0.01  # ping audio present


def test_continuous_simulator_session():
    """Threaded wall-clock sim: full connect + message under real threads."""
    from ria_tpu.sim.continuous import ContinuousAudioSimulator
    from ria_tpu.sim import awgn
    from ria_tpu.protocol.connection import ConnectionState

    sim = ContinuousAudioSimulator(awgn(12.0), seed=5, realtime_factor=0.0,
                                   ptt_jitter_ms=5.0)
    got = []
    sim.bravo.conn.on_message = lambda d: got.append(d)
    sim.alpha.conn.connect("BRAVO")

    def done():
        if (sim.alpha.conn.state == ConnectionState.CONNECTED
                and sim.bravo.conn.state == ConnectionState.CONNECTED
                and not getattr(done, "sent", False)):
            sim.alpha.conn.send_message(b"threaded hello")
            done.sent = True
        return got == [b"threaded hello"]

    assert sim.run(duration_s=300.0, until=done), \
        f"A={sim.alpha.conn.state} B={sim.bravo.conn.state} got={got}"
