"""CLI smoke tests (reference src/main.cpp ptx/prx/info)."""

import numpy as np

from ria_tpu.cli import main


def test_info(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "MC-DPSK" in out and "OFDM" in out


def test_ptx_prx_roundtrip(tmp_path, capsys):
    f32 = tmp_path / "tx.f32"
    assert main(["ptx", "cli loopback test", "-s", "W1AW", "-d", "VE3ABC",
                 "-o", str(f32)]) == 0
    assert f32.stat().st_size > 0
    assert main(["prx", str(f32)]) == 0
    out = capsys.readouterr().out
    assert "cli loopback test" in out


def test_ptx_connect_frame(tmp_path, capsys):
    f32 = tmp_path / "conn.f32"
    assert main(["ptx", "connect", "-s", "W1AW", "-d", "VE3ABC", "-o", str(f32)]) == 0
    assert main(["prx", str(f32)]) == 0
    out = capsys.readouterr().out
    assert "CONNECT" in out and "W1AW" in out


def test_prx_waveform_autodetect(tmp_path, capsys):
    """`prx` without -w discovers the waveform by trying detectors in
    order (chirp -> ZC -> SC/LTS -> OTFS -> Barker), like the reference
    CLI's acquisition does (src/main.cpp:56-63).  The decoded waveform is
    announced on stderr."""
    for wfn in ("MC_DPSK", "OFDM_CHIRP", "OFDM_COX", "OTFS_EQ"):
        f32 = tmp_path / f"ad_{wfn}.f32"
        assert main(["ptx", f"autodetect {wfn}", "-s", "W1AW", "-d", "VE3ABC",
                     "-w", wfn, "-o", str(f32)]) == 0
        assert main(["prx", str(f32)]) == 0
        cap = capsys.readouterr()
        assert f"autodetect {wfn}" in cap.out, (wfn, cap.out)
        assert f"waveform={wfn}" in cap.err, (wfn, cap.err)


def test_prx_autodetect_ping(tmp_path, capsys):
    f32 = tmp_path / "ping.f32"
    assert main(["ptx", "ping", "-s", "W1AW", "-o", str(f32)]) == 0
    assert main(["prx", str(f32)]) == 0
    assert "type=PING" in capsys.readouterr().out


def test_monitor_waterfall_and_decode(tmp_path, capsys):
    f32 = tmp_path / "mon.f32"
    assert main(["ptx", "monitor smoke", "-s", "W1AW", "-d", "VE3ABC",
                 "-o", str(f32)]) == 0
    assert main(["monitor", str(f32), "-s", "VE3ABC"]) == 0
    out = capsys.readouterr().out
    assert "state=" in out and "Hz" in out
    assert "monitor smoke" in out
