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


def test_monitor_waterfall_and_decode(tmp_path, capsys):
    f32 = tmp_path / "mon.f32"
    assert main(["ptx", "monitor smoke", "-s", "W1AW", "-d", "VE3ABC",
                 "-o", str(f32)]) == 0
    assert main(["monitor", str(f32), "-s", "VE3ABC"]) == 0
    out = capsys.readouterr().out
    assert "state=" in out and "Hz" in out
    assert "monitor smoke" in out
