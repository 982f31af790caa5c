"""Over-the-air interop with the reference implementation.

Two tiers:

1. **ref -> ria_tpu** (always runs): checked-in fixtures captured from the
   reference binary's `ria ptx` (tools/make_interop_fixtures.sh) must
   decode through the ria_tpu CLI/waveform stack with the exact payload.
   These fixtures pin the reference's real over-the-air byte stream —
   pilot layout, CP, interleaving, LTS/chirp preambles, frame fields.

2. **ria_tpu -> ref** (runs when the reference binary is available at
   build_ref/ria or can be built): ria_tpu `ptx` output must decode in the
   reference binary's `prx`.

Known reference-side defects (measured on its own loopbacks, NOT counted
against interop):
- `ria prx -w mcdpsk` cannot decode light MC-DPSK DATA frames at all (its
  decoder only searches ZC data sync in connected mode, which the CLI
  never sets for mcdpsk) — its own `ptx "x" -w mcdpsk | prx -w mcdpsk`
  yields Frames: 0.  The ref->ria_tpu direction IS asserted for MC-DPSK.
- `ria prx` cannot decode its own `ptx connect` (4x-spread handshake; the
  decode retry ladder never tries spreading).

Reference chain details verified byte-exactly by tools/interop/ref_dump*:
LDPC codewords, channel/frame interleave composition, frame serialization,
OFDM modulation (corr 0.9999997 against `ptx` fixtures), MC-DPSK light
frames (corr 1.0000 per segment).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "golden", "interop")
PAYLOAD = b"HELLO INTEROP"
REF_BIN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "build_ref", "ria")

# (fixture, ria_tpu waveform, modulation, rate)
REF_TO_US = [
    ("ref_ofdm_dqpsk_r1_4.f32", "OFDM_CHIRP", "DQPSK", "R1_4"),
    ("ref_ofdm_dqpsk_r1_2.f32", "OFDM_CHIRP", "DQPSK", "R1_2"),
    ("ref_ofdm_dqpsk_r2_3.f32", "OFDM_CHIRP", "DQPSK", "R2_3"),
    ("ref_ofdm_dqpsk_r3_4.f32", "OFDM_CHIRP", "DQPSK", "R3_4"),
    ("ref_ofdm_d8psk_r1_2.f32", "OFDM_CHIRP", "D8PSK", "R1_2"),
    ("ref_ofdm_qam16_r1_2.f32", "OFDM_CHIRP", "QAM16", "R1_2"),
    ("ref_ofdm_qam32_r3_4.f32", "OFDM_CHIRP", "QAM32", "R3_4"),
    ("ref_cox_qpsk_r1_2.f32", "OFDM_COX", "QPSK", "R1_2"),
    ("ref_cox_qam16_r3_4.f32", "OFDM_COX", "QAM16", "R3_4"),
    ("ref_cox_qam64_r3_4.f32", "OFDM_COX", "QAM64", "R3_4"),
    ("ref_mcdpsk_dqpsk_r1_4.f32", "MC_DPSK", "DQPSK", "R1_4"),
]


def _load(name: str) -> np.ndarray:
    path = os.path.join(FIXDIR, name)
    return np.fromfile(path, np.float32)


@pytest.mark.parametrize("fixture,wf_mode,mod,rate",
                         REF_TO_US, ids=[r[0] for r in REF_TO_US])
def test_reference_tx_decodes_here(fixture, wf_mode, mod, rate):
    from ria_tpu.phy.frame_v2 import DataFrame, WaveformMode
    from ria_tpu.wave.api import create_waveform

    audio = _load(fixture)
    wf = create_waveform(WaveformMode[wf_mode], mod, rate)
    rx = wf.rx_frame(audio)
    if not rx.ok:
        rx = wf.rx_frame(audio, light=True)
    assert rx.ok, f"{fixture}: no decode"
    df = DataFrame.deserialize(rx.frame_bytes)
    assert df is not None and df.payload == PAYLOAD
    from ria_tpu.phy.frame_v2 import hash_callsign

    assert df.src_hash == hash_callsign("ALPHA")
    assert df.dst_hash == hash_callsign("BRAVO")


def test_reference_ping_detected_here(capsys):
    from ria_tpu.cli import main

    path = os.path.join(FIXDIR, "ref_ping.f32")
    assert main(["prx", path, "-w", "MC_DPSK"]) == 0
    assert "type=PING" in capsys.readouterr().out


def _ref_binary() -> str | None:
    if os.path.exists(REF_BIN):
        return REF_BIN
    # Build it when the reference tree + toolchain are present (cached
    # thereafter); never a hard failure — tier 2 skips without it.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, "tools", "build_reference.sh")
    if (os.path.isdir("/root/reference") and os.path.exists(script)
            and shutil.which("cmake")):
        try:
            subprocess.run([script], check=True, capture_output=True,
                           timeout=600)
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
            return None
        if os.path.exists(REF_BIN):
            return REF_BIN
    return None


MINE_TO_REF = [
    ("OFDM_CHIRP", "ofdm", "DQPSK", "dqpsk", "R1_4", "r1_4"),
    ("OFDM_CHIRP", "ofdm", "DQPSK", "dqpsk", "R1_2", "r1_2"),
    ("OFDM_CHIRP", "ofdm", "DQPSK", "dqpsk", "R2_3", "r2_3"),
    ("OFDM_CHIRP", "ofdm", "DQPSK", "dqpsk", "R3_4", "r3_4"),
    ("OFDM_CHIRP", "ofdm", "D8PSK", "d8psk", "R1_2", "r1_2"),
    ("OFDM_CHIRP", "ofdm", "QAM16", "qam16", "R1_2", "r1_2"),
    ("OFDM_CHIRP", "ofdm", "QAM32", "qam32", "R3_4", "r3_4"),
    ("OFDM_COX", "cox", "QPSK", "qpsk", "R1_2", "r1_2"),
    ("OFDM_COX", "cox", "QAM16", "qam16", "R3_4", "r3_4"),
    ("OFDM_COX", "cox", "QAM64", "qam64", "R3_4", "r3_4"),
]


@pytest.mark.parametrize("wf,rw,mod,rm,rate,rr", MINE_TO_REF,
                         ids=[f"{r[1]}-{r[3]}-{r[5]}" for r in MINE_TO_REF])
def test_our_tx_decodes_in_reference(tmp_path, wf, rw, mod, rm, rate, rr):
    ref = _ref_binary()
    if ref is None:
        pytest.skip("reference binary not available")
    from ria_tpu.cli import main

    f32 = tmp_path / "tx.f32"
    assert main(["ptx", PAYLOAD.decode(), "-s", "ALPHA", "-d", "BRAVO",
                 "-w", wf, "-m", mod, "-r", rate, "-o", str(f32)]) == 0
    out = subprocess.run([ref, "prx", "-w", rw, "-m", rm, "-r", rr, str(f32)],
                         capture_output=True, text=True, timeout=120)
    assert f'Message: "{PAYLOAD.decode()}"' in out.stderr, out.stderr[-2000:]


def test_our_ping_detected_in_reference(tmp_path):
    ref = _ref_binary()
    if ref is None:
        pytest.skip("reference binary not available")
    from ria_tpu.cli import main

    f32 = tmp_path / "ping.f32"
    assert main(["ptx", "ping", "-s", "ALPHA", "-o", str(f32)]) == 0
    out = subprocess.run([ref, "prx", "-w", "mcdpsk", str(f32)],
                         capture_output=True, text=True, timeout=120)
    assert "[PING] Detected!" in out.stderr, out.stderr[-2000:]
