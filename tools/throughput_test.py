"""Link throughput measurement (reference tools/test_throughput.cpp).

Measures payload_bytes / audio_seconds through the REAL TX chain per mode
and compares with the reference's published operating points (BASELINE.md).

Usage: python tools/throughput_test.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def measure(wf, payload_len: int, fixed: bool, rate: str) -> tuple[float, float]:
    from ria_tpu.phy.frame_v2 import DataFrame, make_fixed_data_frame

    if fixed:
        frame = make_fixed_data_frame("W1AW", "VE3ABC", 0, bytes(payload_len), rate)
        payload_len = len(frame.payload)
    else:
        frame = DataFrame.make_data("W1AW", "VE3ABC", 0, bytes(payload_len))
    tx = wf.tx_frame(frame.serialize(), light=True)
    seconds = len(tx) / 48000.0
    return payload_len * 8 / seconds, seconds


def main():
    from ria_tpu.phy.frame_v2 import WaveformMode
    from ria_tpu.wave.api import create_waveform

    rows = [
        ("MC-DPSK DBPSK R1/4", WaveformMode.MC_DPSK, "DBPSK", "R1_4", 160, False, 469.0),
        ("MC-DPSK DQPSK R1/4", WaveformMode.MC_DPSK, "DQPSK", "R1_4", 160, False, 938.0),
        ("OFDM DQPSK R1/4", WaveformMode.OFDM_CHIRP, "DQPSK", "R1_4", 61, True, 1264.0),
        ("OFDM DQPSK R1/2", WaveformMode.OFDM_CHIRP, "DQPSK", "R1_2", 141, True, 2271.0),
        ("OFDM DQPSK R2/3", WaveformMode.OFDM_CHIRP, "DQPSK", "R2_3", 197, True, 3028.0),
        ("OFDM DQPSK R3/4", WaveformMode.OFDM_CHIRP, "DQPSK", "R3_4", 221, True, 3536.0),
        ("OFDM QAM16 R1/2", WaveformMode.OFDM_COX, "QAM16", "R1_2", 141, True, 4800.0),
        ("OFDM QAM64 R3/4", WaveformMode.OFDM_COX, "QAM64", "R3_4", 221, True, 7200.0),
    ]
    print(f"{'mode':24s} {'bps':>8s} {'frame_s':>8s} {'ref_bps':>8s} {'ratio':>6s}")
    for name, mode, mod, rate, plen, fixed, ref in rows:
        wf = create_waveform(mode, mod, rate)
        bps, secs = measure(wf, plen, fixed, rate)
        print(f"{name:24s} {bps:8.0f} {secs:8.2f} {ref:8.0f} {bps/ref:6.2f}")


if __name__ == "__main__":
    main()
