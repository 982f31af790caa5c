"""Link throughput measurement (reference tools/test_throughput.cpp).

Measures payload_bytes / audio_seconds through the REAL TX chain per mode
and compares with the reference's published operating points (BASELINE.md).

Two comparisons per row, mirroring how the reference's table is derived:
- single: one fixed 4-CW frame including its preamble (worst case);
- steady: burst mode where available (one light preamble carries `group`
  frames, reference encodeBurstLight) or a long multi-CW frame for MC-DPSK —
  the regime the reference's bps table describes.

Reference MC-DPSK rows are R1/2 (10 carriers x 93.75 baud = 937.5 raw bps;
README 469 bps DBPSK = 937.5 x 1/2), so the MC-DPSK rows here use R1_2.

The `gross` column uses the reference table's own convention (pure
capacity math, see measure_rows) and is asserted >= reference for every
row with --assert; net columns carry the real preamble/header/padding
overheads, which the reference's table ignores.

Usage: python tools/throughput_test.py [--assert] [--markdown]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# Session-level tools are dispatch-latency-bound: default to the local CPU
# backend (RIA_PLATFORM=axon selects the real TPU).
from ria_tpu.utils.platform import apply_platform

apply_platform(_os.environ.get("RIA_PLATFORM", "cpu"))

import numpy as np


def measure_single(wf, rate: str) -> tuple[float, float]:
    """One fixed 4-CW data frame, light preamble."""
    from ria_tpu.phy.frame_v2 import make_fixed_data_frame

    frame = make_fixed_data_frame("W1AW", "VE3ABC", 0, bytes(64), rate)
    payload_len = len(frame.payload)
    tx = wf.tx_frame(frame.serialize(), light=True)
    seconds = len(tx) / 48000.0
    return payload_len * 8 / seconds, seconds


def measure_burst(wf, rate: str, group: int = 8) -> tuple[float, float]:
    """Burst mode: one light preamble, `group` fixed frames."""
    from ria_tpu.phy.frame_v2 import make_fixed_data_frame

    frames = [make_fixed_data_frame("W1AW", "VE3ABC", i, bytes(64), rate)
              for i in range(group)]
    payload = sum(len(f.payload) for f in frames)
    tx = wf.tx_burst([f.serialize() for f in frames])
    seconds = len(tx) / 48000.0
    return payload * 8 / seconds, seconds


def measure_long_mc(wf, rate: str, payload_len: int = 600) -> tuple[float, float]:
    """MC-DPSK steady state: one long variable-CW frame, ZC light preamble."""
    from ria_tpu.phy.frame_v2 import DataFrame

    frame = DataFrame.make_data("W1AW", "VE3ABC", 0, bytes(payload_len))
    tx = wf.tx_frame(frame.serialize(), light=True)
    seconds = len(tx) / 48000.0
    return payload_len * 8 / seconds, seconds


REF_ROWS = [
    # (name, mode, modulation, rate, reference bps — BASELINE.md rows)
    ("MC-DPSK DBPSK R1/2", "MC_DPSK", "DBPSK", "R1_2", 469.0),
    ("MC-DPSK DQPSK R1/2", "MC_DPSK", "DQPSK", "R1_2", 938.0),
    ("OFDM DQPSK R1/4", "OFDM_CHIRP", "DQPSK", "R1_4", 1264.0),
    ("OFDM DQPSK R1/2", "OFDM_CHIRP", "DQPSK", "R1_2", 2271.0),
    ("OFDM DQPSK R2/3", "OFDM_CHIRP", "DQPSK", "R2_3", 3028.0),
    ("OFDM DQPSK R3/4", "OFDM_CHIRP", "DQPSK", "R3_4", 3536.0),
    ("OFDM QAM16 R1/2", "OFDM_CHIRP", "QAM16", "R1_2", 4800.0),
    ("OFDM QAM64 R3/4", "OFDM_COX", "QAM64", "R3_4", 7200.0),
    # Coherent NVIS/ground-wave rows (README.md:86-88, OFDM-COX pilots).
    ("Coherent QPSK R1/2", "OFDM_COX", "QPSK", "R1_2", 2014.0),
    ("Coherent QAM16 R3/4", "OFDM_COX", "QAM16", "R3_4", 5657.0),
    ("Coherent QAM32 R3/4", "OFDM_COX", "QAM32", "R3_4", 7071.0),
]


def measure_rows():
    """-> list of dict rows: net single/steady bps AND the gross link rate.

    Gross = the waveform's information capacity, data_carriers x bits x
    symbol_rate x code_rate — the exact convention of the reference's
    README table, which is pure symbol-rate math with no preamble /
    training / header / frame-padding accounting: 2271 bps = 53 carriers x
    2 bits x 42.86 sym/s x 1/2, 469 bps = 10 x 93.75 baud x 1/2.  The
    `single`/`steady` columns keep every real overhead (net payload bps,
    measured through the actual TX chain) for honesty; `gross` is the
    apples-to-apples number that must meet-or-beat the reference (which
    rounds its own math up by <=0.5%, hence the assert tolerance)."""
    from ria_tpu.fec.ldpc_matrix import get_code
    from ria_tpu.phy.frame_v2 import WaveformMode, make_fixed_data_frame, DataFrame
    from ria_tpu.wave.api import create_waveform

    out = []
    for name, mode_name, mod, rate, ref in REF_ROWS:
        mode = WaveformMode[mode_name]
        wf = create_waveform(mode, mod, rate)
        k = get_code(rate).k
        single, _ = measure_single(wf, rate)
        code_rate = k / 648.0
        if mode == WaveformMode.MC_DPSK:
            steady, _ = measure_long_mc(wf, rate, 600)
            cfg = wf.cfg
            gross = (cfg.bits_per_mc_symbol * (48000.0 / cfg.samples_per_symbol)
                     / cfg.spreading * code_rate)
        else:
            from ria_tpu.wave.ofdm import BITS_PER_SYMBOL

            cfg = wf.cfg
            sym_rate = 48000.0 / cfg.symbol_samples
            gross = (cfg.num_data_carriers * BITS_PER_SYMBOL[mod] * sym_rate
                     * code_rate)
            if hasattr(wf, "tx_burst"):
                steady, _ = measure_burst(wf, rate, 8)
            else:
                # OFDM-COX: no burst wrapper; net steady = one frame's
                # payload over its data+training samples (acquisition
                # preamble amortizes to zero in a long transfer).
                frame = make_fixed_data_frame("W1AW", "VE3ABC", 0, bytes(64), rate)
                tx = wf.tx_frame(frame.serialize(), light=True)
                net_s = (len(tx) - wf.preamble_samples()) / 48000.0
                steady = len(frame.payload) * 8 / net_s
        out.append({"name": name, "mod": mod, "rate": rate, "ref": ref,
                    "single": single, "steady": steady, "gross": gross,
                    "ratio": gross / ref})
    return out


def main(argv=None):
    import sys

    argv = argv if argv is not None else sys.argv[1:]
    rows = measure_rows()
    md = "--markdown" in argv
    if md:
        print("| mode | net single bps | net steady bps | gross link bps "
              "| reference bps | gross/ref |")
        print("|---|---|---|---|---|---|")
    else:
        print(f"{'mode':24s} {'single':>8s} {'steady':>8s} {'gross':>8s} "
              f"{'ref_bps':>8s} {'ratio':>6s}")
    worst = 10.0
    for r in rows:
        worst = min(worst, r["ratio"])
        if md:
            print(f"| {r['name']} | {r['single']:.0f} | {r['steady']:.0f} "
                  f"| {r['gross']:.0f} | {r['ref']:.0f} | {r['ratio']:.2f} |")
        else:
            print(f"{r['name']:24s} {r['single']:8.0f} {r['steady']:8.0f} "
                  f"{r['gross']:8.0f} {r['ref']:8.0f} {r['ratio']:6.2f}")
    print(f"worst gross/ref ratio: {worst:.2f}")
    if "--assert" in argv:
        bad = [r["name"] for r in rows if r["ratio"] < 0.995]
        if bad:
            print(f"FAIL: below reference: {bad}")
            return 1
        print("PASS: every operating point meets or beats the reference")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
