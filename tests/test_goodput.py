"""Measured end-to-end session goodput, CI-pinned at the reference's
published proof points (reference include/ultra/types.hpp:354-365,
high_throughput preset):

    AWGN 25 dB     -> 7.5 kbps, 100% of runs
    Good 20 dB     -> 4.9 kbps,  96%
    Moderate 20 dB -> 2.7 kbps,  60%

Each seed is a full PING -> CONNECT -> bulk-DATA (4 KiB) -> deliver
session through DualStationSim with honest channel noise; goodput is
delivered payload bits / virtual air seconds with handshake, mode
negotiation, ACK turnaround, ARQ retransmits and half-duplex pacing all
included (tools/goodput.py).  Seed counts mirror the reference's delivery
rates: 10/10 at AWGN and Good, >=6/10 at Moderate.
"""

from __future__ import annotations

import pytest


def _sweep(channel: str, snr: float, n_seeds: int, seed_base: int = 100):
    import jax

    from ria_tpu.phy import pipeline as _pl
    from tools.goodput import measure_goodput

    results = []
    for s in range(n_seeds):
        results.append(measure_goodput(channel, snr, seed_base + s))
    # Each negotiated mode compiles fresh pipelines on the CPU test
    # backend; keep executables from accumulating across rows.
    _pl.make_rx_pipeline.cache_clear()
    _pl.make_tx_pipeline.cache_clear()
    jax.clear_caches()
    return results


@pytest.mark.slow
@pytest.mark.parametrize("channel,snr,ref_kbps,min_delivered,n_seeds", [
    ("awgn", 25.0, 7.5, 10, 10),
    ("good", 20.0, 4.9, 10, 10),
    ("moderate", 20.0, 2.7, 6, 10),
])
def test_goodput_proof_point(channel, snr, ref_kbps, min_delivered, n_seeds):
    rs = _sweep(channel, snr, n_seeds)
    full = [r for r in rs if r.get("delivered", 0.0) >= 1.0]
    assert len(full) >= min_delivered, (
        f"{channel}@{snr}: {len(full)}/{n_seeds} delivered "
        f"(need {min_delivered}): "
        + "; ".join(f"{r.get('delivered', 0):.0%} {r.get('link', '?')}"
                    for r in rs))
    bps = sorted(r["goodput_bps"] for r in full)
    median = bps[len(bps) // 2]
    assert median >= ref_kbps * 1000.0, (
        f"{channel}@{snr}: median goodput {median:.0f} bps < reference "
        f"{ref_kbps} kbps ({[round(b) for b in bps]})")
