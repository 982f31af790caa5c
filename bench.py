"""Benchmark: full MC-DPSK RX chain throughput on real hardware.

Measures the complete receive pipeline — dual-chirp sync search + CFO
estimation (FFT matched filter), mixer-bank demodulation, and batched LDPC
min-sum decode (4 codewords/frame, R1/4) — over a batch of independent
channel windows, end to end under jit.

Prints ONE JSON line: samples/s through the RX chain per chip;
vs_baseline is the multiple of real-time (48 kHz audio) sustained, i.e. how
many live HF channels one chip can decode concurrently (the reference C++
decoder runs ~1 channel per core in real time; north star is >=100x).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    # Persistent compilation cache: the remote TPU compile service shows
    # transient multi-minute latencies; caching makes repeat runs immune.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ria_tpu.phy.pipeline import make_rx_pipeline
    from ria_tpu.wave.mc_dpsk import MCDPSKConfig

    # Production geometry: 10-carrier DBPSK, R1/4, fixed 4-CW data frame.
    cfg = MCDPSKConfig(num_carriers=10, bits_per_symbol=1)
    ncw = 4
    num_bits = ncw * 648
    batch = 64  # measured sweet spot on v5e (B=128 hits memory pressure)
    window = cfg.frame_samples(num_bits) + 12000  # frame + search slack

    # Build the TX side once (host) and place frames at random offsets.
    from ria_tpu.fec.ldpc import make_encoder
    from ria_tpu.fec.ldpc_matrix import get_code
    from ria_tpu.phy.pipeline import make_tx_pipeline

    rng = np.random.default_rng(0)
    code = get_code("R1_4")
    info = rng.integers(0, 2, size=(batch * ncw, code.k)).astype(np.uint8)
    coded = np.asarray(make_encoder("R1_4")(info)).reshape(batch, num_bits)
    tx = np.asarray(make_tx_pipeline(cfg, ncw)(coded))
    audio = np.zeros((batch, window), np.float32)
    for b in range(batch):
        lead = int(rng.integers(0, 8000))
        n = min(tx.shape[1], window - lead)
        audio[b, lead : lead + n] = tx[b, :n]
    # 10 dB AWGN so the decoder does real iteration work.
    sig_rms = float(np.sqrt(np.mean(tx**2)))
    audio += rng.normal(0, sig_rms * 10 ** (-10 / 20), audio.shape).astype(np.float32)

    rx = make_rx_pipeline(cfg, "R1_4", ncw, window, batch_hint=batch)
    # Rotate distinct device buffers so no runtime-level result caching can
    # shortcut repeated executions.
    variants = []
    for _ in range(6):
        va = audio + rng.normal(0, 1e-4, audio.shape).astype(np.float32)
        variants.append(jax.device_put(va))

    # Warmup / compile.
    out = rx(variants[0])
    jax.block_until_ready(out)
    ok = np.asarray(out.cw_success)
    det = np.asarray(out.detected)
    assert det.all(), f"bench sanity: only {det.sum()}/{batch} synced"
    assert ok.mean() > 0.95, f"bench sanity: cw decode rate {ok.mean():.2f}"

    # Enough iterations to amortize the remote tunnel's ~29 ms round-trip
    # (measured dispatch-N-fetch-one slope: RTT + ~4.5 ms/exec), so the
    # reported figure approaches true sustained throughput.
    iters = 60
    t0 = time.perf_counter()
    for i in range(iters):
        out = rx(variants[i % len(variants)])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    samples = batch * window * iters
    samples_per_s = samples / dt
    frames_per_s = batch * iters / dt
    vs_realtime = samples_per_s / 48000.0

    print(json.dumps({
        "metric": "rx_chain_samples_per_sec_per_chip",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(vs_realtime, 2),
        "detail": {
            "frames_decoded_per_s": round(frames_per_s, 2),
            "batch": batch,
            "window_samples": window,
            "snr_db": 10.0,
            "cw_decode_rate": round(float(ok.mean()), 4),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
