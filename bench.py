"""Benchmark: full RX chain throughput on real hardware — BOTH workhorses.

Chain 1 (headline metric): MC-DPSK — dual-chirp sync search + CFO estimation
(zoom FFT matched filter), mixer-bank demodulation, batched LDPC min-sum
decode (4 codewords/frame, R1/4) at 10 dB AWGN.

Chain 2 (detail): OFDM DQPSK R1/2 at 15 dB (north-star config #3) —
Schmidl-Cox search, CP strip + 1024-pt FFT, LTS channel estimate, MMSE
equalization, soft demap, frame/channel deinterleave, batched LDPC.

Prints ONE JSON line: samples/s through the MC-DPSK RX chain per chip;
vs_baseline is the multiple of real-time (48 kHz audio) sustained, i.e. how
many live HF channels one chip can decode concurrently (the reference C++
decoder runs ~1 channel per core in real time; north star is >=100x).
The OFDM chain's throughput and decode rate ride in `detail.ofdm`.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _bench_chain(rx, variants, iters: int, trials: int = 2):
    """Best-of-`trials` pipelined loops: the remote tunnel adds multi-ms
    dispatch variance per run; the minimum is the honest sustained figure
    (compute doesn't vary, the RPC path does)."""
    out = rx(variants[0])
    import jax

    jax.block_until_ready(out)
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        for i in range(iters):
            out = rx(variants[i % len(variants)])
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def _mc_dpsk_case(rng):
    """(rx, variants, batch, window, expected-decode check array)."""
    from ria_tpu.fec.ldpc import make_encoder
    from ria_tpu.fec.ldpc_matrix import get_code
    from ria_tpu.phy.pipeline import make_rx_pipeline, make_tx_pipeline
    from ria_tpu.wave.mc_dpsk import MCDPSKConfig

    import jax

    # Production geometry: 10-carrier DBPSK, R1/4, fixed 4-CW data frame.
    cfg = MCDPSKConfig(num_carriers=10, bits_per_symbol=1)
    ncw = 4
    num_bits = ncw * 648
    batch = 64  # measured sweet spot on v5e (B=128 hits memory pressure)
    window = cfg.frame_samples(num_bits) + 12000  # frame + search slack

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
    variants = [jax.device_put(audio + rng.normal(0, 1e-4, audio.shape)
                               .astype(np.float32)) for _ in range(6)]
    return rx, variants, batch, window


def _ofdm_case(rng):
    from ria_tpu.fec.ldpc_matrix import get_code
    from ria_tpu.phy.frame_v2 import encode_fixed_frame
    from ria_tpu.phy.pipeline import make_ofdm_rx_pipeline
    from ria_tpu.wave.ofdm import OFDMConfig, tx_frame

    import jax

    # North-star config #3: OFDM DQPSK R1/2 @ 15 dB, fixed 4-CW frames.
    cfg = OFDMConfig(modulation="DQPSK", use_pilots=False)
    rate = "R1_2"
    ci = cfg.bits_per_ofdm_symbol()
    batch = 64
    bpc = get_code(rate).k // 8
    S = cfg.num_symbols_for_bits(4 * 648)
    window = cfg.preamble_samples + (2 + S) * cfg.symbol_samples + 8000

    audio = np.zeros((batch, window), np.float32)
    rms = None
    for b in range(batch):
        payload = rng.integers(0, 256, 4 * bpc).astype(np.uint8).tobytes()
        tx = tx_frame(encode_fixed_frame(payload, rate, ci), cfg, preamble="cox")
        lead = int(rng.integers(0, 4000))
        audio[b, lead : lead + len(tx)] = tx
        rms = float(np.sqrt(np.mean(tx**2)))
    audio += rng.normal(0, rms * 10 ** (-15 / 20), audio.shape).astype(np.float32)

    rx = make_ofdm_rx_pipeline(cfg, rate, window, ci, batch_hint=batch)
    variants = [jax.device_put(audio + rng.normal(0, 1e-4, audio.shape)
                               .astype(np.float32)) for _ in range(6)]
    return rx, variants, batch, window


def _coherent_case(rng):
    """North-star config #4: coherent QAM64 R3/4 @ 25 dB (OFDM-COX
    pilot-assisted MMSE chain — the reference's max-throughput row)."""
    from ria_tpu.fec.ldpc_matrix import get_code
    from ria_tpu.phy.frame_v2 import encode_fixed_frame
    from ria_tpu.phy.pipeline import make_ofdm_rx_pipeline
    from ria_tpu.wave.api import create_waveform
    from ria_tpu.wave.ofdm import tx_frame

    import jax

    wf = create_waveform(__import__("ria_tpu.phy.frame_v2", fromlist=["WaveformMode"])
                         .WaveformMode.OFDM_COX, "QAM64", "R3_4")
    cfg = wf.cfg
    rate = "R3_4"
    ci = wf._ci_bits
    batch = 64
    bpc = get_code(rate).k // 8
    S = cfg.num_symbols_for_bits(4 * 648)
    window = cfg.preamble_samples + (2 + S) * cfg.symbol_samples + 6000

    audio = np.zeros((batch, window), np.float32)
    rms = None
    for b in range(batch):
        payload = rng.integers(0, 256, 4 * bpc).astype(np.uint8).tobytes()
        tx = tx_frame(encode_fixed_frame(payload, rate, ci), cfg, preamble="cox")
        lead = int(rng.integers(0, 3000))
        audio[b, lead : lead + len(tx)] = tx
        rms = float(np.sqrt(np.mean(tx**2)))
    audio += rng.normal(0, rms * 10 ** (-25 / 20), audio.shape).astype(np.float32)

    rx = make_ofdm_rx_pipeline(cfg, rate, window, ci, batch_hint=batch)
    variants = [jax.device_put(audio + rng.normal(0, 1e-4, audio.shape)
                               .astype(np.float32)) for _ in range(6)]
    return rx, variants, batch, window


def _ldpc_metrics(rng):
    """Flagship-kernel and serving-path measurements (VERDICT r2 item 3):
    - pallas_cw_per_s / xla_cw_per_s: sustained batched BP throughput of
      the Pallas VMEM-resident kernel vs the XLA while_loop decoder at the
      serving-realistic geometry — R1/4 (the protocol's workhorse rate,
      50-80 iterations) with a MIXED-difficulty batch (half near-floor
      rows): the XLA while_loop runs until the SLOWEST codeword in the
      whole call converges, while the kernel exits per 128-row tile —
      the workload shape where VMEM residency + tile early-exit pay;
    - serving_decode_ms: wall latency of ONE 4-codeword control-frame
      decode through the serving dispatch (decode_batch pads 4 -> the
      128-row tile), host round-trip included — the cost the docstring
      previously asserted harmless without measuring.
    """
    import time

    import jax
    import jax.numpy as jnp

    from ria_tpu.fec.ldpc import decode_batch, make_decoder, make_encoder
    from ria_tpu.fec.ldpc_matrix import MIN_SUM_FACTOR, get_code

    rate = "R1_4"
    code = get_code(rate)
    B = 512
    info = rng.integers(0, 2, (B, code.k)).astype(np.uint8)
    coded = np.asarray(make_encoder(rate)(info)).astype(np.float32)
    llr = (1.0 - 2.0 * coded) * 4.0
    noise = rng.normal(0, 1.0, llr.shape).astype(np.float32)
    noise[B // 2 :] = rng.normal(0, 2.6, (B // 2, 648)).astype(np.float32)
    llr += noise
    variants = [jax.device_put(jnp.asarray(
        llr + rng.normal(0, 0.05, llr.shape).astype(np.float32)))
        for _ in range(4)]

    out = {}
    decoders = {"xla": make_decoder(rate)}
    if jax.default_backend() == "tpu":
        from ria_tpu.fec.ldpc_pallas import make_pallas_decoder

        decoders["pallas"] = make_pallas_decoder(rate, tile=128)
    for name, dec in decoders.items():
        fn = jax.jit(lambda x, d=dec: d(x))
        o = fn(variants[0])
        jax.block_until_ready(o)
        ok = float(np.asarray(o.success).mean())
        # Variance-controlled slope protocol (VERDICT r3 item 4): per-batch
        # time = slope between the MIN total times at two dispatch counts.
        # The min-over-trials at each count filters the tunnel's transient
        # multi-10ms stalls; the slope between counts cancels the fixed
        # ~29 ms round-trip.  6 trials per count, interleaved; the spread
        # (median-based slope vs min-based slope) is recorded so the
        # pallas/xla margin can be judged against the noise it carries.
        n1, n2, trials = 20, 120, 6

        def timed(count):
            t0 = time.perf_counter()
            for i in range(count):
                o = fn(variants[i % len(variants)])
            np.asarray(o.success)  # fetch forces remote completion
            return time.perf_counter() - t0

        t1s, t2s = [], []
        for _ in range(trials):
            t1s.append(timed(n1))
            t2s.append(timed(n2))
        slope_min = (min(t2s) - min(t1s)) / (n2 - n1)
        # Spread = slope from the SECOND-smallest totals vs the smallest:
        # reproducibility of the fast path.  (A median-based spread mixes
        # in whole-tunnel stall events that hit both decoders alike and
        # says nothing about which decoder is faster.)
        nd = lambda xs: sorted(xs)[1]
        slope_2nd = (nd(t2s) - nd(t1s)) / (n2 - n1)
        med = lambda xs: sorted(xs)[len(xs) // 2]
        if slope_min <= 0:
            # A pathological tunnel stall made a 20-dispatch trial slower
            # than every 120-dispatch trial: the slope is meaningless, so
            # record the row as noise-dominated instead of publishing a
            # negative/infinite rate (advisor r4).
            out[f"{name}_cw_per_s"] = None
            out[f"{name}_noise_dominated"] = True
        else:
            out[f"{name}_cw_per_s"] = round(B / slope_min, 1)
            out[f"{name}_spread_pct"] = round(
                100.0 * abs(slope_2nd - slope_min) / slope_min, 1)
        out[f"{name}_t_ms"] = {
            "n20_min": round(min(t1s) * 1e3, 2),
            "n120_min": round(min(t2s) * 1e3, 2),
            "n20_2nd": round(nd(t1s) * 1e3, 2),
            "n120_2nd": round(nd(t2s) * 1e3, 2),
            "n20_med": round(med(t1s) * 1e3, 2),
            "n120_med": round(med(t2s) * 1e3, 2),
        }
        out[f"{name}_decode_ok"] = round(ok, 4)
    if out.get("pallas_cw_per_s") and out.get("xla_cw_per_s"):
        out["pallas_margin_pct"] = round(
            100.0 * (out["pallas_cw_per_s"] / out["xla_cw_per_s"] - 1.0), 1)

    # Serving latency: one 4-CW control frame through decode_batch.
    small = np.ascontiguousarray(llr[:4])
    fac = np.full(4, MIN_SUM_FACTOR, np.float32)
    decode_batch(small, fac, rate)  # warm/compile
    times = []
    for _ in range(15):
        t0 = time.perf_counter()
        r = decode_batch(small, fac, rate)
        np.asarray(r.success)
        times.append(time.perf_counter() - t0)
    out["serving_decode_ms"] = round(float(np.median(times)) * 1e3, 2)
    return out


def main() -> None:
    import jax

    # Persistent compilation cache: the remote TPU compile service shows
    # transient multi-minute latencies; caching makes repeat runs immune.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)

    # ---- chain 1: MC-DPSK (headline) ----
    rx, variants, batch, window = _mc_dpsk_case(rng)
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
    dt, out = _bench_chain(rx, variants, iters)
    samples_per_s = batch * window * iters / dt
    frames_per_s = batch * iters / dt
    vs_realtime = samples_per_s / 48000.0

    # ---- chain 2: OFDM DQPSK R1/2 @ 15 dB (north-star config #3) ----
    orx, ovariants, obatch, owindow = _ofdm_case(rng)
    oout = orx(ovariants[0])
    jax.block_until_ready(oout)
    ook = np.asarray(oout.cw_success)
    odet = np.asarray(oout.detected)
    oiters = 60
    odt, oout = _bench_chain(orx, ovariants, oiters)
    ofdm_sps = obatch * owindow * oiters / odt

    # ---- chain 3: coherent QAM64 R3/4 @ 25 dB (north-star config #4) ----
    qrx, qvariants, qbatch, qwindow = _coherent_case(rng)
    qout = qrx(qvariants[0])
    jax.block_until_ready(qout)
    qok = np.asarray(qout.cw_success)
    qdet = np.asarray(qout.detected)
    qdt, qout = _bench_chain(qrx, qvariants, oiters)
    q_sps = qbatch * qwindow * oiters / qdt

    ldpc = _ldpc_metrics(rng)

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
            "ofdm": {
                "mode": "DQPSK R1_2 @ 15 dB (config #3)",
                "samples_per_s": round(ofdm_sps, 1),
                "vs_realtime": round(ofdm_sps / 48000.0, 2),
                "frames_decoded_per_s": round(obatch * oiters / odt, 2),
                "detected": int(odet.sum()),
                "cw_decode_rate": round(float(ook.mean()), 4),
            },
            "coherent": {
                "mode": "QAM64 R3_4 @ 25 dB (config #4)",
                "samples_per_s": round(q_sps, 1),
                "vs_realtime": round(q_sps / 48000.0, 2),
                "frames_decoded_per_s": round(qbatch * oiters / qdt, 2),
                "detected": int(qdet.sum()),
                "cw_decode_rate": round(float(qok.mean()), 4),
            },
            "ldpc": ldpc,
        },
    }))


if __name__ == "__main__":
    main()
