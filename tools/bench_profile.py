"""Stage-level profile of the headline RX bench: where does the time go?

Times each jitted stage of the bench pipeline separately (sync search,
frame slice + demod, LDPC decode) at the bench geometry, so optimization
effort lands on the dominant stage.  Not part of the test suite.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def timeit(fn, args_list, iters=12):
    """Pipelined timing over DISTINCT pre-transferred inputs.

    The remote-TPU runtime pipelines dispatch; timing must (a) rotate
    distinct device buffers and (b) block only once at the end, mirroring
    bench.py. args_list: list of argument tuples.
    """
    import jax
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ria_tpu.fec.ldpc import make_decoder
    from ria_tpu.fec.ldpc import make_encoder
    from ria_tpu.fec.ldpc_matrix import RECOMMENDED_ITERS, get_code
    from ria_tpu.phy.pipeline import make_rx_pipeline, make_tx_pipeline
    from ria_tpu.sync.chirp import detect_dual_chirp
    from ria_tpu.wave.mc_dpsk import MCDPSKConfig, demodulate

    cfg = MCDPSKConfig(num_carriers=10, bits_per_symbol=1)
    ncw = 4
    num_bits = ncw * 648
    batch = 64
    window = cfg.frame_samples(num_bits) + 12000

    rng = np.random.default_rng(0)
    code = get_code("R1_4")
    info = rng.integers(0, 2, size=(batch * ncw, code.k)).astype(np.uint8)
    coded = np.asarray(make_encoder("R1_4")(info)).reshape(batch, num_bits)
    tx = np.asarray(make_tx_pipeline(cfg, ncw)(coded))
    audio = np.zeros((batch, window), np.float32)
    lead = 4000
    audio[:, lead:lead + tx.shape[1]] = tx
    snr_db = 10.0
    rms = float(np.sqrt((audio ** 2).mean()))
    audio += rng.normal(0, rms * 10 ** (-snr_db / 20), audio.shape).astype(np.float32)
    # Distinct device buffers (tiny dither) so runtime-level shortcuts on
    # repeated identical executions cannot skew the measurement.
    NBUF = 4
    auds = [jax.device_put(audio + rng.normal(0, 1e-4, audio.shape).astype(np.float32))
            for _ in range(NBUF)]
    audio_d = auds[0]

    # Stage 1: sync search
    sync_fn = jax.jit(lambda a: detect_dual_chirp(a, cfg.chirp))
    t_sync = timeit(sync_fn, [(a,) for a in auds])

    # Stage 2: slice + demod (with fixed start/cfo inputs)
    n_sym = cfg.num_data_symbols(num_bits)
    frame_need = (cfg.training_symbols + 1 + n_sym * cfg.spreading) * cfg.samples_per_symbol
    start = jnp.full((batch,), lead + cfg.chirp.total_samples, jnp.int32)
    cfo = jnp.zeros((batch,), jnp.float32)

    def demod_fn(a, s, c):
        frames = jax.vmap(lambda x, i: jax.lax.dynamic_slice(x, (i,), (frame_need,)))(a, s)
        return demodulate(frames, c, cfg, n_sym)

    demod_j = jax.jit(demod_fn)
    t_demod = timeit(demod_j, [(a, start, cfo) for a in auds])

    # Stage 3: LDPC decode on the demod soft bits
    softs = []
    for a in auds:
        soft = demod_j(a, start, cfo).soft_bits[..., :num_bits].reshape(
            batch * ncw, 648)
        softs.append(jax.device_put(np.asarray(soft)))
    dec = jax.jit(make_decoder("R1_4", RECOMMENDED_ITERS["R1_4"], 0.75))
    t_ldpc = timeit(dec, [(s_,) for s_ in softs])

    # Full pipeline for reference
    rx = make_rx_pipeline(cfg, "R1_4", ncw, window, batch_hint=batch)
    t_full = timeit(rx, [(a,) for a in auds])

    total_samples = batch * window
    print(f"geometry: batch={batch} window={window} ncw={ncw}")
    for name, t in [("sync", t_sync), ("demod", t_demod), ("ldpc", t_ldpc),
                    ("full", t_full)]:
        print(f"{name:6s} {t * 1e3:8.2f} ms  {total_samples / t / 1e6:9.1f} Msamp/s")


if __name__ == "__main__":
    main()
