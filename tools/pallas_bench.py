"""Benchmark the Pallas LDPC BP kernel vs the XLA matmul decoder on TPU.

The Pallas kernel keeps BP messages resident in VMEM across iterations and
early-exits per 128-codeword tile; the XLA while_loop decoder round-trips
HBM each iteration and exits only when the whole batch converges.

Usage: python tools/pallas_bench.py [--rate R1_4] [--batch 512] [--snr-db -1]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", default="R1_4")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--snr-db", type=float, default=-1.0)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args(argv)

    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    from ria_tpu.fec.ldpc import make_decoder, make_encoder
    from ria_tpu.fec.ldpc_matrix import get_code
    from ria_tpu.fec.ldpc_pallas import make_pallas_decoder, make_pallas_decoder_v1

    code = get_code(args.rate)
    rng = np.random.default_rng(0)
    B = args.batch
    info = rng.integers(0, 2, (B, code.k)).astype(np.uint8)
    coded = np.asarray(make_encoder(args.rate)(info)).astype(np.float64)
    sigma = 10 ** (-args.snr_db / 20)
    y = (1 - 2.0 * coded) + rng.normal(0, sigma, coded.shape)
    llr = jax.device_put((2 * y / sigma**2).astype(np.float32))

    results = {}
    for name, dec in [("pallas", make_pallas_decoder(args.rate, tile=args.tile)),
                      ("pallas1", make_pallas_decoder_v1(args.rate, tile=args.tile)),
                      ("xla", make_decoder(args.rate))]:
        r = dec(llr)
        jax.block_until_ready(r.llr_total)
        ok = float(np.asarray(r.success).mean())
        bits = np.asarray(r.info_bits)
        acc = float((bits[np.asarray(r.success)] ==
                     info[np.asarray(r.success)]).mean())
        for _ in range(3):
            out = dec(llr)
        jax.block_until_ready(out.llr_total)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = dec(llr)
        jax.block_until_ready(out.llr_total)
        dt = (time.perf_counter() - t0) / args.reps
        results[name] = B / dt
        print(f"{name:8s} ok={ok:.3f} bitacc={acc:.5f} "
              f"{B/dt:,.0f} cw/s ({dt*1e3:.2f} ms/batch)", flush=True)
    print(f"speedup pallas/xla: {results['pallas']/results['xla']:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
