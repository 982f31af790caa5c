"""Pallas TPU kernel for LDPC min-sum belief propagation.

The whole BP loop runs inside one kernel per batch tile: messages stay in
VMEM across iterations (no HBM round-trips between iterations) and each
tile exits as soon as ITS codewords converge — decoupling stragglers at
tile granularity instead of stalling the whole batch (the XLA while_loop
exits only when every codeword in the call is done).

Numeric contract identical to ria_tpu.fec.ldpc.make_decoder: normalized
min-sum (factor 0.75/0.9375), clamp +/-50, hard-decision parity early exit,
positive LLR => bit 0.  The edge gather/scatter uses the same static one-hot
matrix as MXU dots (large static gathers segfault this TPU toolchain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ria_tpu.fec.ldpc import DecodeResult
from ria_tpu.fec.ldpc_matrix import (
    LLR_CLAMP, MIN_SUM_FACTOR, RECOMMENDED_ITERS, get_code,
)


@functools.lru_cache(maxsize=None)
def make_pallas_decoder(rate: str, tile: int = 128, max_iters: int | None = None,
                        min_sum_factor: float = MIN_SUM_FACTOR):
    """Batched decoder: llrs [B, 648] (B % tile == 0) -> DecodeResult."""
    code = get_code(rate)
    if max_iters is None:
        max_iters = RECOMMENDED_ITERS[rate]
    m, n, k, D = code.m, code.n, code.k, code.max_degree
    mD = m * D
    gather = code.gather.astype(np.float32)      # [mD, n]
    mask = code.row_mask                         # [m, D]

    def kernel(llr_ref, gather_ref, gather_t_ref, mask_ref, out_llr_ref,
               out_ok_ref, out_iters_ref):
        llr_in = llr_ref[:]                      # [T, n]
        G = gather_ref[:]                        # [mD, n]
        GT = gather_t_ref[:]                     # [n, mD]
        T = llr_in.shape[0]
        maskb = (mask_ref[:] > 0.5)[None, :, :]  # [1, m, D]

        def check_update(v2c):
            neg = jnp.where(maskb & (v2c < 0), 1.0, 0.0)
            # Sign product via negative-count parity (reduce_prod is not
            # lowerable in Pallas TPU).
            neg_parity = jnp.sum(neg, axis=-1, keepdims=True) % 2.0
            sign_prod = 1.0 - 2.0 * neg_parity
            sgn = jnp.where(maskb & (v2c < 0), -1.0, 1.0)
            absv = jnp.where(maskb, jnp.abs(v2c), jnp.inf)
            min1 = jnp.min(absv, axis=-1, keepdims=True)
            is_min = absv == min1
            ties = jnp.sum(jnp.where(is_min, 1.0, 0.0), axis=-1, keepdims=True) > 1.0
            min2 = jnp.min(jnp.where(is_min, jnp.inf, absv), axis=-1, keepdims=True)
            # Tie-aware self-exclusion without argmin: a tied minimum edge
            # still sees min1 from its twin.
            excl = jnp.where(is_min, jnp.where(ties, min1, min2), min1)
            return jnp.where(maskb, sign_prod * sgn * excl * min_sum_factor, 0.0)

        def parity_ok(llr_total):
            hard = (llr_total < 0).astype(jnp.float32)
            eb = jnp.dot(hard, GT, preferred_element_type=jnp.float32)
            syn = jnp.sum(eb.reshape(T, m, D), axis=-1) % 2.0
            return jnp.all(syn == 0.0, axis=-1)

        v2c0 = jnp.dot(llr_in, GT, preferred_element_type=jnp.float32).reshape(T, m, D)

        def cond(carry):
            _, _, done, _, it = carry
            return (it < max_iters) & ~jnp.all(done)

        def body(carry):
            v2c, llr_total, done, iters, it = carry
            c2v = check_update(v2c)
            llr_new = llr_in + jnp.dot(c2v.reshape(T, mD), G,
                                       preferred_element_type=jnp.float32)
            v2c_new = jnp.dot(llr_new, GT,
                              preferred_element_type=jnp.float32).reshape(T, m, D) - c2v
            v2c_new = jnp.clip(v2c_new, -LLR_CLAMP, LLR_CLAMP)
            ok = parity_ok(llr_new)
            upd = ~done
            llr_total = jnp.where(upd[:, None], llr_new, llr_total)
            v2c = jnp.where(upd[:, None, None], v2c_new, v2c)
            iters = iters + upd.astype(jnp.int32)
            return (v2c, llr_total, done | ok, iters, it + 1)

        init = (v2c0, llr_in, jnp.zeros(T, bool), jnp.zeros(T, jnp.int32),
                jnp.int32(0))
        _, llr_total, done, iters, _ = jax.lax.while_loop(cond, body, init)
        out_llr_ref[:] = llr_total
        out_ok_ref[:] = done[:, None].astype(jnp.int32)
        out_iters_ref[:] = iters[:, None]

    gather_t = np.ascontiguousarray(gather.T)
    mask_f32 = mask.astype(np.float32)

    @jax.jit
    def decode(llrs: jnp.ndarray) -> DecodeResult:
        B = llrs.shape[0]
        assert B % tile == 0, f"batch {B} not a multiple of tile {tile}"
        grid = (B // tile,)
        llr_total, ok, iters = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((mD, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, mD), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, n), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
            ],
        )(llrs.astype(jnp.float32), gather, gather_t, mask_f32)
        info = (llr_total[:, :k] < 0).astype(jnp.uint8)
        return DecodeResult(info, ok[:, 0].astype(bool), iters[:, 0], llr_total)

    return decode
