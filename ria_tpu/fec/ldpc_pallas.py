"""Pallas TPU kernel for LDPC min-sum belief propagation.

The whole BP loop runs inside one kernel per batch tile: messages stay in
VMEM across iterations (no HBM round-trips between iterations) and each
tile exits as soon as ITS codewords converge — decoupling stragglers at
tile granularity instead of stalling the whole batch (the XLA while_loop
exits only when every codeword in the call is done).

Mosaic-friendly layout: the edge dimension is unrolled into D per-degree
slots, each with its own one-hot [m, n] gather matrix, so every tensor in
the kernel is 2D (<=128 x 648 / 648 x 486) — Mosaic cannot lower 2D->3D
lane reshapes, and large static gathers segfault this toolchain, so both
are avoided: gather/scatter are MXU dots, reductions over the degree axis
are elementwise chains across the D slot buffers.

Numeric contract identical to ria_tpu.fec.ldpc.make_decoder: normalized
min-sum, clamp +/-50, hard-decision parity early exit, positive LLR => bit 0.
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

_BIG = 1e9


@functools.lru_cache(maxsize=None)
def make_pallas_decoder(rate: str, tile: int = 128,
                        max_iters: int | None = None,
                        min_sum_factor: float = MIN_SUM_FACTOR,
                        interpret: bool = False):
    """Fused-dot BP kernel (the default; numeric contract identical to the
    original per-slot-dot kernel below, bit-equal outputs verified in
    tests/test_ldpc_pallas.py, measured +3-6% on TPU at full-iteration
    geometry).

    v1 issues 2*D separate [T,n]x[n,m] MXU dots per iteration (one per
    degree slot, gather + scatter).  Here the D one-hot slot matrices are
    packed side-by-side into single wide operands — gather becomes ONE
    [T,n]x[n,D*mp] dot and scatter ONE [T,D*mp]x[D*mp,n] dot — with each
    slot padded to mp = ceil(m/128)*128 lanes so per-slot views stay
    lane-aligned (Mosaic pads [T,m] to the same mp internally, so the
    padding adds no VPU work).  The check update keeps an incremental
    two-minimum recurrence (min2 counts duplicate minima, which makes the
    separate tie-counting pass of v1 unnecessary).  Fewer, larger MXU
    dispatches and ~2 fewer VPU passes per iteration."""
    code = get_code(rate)
    if max_iters is None:
        max_iters = RECOMMENDED_ITERS[rate]
    m, n, k, D = code.m, code.n, code.k, code.max_degree
    mp = ((m + 127) // 128) * 128

    # Packed one-hot operands: gather Gp [n, D*mp], scatter Sp [D*mp, n].
    Gp = np.zeros((n, D * mp), np.float32)
    for i in range(m):
        for d in range(D):
            if code.row_mask[i, d]:
                Gp[code.row_idx[i, d], d * mp + i] = 1.0
    Sp = np.ascontiguousarray(Gp.T)
    Gp = Gp.astype(jnp.bfloat16)
    Sp = Sp.astype(jnp.bfloat16)
    # Per-slot edge masks, replicated shape [D, mp] -> kernel reads rows.
    maskp = np.zeros((D, mp), np.float32)
    maskp[:, :m] = code.row_mask.T
    ones_mn = np.ones((mp, n), dtype=jnp.bfloat16)

    def kernel(llr_ref, fac_ref, g_ref, s_ref, mask_ref, ones_ref,
               out_llr_ref, out_ok_ref, out_iters_ref):
        llr_in = llr_ref[:]                          # [T, n]
        masks = [mask_ref[d, :][None, :] > 0.5 for d in range(D)]  # [1, mp]
        fac_m = fac_ref[:, :mp]                      # row-constant [T, mp]

        def gather_all(x):
            # ONE wide dot: [T, n] @ [n, D*mp] -> [T, D*mp]
            return jnp.dot(x.astype(jnp.bfloat16), g_ref[:],
                           preferred_element_type=jnp.float32)

        def scatter_all(msgs_big):
            # ONE wide dot: [T, D*mp] @ [D*mp, n] -> [T, n]
            return jnp.dot(msgs_big.astype(jnp.bfloat16), s_ref[:],
                           preferred_element_type=jnp.float32)

        def slot(x, d):
            return x[:, d * mp:(d + 1) * mp]

        def check_update(v2c_big):
            # Incremental two-minimum over the D slots: min2 counts
            # duplicate minima, so a slot holding THE minimum reads the
            # second-smallest (== min1 when duplicated) without a
            # tie-count pass.
            absv, negs = [], []
            min1 = None
            min2 = None
            neg_sum = None
            for d in range(D):
                v = slot(v2c_big, d)
                a = jnp.where(masks[d], jnp.abs(v), _BIG)
                s = jnp.where(masks[d] & (v < 0), 1.0, 0.0)
                absv.append(a)
                negs.append(s)
                if min1 is None:
                    min1, min2, neg_sum = a, jnp.full_like(a, _BIG), s
                else:
                    min2 = jnp.minimum(min2, jnp.maximum(min1, a))
                    min1 = jnp.minimum(min1, a)
                    neg_sum = neg_sum + s
            sign_prod = 1.0 - 2.0 * (neg_sum % 2.0)
            out = []
            for d in range(D):
                excl = jnp.where(absv[d] == min1, min2, min1)
                sgn = 1.0 - 2.0 * negs[d]
                out.append(jnp.where(masks[d],
                                     sign_prod * sgn * excl * fac_m, 0.0))
            return jnp.concatenate(out, axis=1)     # [T, D*mp]

        def flags_from_syndrome(syn):
            bad = jnp.where(syn % 2.0 != 0.0, 1.0, 0.0)        # [T, mp]
            bad_n = jnp.dot(bad.astype(jnp.bfloat16), ones_ref[:],
                            preferred_element_type=jnp.float32)  # [T, n]
            ok_n = jnp.where(bad_n > 0.0, 0.0, 1.0)
            ok_m = slot(gather_all_ok(ok_n), 0)
            ok_m = jnp.where(ok_m > 0.0, 1.0, 0.0)
            return ok_m, ok_n

        def gather_all_ok(x):
            # slot-0 gather only (cheap path used for flag replication)
            return jnp.dot(x.astype(jnp.bfloat16), g_ref[:, :mp],
                           preferred_element_type=jnp.float32)

        v2c0 = gather_all(llr_in)

        def cond(carry):
            done_n = carry[3]
            return (carry[-1] < max_iters) & (jnp.min(done_n) < 0.5)

        def body(carry):
            v2c_big, llr_total, done_m, done_n, iters_n, it = carry
            c2v_big = check_update(v2c_big)
            llr_new = llr_in + scatter_all(c2v_big)
            upd_m = 1.0 - done_m                    # [T, mp]
            upd_n = 1.0 - done_n                    # [T, n]
            g_big = gather_all(llr_new)             # serves v2c AND syndrome
            v2c_next = jnp.clip(g_big - c2v_big, -LLR_CLAMP, LLR_CLAMP)
            upd_big = jnp.concatenate([upd_m] * D, axis=1)
            v2c_big = jnp.where(upd_big > 0.5, v2c_next, v2c_big)
            syn = None
            for d in range(D):
                hard_d = jnp.where(masks[d] & (slot(g_big, d) < 0), 1.0, 0.0)
                syn = hard_d if syn is None else syn + hard_d
            ok_m, ok_n = flags_from_syndrome(syn)
            llr_total = jnp.where(upd_n > 0.5, llr_new, llr_total)
            iters_n = iters_n + upd_n
            done_m = jnp.maximum(done_m, ok_m)
            done_n = jnp.maximum(done_n, ok_n)
            return (v2c_big, llr_total, done_m, done_n, iters_n, it + 1)

        zero_m = slot(v2c0, 0) * 0.0
        zero_n = llr_in * 0.0
        init = (v2c0, llr_in, zero_m, zero_n, zero_n, jnp.int32(0))
        _, llr_total, _, done_n, iters_n, _ = jax.lax.while_loop(cond, body, init)
        out_llr_ref[:] = llr_total
        out_ok_ref[:] = done_n
        out_iters_ref[:] = iters_n

    @jax.jit
    def decode(llrs: jnp.ndarray, factors: jnp.ndarray | None = None) -> DecodeResult:
        B = llrs.shape[0]
        assert B % tile == 0, f"batch {B} not a multiple of tile {tile}"
        if factors is None:
            factors = jnp.full((B,), min_sum_factor, jnp.float32)
        fac_n = jnp.broadcast_to(factors.astype(jnp.float32)[:, None], (B, n))
        grid = (B // tile,)
        llr_total, ok, iters = pl.pallas_call(
            kernel,
            grid=grid,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, D * mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D * mp, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((mp, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, n), jnp.float32),
                jax.ShapeDtypeStruct((B, n), jnp.float32),
                jax.ShapeDtypeStruct((B, n), jnp.float32),
            ],
        )(llrs.astype(jnp.float32), fac_n, Gp, Sp, maskp, ones_mn)
        info = (llr_total[:, :k] < 0).astype(jnp.uint8)
        return DecodeResult(info, ok[:, 0] > 0.5,
                            iters[:, 0].astype(jnp.int32), llr_total)

    return decode


@functools.lru_cache(maxsize=None)
def make_pallas_decoder_v1(rate: str, tile: int = 128, max_iters: int | None = None,
                           min_sum_factor: float = MIN_SUM_FACTOR,
                           interpret: bool = False):
    """Original per-degree-slot-dot kernel, kept for A/B benchmarking
    (tools/pallas_bench.py).  Batched decoder: llrs [B, 648]
    (B % tile == 0) -> DecodeResult.

    interpret=True runs the kernel through the Pallas interpreter (any
    backend, no Mosaic) — used by the CPU test suite to validate kernel
    logic; on-TPU compilation is exercised by tools/pallas_bench.py.
    """
    code = get_code(rate)
    if max_iters is None:
        max_iters = RECOMMENDED_ITERS[rate]
    m, n, k, D = code.m, code.n, code.k, code.max_degree

    # Per-degree-slot one-hot gathers: G[d][check, var] = 1 when edge slot d
    # of that check connects to var.
    G = np.zeros((D, m, n), np.float32)
    for i in range(m):
        for d in range(D):
            if code.row_mask[i, d]:
                G[d, i, code.row_idx[i, d]] = 1.0
    GT = np.ascontiguousarray(np.swapaxes(G, 1, 2))  # [D, n, m]
    # bf16 one-hots: fp32 G+GT would need 17.6 MB of VMEM (> 16 MB); bf16
    # halves that, and 0/1 values with fp32 accumulation stay exact.
    G = G.astype(jnp.bfloat16)
    GT = GT.astype(jnp.bfloat16)
    slot_mask = code.row_mask.astype(np.float32)     # [m, D] -> pass as [D, m]
    slot_mask_dm = np.ascontiguousarray(slot_mask.T)
    ones_mn = np.ones((m, n), dtype=jnp.bfloat16)    # lane-broadcast matmuls

    def kernel(llr_ref, fac_ref, g_ref, gt_ref, mask_ref, ones_ref,
               out_llr_ref, out_ok_ref, out_iters_ref):
        llr_in = llr_ref[:]                          # [T, n]
        T = llr_in.shape[0]
        masks = [mask_ref[d, :][None, :] > 0.5 for d in range(D)]  # [1, m] each

        def gather_d(x, d):
            # [T, n] @ [n, m] -> [T, m] (bf16 x bf16 -> fp32 accumulate)
            return jnp.dot(x.astype(jnp.bfloat16), gt_ref[d],
                           preferred_element_type=jnp.float32)

        # Per-row min-sum factor, replicated across the check lane dim:
        # fac_ref is [T, n] row-constant; slot-0 gather (every check has
        # degree >= 1) reads it back as row-constant [T, m].
        fac_m = jnp.dot(fac_ref[:].astype(jnp.bfloat16), gt_ref[0],
                        preferred_element_type=jnp.float32)

        def scatter_sum(msgs):
            # sum_d msgs[d] @ G[d]: [T, m] @ [m, n] -> [T, n]
            acc = jnp.dot(msgs[0].astype(jnp.bfloat16), g_ref[0],
                          preferred_element_type=jnp.float32)
            for d in range(1, D):
                acc = acc + jnp.dot(msgs[d].astype(jnp.bfloat16), g_ref[d],
                                    preferred_element_type=jnp.float32)
            return acc

        def check_update(v2c):
            absv = [jnp.where(masks[d], jnp.abs(v2c[d]), _BIG) for d in range(D)]
            negs = [jnp.where(masks[d] & (v2c[d] < 0), 1.0, 0.0) for d in range(D)]
            neg_sum = negs[0]
            min1 = absv[0]
            for d in range(1, D):
                neg_sum = neg_sum + negs[d]
                min1 = jnp.minimum(min1, absv[d])
            sign_prod = 1.0 - 2.0 * (neg_sum % 2.0)
            ties = jnp.zeros_like(min1)
            for d in range(D):
                ties = ties + jnp.where(absv[d] == min1, 1.0, 0.0)
            min2 = jnp.full_like(min1, _BIG)
            for d in range(D):
                min2 = jnp.minimum(min2, jnp.where(absv[d] == min1, _BIG, absv[d]))
            out = []
            for d in range(D):
                is_min = absv[d] == min1
                excl = jnp.where(is_min, jnp.where(ties > 1.0, min1, min2), min1)
                sgn = jnp.where(masks[d] & (v2c[d] < 0), -1.0, 1.0)
                out.append(jnp.where(masks[d], sign_prod * sgn * excl
                                     * fac_m, 0.0))
            return out

        def flags_from_syndrome(syn):
            """Per-codeword convergence flags replicated across a full lane
            dim: ([T, m], [T, n]) floats, 1.0 = all checks satisfied.
            Mosaic cannot lay out [T, 1] vectors (invalid-relayout on
            replicated minor dims), so per-row scalars are broadcast across
            lanes with ones-matrix matmuls instead of keepdims reductions."""
            bad = jnp.where(syn % 2.0 != 0.0, 1.0, 0.0)        # [T, m]
            # row-sum of bad, replicated across n lanes: [T,m] @ [m,n] ones
            bad_n = jnp.dot(bad.astype(jnp.bfloat16), ones_ref[:],
                            preferred_element_type=jnp.float32)  # [T, n]
            ok_n = jnp.where(bad_n > 0.0, 0.0, 1.0)
            # replicate back across m lanes the same way
            ok_m = gather_d(ok_n, 0)
            ok_m = jnp.where(ok_m > 0.0, 1.0, 0.0)
            return ok_m, ok_n

        v2c0 = [gather_d(llr_in, d) for d in range(D)]

        def cond(carry):
            done_n = carry[3]  # [T, n] float, columns identical per row
            return (carry[-1] < max_iters) & (jnp.min(done_n) < 0.5)

        def body(carry):
            v2c_t, llr_total, done_m, done_n, iters_n, it = carry
            v2c = list(v2c_t)
            c2v = check_update(v2c)
            llr_new = llr_in + scatter_sum(c2v)
            upd_m = 1.0 - done_m  # [T, m]
            upd_n = 1.0 - done_n  # [T, n]
            # One gather per degree slot serves BOTH the v2c update and the
            # syndrome: the gathered posterior's sign is the gathered hard
            # bit (drops D redundant [T,n]x[n,m] dots per iteration).
            v2c_new = []
            syn = None
            for d in range(D):
                g = gather_d(llr_new, d)
                v = jnp.clip(g - c2v[d], -LLR_CLAMP, LLR_CLAMP)
                v2c_new.append(jnp.where(upd_m > 0.5, v, v2c[d]))
                hard_d = jnp.where(masks[d] & (g < 0), 1.0, 0.0)
                syn = hard_d if syn is None else syn + hard_d
            ok_m, ok_n = flags_from_syndrome(syn)
            llr_total = jnp.where(upd_n > 0.5, llr_new, llr_total)
            iters_n = iters_n + upd_n
            done_m = jnp.maximum(done_m, ok_m)
            done_n = jnp.maximum(done_n, ok_n)
            return (tuple(v2c_new), llr_total, done_m, done_n, iters_n, it + 1)

        # derive zeros from data, not jnp.zeros: constant inits get a fully
        # replicated Mosaic layout that the loop-carried update (tiled
        # {0,0}) cannot be relayouted back to.
        zero_m = v2c0[0] * 0.0
        zero_n = llr_in * 0.0
        init = (tuple(v2c0), llr_in, zero_m, zero_n, zero_n, jnp.int32(0))
        _, llr_total, _, done_n, iters_n, _ = jax.lax.while_loop(cond, body, init)
        out_llr_ref[:] = llr_total
        out_ok_ref[:] = done_n
        out_iters_ref[:] = iters_n

    @jax.jit
    def decode(llrs: jnp.ndarray, factors: jnp.ndarray | None = None) -> DecodeResult:
        B = llrs.shape[0]
        assert B % tile == 0, f"batch {B} not a multiple of tile {tile}"
        if factors is None:
            factors = jnp.full((B,), min_sum_factor, jnp.float32)
        fac_n = jnp.broadcast_to(factors.astype(jnp.float32)[:, None], (B, n))
        grid = (B // tile,)
        llr_total, ok, iters = pl.pallas_call(
            kernel,
            grid=grid,
            compiler_params=pltpu.CompilerParams(
                # ~16.8 MB live at tile=128 (bf16 one-hots + 7-slot message
                # buffers); the 16 MB default scoped limit is conservative,
                # v5e VMEM is 128 MB.
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, m, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, n, m), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, n), jnp.float32),
                jax.ShapeDtypeStruct((B, n), jnp.float32),
                jax.ShapeDtypeStruct((B, n), jnp.float32),
            ],
        )(llrs.astype(jnp.float32), fac_n, G, GT, slot_mask_dm, ones_mn)
        info = (llr_total[:, :k] < 0).astype(jnp.uint8)
        return DecodeResult(info, ok[:, 0] > 0.5,
                            iters[:, 0].astype(jnp.int32), llr_total)

    return decode
