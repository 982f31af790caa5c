"""Time-block sharding of long sample streams with halo exchange.

The reference handles its unbounded "sequence dimension" (the 48 kHz audio
stream) with a single-threaded 20 s ring buffer and a sliding-window search
cursor (streaming_decoder.cpp:386-470).  The TPU-native equivalent — required
by SURVEY.md §2.12 / the north star — is to shard the stream itself: a long
window [T] is split into contiguous time blocks laid over a 1D ``t`` mesh
axis, and the three stream-crossing computations each exchange exactly the
halo they need over ICI (``jax.lax.ppermute``):

1. **Sync search** — each device correlates its block extended by a
   right-halo of one full preamble, so a chirp straddling a shard boundary is
   found by the shard that owns its first sample; the per-shard best peaks
   are combined with one tiny ``all_gather`` + argmax.
2. **Mix-integrate demod (sequence parallelism)** — once the (replicated)
   frame start is known, each device demodulates exactly the MC symbols whose
   first sample lies in its block (a symbol straddling the boundary reads
   into the halo), producing a [sym_cap, C] slab of carrier integrals; the
   global [S, C] symbol matrix is assembled with one ``psum`` scatter-add.
   The heavy O(S·sps·C) mixer-bank matmul is thus fully distributed; the
   cheap differential/LLR stage runs replicated via the SAME numeric kernel
   the single-chip path uses (wave.mc_dpsk.soft_from_zsym).
3. **FIR filtering** — classic overlap-save: each device prepends a left-halo
   of (taps-1) neighbor samples, convolves, and keeps its own block.

There is no reference counterpart to cite for the parallelism itself (the
reference is single-process C++); the numeric contracts are those of
wave/mc_dpsk.py and sync/chirp.py, which these functions reuse unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ria_tpu.fec.ldpc import make_decoder
from ria_tpu.fec.ldpc_matrix import RECOMMENDED_ITERS
from ria_tpu.sync.chirp import detect_dual_chirp
from ria_tpu.wave.mc_dpsk import MCDPSKConfig, _synth_matrix, soft_from_zsym

LDPC_BITS = 648


def make_stream_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1D time-block mesh.  Device order = time order, so halo exchange is a
    nearest-neighbor ppermute that rides ICI links on a real slice."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("t",))


# --------------------------------------------------------------------- FIR
def make_sharded_fir(mesh: Mesh, taps: np.ndarray, block_samples: int):
    """Overlap-save FIR over [ch, T] with T sharded on the ``t`` axis.

    Bit-identical to the unsharded causal FIR y[i] = sum_k h[k] x[i-k]
    (zero history before sample 0): each device fetches the last (K-1)
    samples of its left neighbor, convolves the extended block, and keeps
    its own span.  One K-1-sample ppermute per call is the only traffic.
    """
    n = mesh.shape["t"]
    K = int(len(taps))
    h = jnp.asarray(np.asarray(taps, np.float32))
    perm = [(k, k + 1) for k in range(n - 1)]  # send right; dev 0 gets zeros

    def fir(x: jnp.ndarray) -> jnp.ndarray:  # local [ch, block]
        tail = x[:, block_samples - (K - 1):]
        left = jax.lax.ppermute(tail, "t", perm)
        ext = jnp.concatenate([left, x], axis=-1)
        nfft = 1 << (ext.shape[-1] + K - 2).bit_length()
        y = jnp.fft.irfft(jnp.fft.rfft(ext, nfft) * jnp.fft.rfft(h, nfft), nfft)
        return y[:, K - 1 : K - 1 + block_samples].astype(x.dtype)

    sharded = shard_map(fir, mesh=mesh, in_specs=P(None, "t"),
                        out_specs=P(None, "t"))
    return jax.jit(sharded,
                   in_shardings=NamedSharding(mesh, P(None, "t")),
                   out_shardings=NamedSharding(mesh, P(None, "t")))


# ------------------------------------------------------------ stream search
def _gather_best(detected, start, corr, cfo, block_samples: int):
    """Combine per-shard detections: all_gather tiny scalars, pick the peak."""
    i = jax.lax.axis_index("t")
    ok = detected & (start >= 0) & (start < block_samples)
    score = jnp.where(ok, corr, -1.0)
    allc = jax.lax.all_gather(score, "t")                       # [n]
    alls = jax.lax.all_gather(start + i * block_samples, "t")   # [n]
    allf = jax.lax.all_gather(cfo, "t")
    best = jnp.argmax(allc)
    return allc[best] > 0.0, alls[best], allf[best]


def make_stream_search(mesh: Mesh, chirp_cfg, block_samples: int,
                       halo: int | None = None):
    """Sharded dual-chirp search over a long stream [n*block_samples].

    Returns jitted fn: audio [T] -> (detected, start, cfo_hz), replicated.
    halo defaults to one full preamble + timing margin so a boundary-
    straddling preamble is wholly visible to the shard owning its start.
    """
    n = mesh.shape["t"]
    if halo is None:
        halo = chirp_cfg.total_samples + 4800
    assert halo <= block_samples, "halo must fit in one block"
    perm = [(k + 1, k) for k in range(n - 1)]  # send left; last dev gets zeros

    def search(local: jnp.ndarray):
        right = jax.lax.ppermute(local[:halo], "t", perm)
        ext = jnp.concatenate([local, right])
        res = detect_dual_chirp(ext, chirp_cfg)
        corr = jnp.maximum(res.up_corr, res.down_corr)
        return _gather_best(res.detected, res.start, corr, res.cfo_hz,
                            block_samples)

    sharded = shard_map(search, mesh=mesh, in_specs=P("t"),
                        out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(sharded, in_shardings=NamedSharding(mesh, P("t")))


# ---------------------------------------------------------------- stream RX
@functools.lru_cache(maxsize=None)
def _stream_geometry(cfg: MCDPSKConfig, num_codewords: int, block_samples: int):
    num_bits = num_codewords * LDPC_BITS
    D = cfg.num_data_symbols(num_bits)
    S_all = cfg.training_symbols + 1 + D * cfg.spreading
    frame_need = cfg.chirp.total_samples + S_all * cfg.samples_per_symbol
    sym_cap = block_samples // cfg.samples_per_symbol + 2
    return num_bits, D, S_all, frame_need, sym_cap


def make_stream_rx(mesh: Mesh, cfg: MCDPSKConfig, rate: str,
                   num_codewords: int, block_samples: int):
    """Full sharded stream RX: audio [n*block] -> dict of replicated results.

    Pipeline per the module docstring: halo'd chirp search, sequence-parallel
    mix-integrate, psum symbol assembly, replicated differential/LLR + LDPC.
    The frame may land anywhere in the stream, including straddling any
    number of shard boundaries.
    """
    n = mesh.shape["t"]
    sps = cfg.samples_per_symbol
    C = cfg.num_carriers
    num_bits, D, S_all, frame_need, sym_cap = _stream_geometry(
        cfg, num_codewords, block_samples)
    total = n * block_samples
    halo = max(cfg.chirp.total_samples + 4800, sps)
    assert halo <= block_samples, (
        f"block_samples {block_samples} must cover one preamble halo {halo}")
    assert frame_need <= total, "stream shorter than one frame"
    decoder = make_decoder(rate, RECOMMENDED_ITERS[rate])
    Mmix = np.conj(_synth_matrix(cfg)) / sps  # [sps, C] numpy constant
    perm = [(k + 1, k) for k in range(n - 1)]

    def stage(local: jnp.ndarray):
        i = jax.lax.axis_index("t")
        right = jax.lax.ppermute(local[:halo], "t", perm)
        ext = jnp.concatenate([local, right])          # [block + halo]

        res = detect_dual_chirp(ext, cfg.chirp)
        corr = jnp.maximum(res.up_corr, res.down_corr)
        detected, g_start, cfo = _gather_best(res.detected, res.start, corr,
                                              res.cfo_hz, block_samples)
        g_start = jnp.clip(jnp.where(detected, g_start, 0), 0,
                           total - frame_need)
        data_start = g_start + cfg.chirp.total_samples

        # Symbols owned by this shard: global symbol k iff its first sample
        # data_start + k*sps lies in [i*block, (i+1)*block).
        lo = i * block_samples
        first = jnp.clip(-((data_start - lo) // sps), 0, S_all)
        nxt = jnp.clip(-((data_start - lo - block_samples) // sps), 0, S_all)
        k_slots = first + jnp.arange(sym_cap, dtype=jnp.int32)
        offs = data_start + k_slots * sps - lo          # local sample offsets
        offs = jnp.clip(offs, 0, block_samples + halo - sps)
        rows = jax.vmap(lambda o: jax.lax.dynamic_slice(ext, (o,), (sps,)))(offs)

        # CFO rotation with phase origin at the frame start (k*sps + j),
        # matching wave.mc_dpsk.demodulate's factored ramp exactly.
        w = (2.0 * jnp.pi / cfg.sample_rate) * cfo
        rot_in = jnp.exp(-1j * w * jnp.arange(sps, dtype=jnp.float32))
        rot_sym = jnp.exp(-1j * w * (k_slots.astype(jnp.float32) * sps))
        z = (rows.astype(jnp.complex64) * rot_in) @ jnp.asarray(Mmix)
        z = z * rot_sym[:, None]                        # [sym_cap, C]
        valid = k_slots < nxt
        z = jnp.where(valid[:, None], z, 0.0)

        # Assemble the global symbol matrix: contiguous per-shard slabs,
        # one dynamic_update_slice + psum.
        buf = jnp.zeros((S_all + sym_cap, C), jnp.complex64)
        buf = jax.lax.dynamic_update_slice(buf, z, (first, 0))
        zsym = jax.lax.psum(buf[:S_all], "t")
        return detected, g_start, cfo, zsym

    sharded = shard_map(stage, mesh=mesh, in_specs=P("t"),
                        out_specs=(P(), P(), P(), P()), check_vma=False)

    def rx(audio: jnp.ndarray):
        detected, start, cfo, zsym = sharded(audio)
        res = soft_from_zsym(zsym, cfg, D)
        soft = res.soft_bits[:num_bits].reshape(num_codewords, LDPC_BITS)
        dec = decoder(soft)
        return {
            "detected": detected,
            "start": start,
            "cfo_hz": cfo,
            "cw_success": dec.success & detected,
            "info_bits": dec.info_bits,
            "soft_bits": soft,
            "snr_db": res.snr_estimate_db,
        }

    return jax.jit(rx, in_shardings=NamedSharding(mesh, P("t")))
