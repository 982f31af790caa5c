"""Device-mesh scale-out for the modem pipelines.

The reference is a single-process C++ program (SURVEY.md §2.12); parallelism
here is a new first-class component: independent channels (audio streams) are
data-parallel over a `ch` mesh axis, and the batched-LDPC codeword dimension
is additionally spread over a `cw` axis, so belief propagation scales across
chips even when few channels are active.  XLA inserts the reshard collectives
(all-to-all over ICI) at the annotated boundaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ria_tpu.fec.ldpc import make_decoder
from ria_tpu.fec.ldpc_matrix import RECOMMENDED_ITERS
from ria_tpu.phy.pipeline import LDPC_BITS, RxBatchResult
from ria_tpu.sync.chirp import detect_dual_chirp
from ria_tpu.wave.mc_dpsk import MCDPSKConfig, demodulate


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """2D mesh (ch x cw); cw gets a factor of 2 when device count allows."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    cw = 2 if n % 2 == 0 and n >= 2 else 1
    ch = n // cw
    dev_array = np.asarray(devices).reshape(ch, cw)
    return Mesh(dev_array, axis_names=("ch", "cw"))


def make_sharded_rx(mesh: Mesh, cfg: MCDPSKConfig, rate: str, num_codewords: int,
                    window_samples: int):
    """Jitted multi-chip RX: audio [B, window] sharded over `ch`; the LDPC
    codeword batch resharded over (ch, cw) so BP uses the whole mesh."""
    num_bits = num_codewords * LDPC_BITS
    n_sym = cfg.num_data_symbols(num_bits)
    frame_need = (cfg.training_symbols + 1 + n_sym * cfg.spreading) * cfg.samples_per_symbol
    decoder_fn = make_decoder(rate, RECOMMENDED_ITERS[rate])

    audio_sharding = NamedSharding(mesh, P("ch", None))
    cw_sharding = NamedSharding(mesh, P(("ch", "cw"), None))

    def rx(audio: jnp.ndarray) -> RxBatchResult:
        B = audio.shape[0]
        sync = detect_dual_chirp(audio, cfg.chirp)
        start = jnp.clip(sync.start + cfg.chirp.total_samples, 0,
                         max(window_samples - frame_need, 0))
        frames = jax.vmap(lambda a, s: jax.lax.dynamic_slice(a, (s,), (frame_need,)))(audio, start)
        demod = demodulate(frames, sync.cfo_hz, cfg, n_sym)
        soft = demod.soft_bits[..., :num_bits].reshape(B * num_codewords, LDPC_BITS)
        # Reshard: spread codewords across the full mesh for BP.
        soft = jax.lax.with_sharding_constraint(soft, cw_sharding)
        dec = decoder_fn(soft)
        k = dec.info_bits.shape[-1]
        return RxBatchResult(
            detected=sync.detected,
            start=sync.start,
            cfo_hz=sync.cfo_hz,
            cw_success=dec.success.reshape(B, num_codewords) & sync.detected[:, None],
            info_bits=dec.info_bits.reshape(B, num_codewords, k),
            iterations=dec.iterations.reshape(B, num_codewords),
            snr_db=demod.snr_estimate_db,
        )

    return jax.jit(rx, in_shardings=audio_sharding)
