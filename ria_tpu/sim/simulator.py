"""Dual-station lock-step simulator (the cli_simulator equivalent).

Two complete modem stacks (Station = waveforms + connection + ARQ) joined by
independent Watterson channels in each direction, advancing in fixed audio
blocks of virtual time (reference tools/cli_simulator.cpp: 10 ms ticks; here
larger blocks since processing is batched).  Deterministic via seeded
channels and virtual-time protocol timers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ria_tpu.phy.station import Station
from ria_tpu.protocol.connection import ConnectionConfig, ConnectionState
from ria_tpu.sim.channel import ChannelConfig, apply_channel, awgn


@dataclass
class SimResult:
    connected: bool = False
    messages_delivered: list = field(default_factory=list)
    messages_delivered_b: list = field(default_factory=list)
    disconnect_clean: bool = False
    ticks: int = 0
    stats_a: dict = field(default_factory=dict)
    stats_b: dict = field(default_factory=dict)


class DualStationSim:
    def __init__(self, channel_cfg: ChannelConfig | None = None, seed: int = 42,
                 block_ms: float = 200.0, config_a: ConnectionConfig | None = None,
                 config_b: ConnectionConfig | None = None,
                 save_signals: str | None = None):
        self.channel_cfg = channel_cfg or awgn(15.0)
        self.block = int(48000 * block_ms / 1000.0)
        self.block_ms = block_ms
        self.alpha = Station("ALPHA", config_a)
        self.bravo = Station("BRAVO", config_b)
        self.key_ab = jax.random.PRNGKey(seed)
        self.key_ba = jax.random.PRNGKey(seed + 1)
        self.ticks = 0
        # Signal capture (--save-signals equivalent, cli_simulator.cpp:2540):
        # raw f32 traces of what each station hears.
        self._capture = None
        if save_signals:
            self._capture = {
                "ab": open(f"{save_signals}_alpha_to_bravo.f32", "wb"),
                "ba": open(f"{save_signals}_bravo_to_alpha.f32", "wb"),
            }

    def _channel(self, x: np.ndarray, direction: str) -> np.ndarray:
        key = self.key_ab if direction == "ab" else self.key_ba
        key, sub = jax.random.split(key)
        if direction == "ab":
            self.key_ab = key
        else:
            self.key_ba = key
        out = apply_channel(jnp.asarray(x), sub, self.channel_cfg).samples
        return np.asarray(out, np.float32)

    def step(self):
        """One lock-step audio block in both directions."""
        a_tx = self.alpha.pull_tx(self.block)
        b_tx = self.bravo.pull_tx(self.block)
        ab = self._channel(a_tx, "ab")
        ba = self._channel(b_tx, "ba")
        if self._capture:
            self._capture["ab"].write(ab.tobytes())
            self._capture["ba"].write(ba.tobytes())
        self.bravo.feed_audio(ab)
        self.alpha.feed_audio(ba)
        self.alpha.tick(int(self.block_ms))
        self.bravo.tick(int(self.block_ms))
        self.ticks += 1

    def close(self):
        if self._capture:
            for f in self._capture.values():
                f.close()
            self._capture = None

    def run_until(self, predicate, max_ticks: int = 400) -> bool:
        while self.ticks < max_ticks:
            self.step()
            if predicate():
                return True
        return False

    def both_connected(self) -> bool:
        return (self.alpha.conn.state == ConnectionState.CONNECTED and
                self.bravo.conn.state == ConnectionState.CONNECTED)
