"""Wall-clock threaded two-station simulator (threaded_simulator tier).

Mirrors the reference's realtime/threading integration test
(tools/threaded_simulator.cpp): each station runs in its own thread against
a shared wall-clock 48 kHz "air" with always-on channel noise and random
PTT-delay jitter, exercising the whole Station runtime (ring buffering,
decode scheduling, protocol timers) under real concurrency.
"""

from __future__ import annotations

import threading
import time

import numpy as np

from ria_tpu.phy.station import Station
from ria_tpu.protocol.connection import ConnectionConfig
from ria_tpu.sim.channel import ChannelConfig
from ria_tpu.runtime import native


class ContinuousAudioSimulator:
    def __init__(self, channel_cfg: ChannelConfig, seed: int = 42,
                 block_ms: float = 100.0, realtime_factor: float = 0.0,
                 ptt_jitter_ms: float = 0.0):
        """realtime_factor: 1.0 = wall-clock pacing, 0 = as fast as possible."""
        self.channel_cfg = channel_cfg
        self.block = int(48000 * block_ms / 1000.0)
        self.block_ms = block_ms
        self.realtime = realtime_factor
        self.ptt_jitter_ms = ptt_jitter_ms
        self.alpha = Station("ALPHA", ConnectionConfig())
        self.bravo = Station("BRAVO", ConnectionConfig())
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._rng = np.random.default_rng(seed)
        if native.available():
            self._air_ab = native.NativeRingBuffer(48000 * 30)
            self._air_ba = native.NativeRingBuffer(48000 * 30)
        else:
            self._air_ab = self._air_ba = None
            self._buf_ab = np.zeros(0, np.float32)
            self._buf_ba = np.zeros(0, np.float32)
        nat = native.available()
        self._ch_ab = native.NativeWatterson(
            channel_cfg.snr_db, channel_cfg.delay_spread_ms,
            channel_cfg.doppler_spread_hz, channel_cfg.cfo_hz, 48000, seed,
            channel_cfg.fading_enabled, channel_cfg.multipath_enabled,
            channel_cfg.noise_enabled) if nat else None
        self._ch_ba = native.NativeWatterson(
            channel_cfg.snr_db, channel_cfg.delay_spread_ms,
            channel_cfg.doppler_spread_hz, channel_cfg.cfo_hz, 48000, seed + 1,
            channel_cfg.fading_enabled, channel_cfg.multipath_enabled,
            channel_cfg.noise_enabled) if nat else None

    def _station_loop(self, me: Station, peer_dir: str):
        from ria_tpu.utils.logging import set_station_tag

        set_station_tag(me.callsign)
        while not self._stop.is_set():
            t0 = time.monotonic()
            # Backpressure: a real sound card blocks the writer at a few
            # blocks of latency; without this the protocol's virtual clock
            # (one tick per produced block) races ahead of the audio stream.
            my_air = self._air_ab if peer_dir == "ab" else self._air_ba
            while (my_air is not None and len(my_air) > 4 * self.block
                   and not self._stop.is_set()):
                time.sleep(0.001)
            with self._lock:
                # PTT lead jitter: delay the START of a new burst only
                # (per-block shifting would corrupt the stream).
                if (self.ptt_jitter_ms > 0 and me.tx_pending
                        and not getattr(me, "_ptt_active", False)):
                    jitter = int(self._rng.uniform(0, self.ptt_jitter_ms) * 48)
                    if jitter:
                        me.tx_queue.insert(0, np.zeros(jitter, np.float32))
                me._ptt_active = me.tx_pending
                tx = me.pull_tx(self.block)
                ch = self._ch_ab if peer_dir == "ab" else self._ch_ba
                out = ch.process(tx) if ch is not None else tx
                air = self._air_ab if peer_dir == "ab" else self._air_ba
                if air is not None:
                    air.write(out)
                elif peer_dir == "ab":
                    self._buf_ab = np.concatenate([self._buf_ab, out])
                else:
                    self._buf_ba = np.concatenate([self._buf_ba, out])
                # Receive from the opposite air: drain EVERYTHING available
                # (like an audio callback), so a slower decode loop cannot
                # fall behind the peer's production rate.
                rx_air = self._air_ba if peer_dir == "ab" else self._air_ab
                if rx_air is not None:
                    rx = rx_air.read(len(rx_air))
                elif peer_dir == "ab":
                    rx, self._buf_ba = self._buf_ba, np.zeros(0, np.float32)
                else:
                    rx, self._buf_ab = self._buf_ab, np.zeros(0, np.float32)
                if len(rx):
                    me.feed_audio(rx)
            # Protocol time follows this station's own TX stream (one block
            # per iteration); draining an RX backlog is catching up, not
            # time passing.
            me.tick(int(self.block_ms))
            if self.realtime > 0:
                dt = time.monotonic() - t0
                sleep = self.block_ms / 1000.0 / self.realtime - dt
                if sleep > 0:
                    time.sleep(sleep)

    def run(self, duration_s: float, until=None) -> bool:
        ta = threading.Thread(target=self._station_loop, args=(self.alpha, "ab"), daemon=True)
        tb = threading.Thread(target=self._station_loop, args=(self.bravo, "ba"), daemon=True)
        ta.start()
        tb.start()
        deadline = time.monotonic() + duration_s
        ok = False
        while time.monotonic() < deadline:
            if until is not None and until():
                ok = True
                break
            time.sleep(0.02)
        self._stop.set()
        ta.join(timeout=5)
        tb.join(timeout=5)
        return ok if until is not None else True
