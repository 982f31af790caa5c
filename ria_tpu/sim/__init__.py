from .channel import (
    ChannelConfig, ChannelResult, PRESETS, apply_channel,
    awgn, good, moderate, poor, flutter,
)

__all__ = [
    "ChannelConfig", "ChannelResult", "PRESETS", "apply_channel",
    "awgn", "good", "moderate", "poor", "flutter",
]
