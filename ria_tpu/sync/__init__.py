from .chirp import ChirpConfig, ChirpSyncResult, detect_dual_chirp, generate

__all__ = ["ChirpConfig", "ChirpSyncResult", "detect_dual_chirp", "generate"]
