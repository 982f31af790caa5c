from .ldpc_matrix import BLOCK_BITS, CODE_PARAMS, RATE_ENUM, RECOMMENDED_ITERS, get_code, encode_np
from .ldpc import LDPCCodec, make_decoder, make_encoder, DecodeResult

__all__ = [
    "BLOCK_BITS",
    "CODE_PARAMS",
    "RATE_ENUM",
    "RECOMMENDED_ITERS",
    "get_code",
    "encode_np",
    "LDPCCodec",
    "make_decoder",
    "make_encoder",
    "DecodeResult",
]
