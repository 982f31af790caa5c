"""Compare ria_tpu's OFDM TX chain stage-by-stage against the reference dump.

Usage: python tools/interop/compare_stages.py /tmp/interop/ref_stages.txt
Reads the `ref_dump` output and checks each stage against the ria_tpu
equivalents, printing the first divergence.
"""
from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def parse_stages(path: str) -> dict:
    out = {}
    for line in open(path):
        name, _, rest = line.strip().partition(" ")
        if name in ("chanperm", "frameperm"):
            out[name] = np.array([int(x) for x in rest.split()])
        elif name == "config":
            out[name] = dict(kv.split("=") for kv in rest.split())
        else:
            out[name] = bytes.fromhex(rest)
    return out


def bits_of(b: bytes) -> np.ndarray:
    return np.unpackbits(np.frombuffer(b, np.uint8))


def main() -> int:
    stages = parse_stages(sys.argv[1] if len(sys.argv) > 1 else "/tmp/interop/ref_stages.txt")

    from ria_tpu.phy.frame_v2 import DataFrame, encode_fixed_frame, make_fixed_data_frame
    from ria_tpu.fec.ldpc import LDPCCodec
    from ria_tpu.fec.interleave import channel_perm, frame_perm

    ok = True

    # Stage 1: frame bytes
    f = DataFrame.make_data("ALPHA", "BRAVO", 1, b"HELLO INTEROP")
    mine = f.serialize()
    ref = stages["frame"]
    if mine == ref:
        print(f"frame bytes: MATCH ({len(ref)} B)")
    else:
        ok = False
        print(f"frame bytes: MISMATCH\n  ref : {ref.hex()}\n  mine: {mine.hex()}")
        diff = [i for i in range(min(len(ref), len(mine))) if ref[i] != mine[i]]
        print(f"  first diffs at bytes {diff[:8]} (len ref={len(ref)} mine={len(mine)})")

    # Stage 2: per-CW LDPC (pad frame to 4 CW info bytes, encode each)
    codec = LDPCCodec("R1_4")
    bpc = 20
    padded = ref + b"\x00" * (4 * bpc - len(ref))
    for cw in range(4):
        chunk = padded[cw * bpc: (cw + 1) * bpc]
        coded = codec.encode(chunk)
        refcw = stages[f"cw{cw}"]
        if bytes(coded) == refcw:
            print(f"cw{cw} LDPC: MATCH")
        else:
            ok = False
            mb = bits_of(bytes(coded)); rb = bits_of(refcw)
            nd = int((mb != rb).sum())
            print(f"cw{cw} LDPC: MISMATCH ({nd}/648 bits differ)")
            print(f"  ref : {refcw.hex()[:80]}...")
            print(f"  mine: {bytes(coded).hex()[:80]}...")

    # Stage 3: channel interleaver permutation
    bps = int(stages["config"]["bits_per_symbol"])
    mine_cp = channel_perm(bps)
    ref_cp = stages["chanperm"]
    # ref chanperm: out[i] = original index at position i
    if np.array_equal(mine_cp, ref_cp):
        print(f"channel perm (bps={bps}): MATCH")
    else:
        ok = False
        # check inverse relationship
        inv = np.empty_like(mine_cp); inv[mine_cp] = np.arange(len(mine_cp))
        rel = "inverse" if np.array_equal(inv, ref_cp) else "different"
        print(f"channel perm (bps={bps}): MISMATCH ({rel})")
        print(f"  ref [:16]: {ref_cp[:16]}")
        print(f"  mine[:16]: {mine_cp[:16]}")

    # Stage 4: frame interleaver permutation
    mine_fp = frame_perm()
    ref_fp = stages["frameperm"]
    if np.array_equal(mine_fp, ref_fp):
        print("frame perm: MATCH")
    else:
        ok = False
        inv = np.empty_like(mine_fp); inv[mine_fp] = np.arange(len(mine_fp))
        rel = "inverse" if np.array_equal(inv, ref_fp) else "different"
        print(f"frame perm: MISMATCH ({rel})")
        print(f"  ref [:16]: {ref_fp[:16]}")
        print(f"  mine[:16]: {mine_fp[:16]}")

    # Stage 5: full fixed-frame encode
    for name, chan in (("fixed", True), ("fixed_nochan", False)):
        try:
            mine_fx = encode_fixed_frame(ref, "R1_4",
                channel_interleave_bits_per_symbol=(bps if chan else None))
        except TypeError:
            import inspect
            print("encode_fixed_frame signature:",
                  inspect.signature(encode_fixed_frame))
            raise
        mine_b = np.packbits(np.asarray(mine_fx, np.uint8)).tobytes() \
            if not isinstance(mine_fx, (bytes, bytearray)) else bytes(mine_fx)
        if mine_b == stages[name]:
            print(f"{name}: MATCH")
        else:
            ok = False
            nd = int((bits_of(mine_b) != bits_of(stages[name])).sum())
            print(f"{name}: MISMATCH ({nd}/2592 bits differ)")

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
