#!/usr/bin/env bash
# Generate reference-binary interop fixtures for tests/test_interop.py.
#
# Builds the reference `ria` CLI (tools/build_reference.sh) and captures its
# ptx output for the canonical cross-decode modes into
# tests/golden/interop/.  Each fixture is raw float32 @ 48 kHz.  The
# payload/callsigns are fixed so the test can assert exact frame contents.
set -euo pipefail
cd "$(dirname "$0")/.."
RIA=build_ref/ria
[ -x "$RIA" ] || tools/build_reference.sh
OUT=tests/golden/interop
mkdir -p "$OUT"
TEXT="HELLO INTEROP"

$RIA ptx "$TEXT" -s ALPHA -d BRAVO -w ofdm   -m dqpsk -r r1_4 -o $OUT/ref_ofdm_dqpsk_r1_4.f32 2>/dev/null
$RIA ptx "$TEXT" -s ALPHA -d BRAVO -w ofdm   -m dqpsk -r r1_2 -o $OUT/ref_ofdm_dqpsk_r1_2.f32 2>/dev/null
$RIA ptx "$TEXT" -s ALPHA -d BRAVO -w ofdm   -m dqpsk -r r2_3 -o $OUT/ref_ofdm_dqpsk_r2_3.f32 2>/dev/null
$RIA ptx "$TEXT" -s ALPHA -d BRAVO -w ofdm   -m dqpsk -r r3_4 -o $OUT/ref_ofdm_dqpsk_r3_4.f32 2>/dev/null
$RIA ptx "$TEXT" -s ALPHA -d BRAVO -w ofdm   -m d8psk -r r1_2 -o $OUT/ref_ofdm_d8psk_r1_2.f32 2>/dev/null
$RIA ptx "$TEXT" -s ALPHA -d BRAVO -w ofdm   -m qam16 -r r1_2 -o $OUT/ref_ofdm_qam16_r1_2.f32 2>/dev/null
$RIA ptx "$TEXT" -s ALPHA -d BRAVO -w ofdm   -m qam32 -r r3_4 -o $OUT/ref_ofdm_qam32_r3_4.f32 2>/dev/null
$RIA ptx "$TEXT" -s ALPHA -d BRAVO -w cox    -m qpsk  -r r1_2 -o $OUT/ref_cox_qpsk_r1_2.f32   2>/dev/null
$RIA ptx "$TEXT" -s ALPHA -d BRAVO -w cox    -m qam16 -r r3_4 -o $OUT/ref_cox_qam16_r3_4.f32  2>/dev/null
$RIA ptx "$TEXT" -s ALPHA -d BRAVO -w cox    -m qam64 -r r3_4 -o $OUT/ref_cox_qam64_r3_4.f32  2>/dev/null
$RIA ptx "$TEXT" -s ALPHA -d BRAVO -w mcdpsk -m dqpsk -r r1_4 -o $OUT/ref_mcdpsk_dqpsk_r1_4.f32 2>/dev/null
$RIA ptx ping -s ALPHA -o $OUT/ref_ping.f32 2>/dev/null
ls -la $OUT/
