#!/bin/sh
# Regenerate golden vectors from the read-only reference (requires /root/reference).
set -e
g++ -std=c++20 -O2 -I/root/reference/include -I/root/reference/src \
    tools/dump_ldpc_golden.cpp /root/reference/src/fec/ldpc_encoder.cpp \
    /root/reference/src/fec/ldpc_decoder.cpp -o /tmp/dump_ldpc_golden
/tmp/dump_ldpc_golden > tests/golden/ldpc_golden.txt
