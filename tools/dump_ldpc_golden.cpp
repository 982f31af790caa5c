// Golden-vector dumper: compiles the READ-ONLY reference LDPC implementation
// (mounted at /root/reference) into a standalone binary and dumps encoded
// codewords for fixed test inputs.  Used only to VERIFY that ria_tpu's
// from-scratch matrix construction is bit-compatible; no reference code is
// linked into or shipped with the framework itself.
//
// Build (see tools/make_golden.sh):
//   g++ -std=c++20 -O2 -I/root/reference/include -I/root/reference/src \
//       tools/dump_ldpc_golden.cpp /root/reference/src/fec/ldpc_encoder.cpp \
//       /root/reference/src/fec/ldpc_decoder.cpp -o /tmp/dump_ldpc_golden
#include "ultra/fec.hpp"
#include <cstdio>
#include <cstdint>
#include <vector>
#include <string>

using namespace ultra;

static void dump(CodeRate rate, const char* name) {
    LDPCEncoder enc(rate);
    // Deterministic pseudo-random payload: xorshift bytes
    uint32_t s = 0xC0FFEE01u;
    std::vector<uint8_t> data(81);  // > one block for every rate
    for (auto& b : data) {
        s ^= s << 13; s ^= s >> 17; s ^= s << 5;
        b = static_cast<uint8_t>(s & 0xFF);
    }
    ByteSpan span(data.data(), data.size());
    Bytes coded = enc.encode(span);
    std::printf("%s in ", name);
    for (uint8_t b : data) std::printf("%02x", b);
    std::printf(" out ");
    for (uint8_t b : coded) std::printf("%02x", b);
    std::printf("\n");

    // Round-trip through the reference decoder as a sanity check.
    LDPCDecoder dec(rate);
    ByteSpan cspan(coded.data(), coded.size());
    Bytes decoded = dec.decode(cspan);
    std::printf("%s roundtrip %s\n", name, dec.lastDecodeSuccess() ? "OK" : "FAIL");
}

int main() {
    dump(CodeRate::R1_4, "R1_4");
    dump(CodeRate::R1_2, "R1_2");
    dump(CodeRate::R2_3, "R2_3");
    dump(CodeRate::R3_4, "R3_4");
    dump(CodeRate::R5_6, "R5_6");
    return 0;
}
