// MC-DPSK interop dump harness (cf. ref_dump.cpp): links the reference's
// libultra_core.a and writes the stages of an MC-DPSK light DATA frame so
// the ria_tpu chain can be compared stage-by-stage.  TEST FIXTURE ONLY.

#include "protocol/frame_v2.hpp"
#include "ultra/types.hpp"
#include "waveform/mc_dpsk_waveform.hpp"
#include "waveform/waveform_factory.hpp"

#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

using namespace ultra;
namespace v2 = ultra::protocol::v2;

static void hexdump(const char* name, const Bytes& b) {
    printf("%s ", name);
    for (auto x : b) printf("%02x", x);
    printf("\n");
}

static void writef32(const std::string& path, const Samples& s) {
    std::ofstream f(path, std::ios::binary);
    f.write(reinterpret_cast<const char*>(s.data()), s.size() * sizeof(float));
    fprintf(stderr, "wrote %zu samples to %s\n", s.size(), path.c_str());
}

int main(int argc, char** argv) {
    std::string text = "HELLO INTEROP";
    std::string prefix = "/tmp/interop/mc";
    Modulation mod = Modulation::DQPSK;
    CodeRate rate = CodeRate::R1_4;
    int carriers = 10;
    for (int i = 1; i < argc; i++) {
        if (!strcmp(argv[i], "-o") && i + 1 < argc) prefix = argv[++i];
        else if (!strcmp(argv[i], "-t") && i + 1 < argc) text = argv[++i];
        else if (!strcmp(argv[i], "-m") && i + 1 < argc)
            mod = strcmp(argv[i+1], "dbpsk") ? Modulation::DQPSK : Modulation::DBPSK, i++;
        else if (!strcmp(argv[i], "-r") && i + 1 < argc) {
            std::string r = argv[++i];
            rate = r == "r1_2" ? CodeRate::R1_2 : CodeRate::R1_4;
        }
    }

    auto frame = v2::DataFrame::makeData("ALPHA", "BRAVO", 1, text);
    Bytes fb = frame.serialize();
    hexdump("frame", fb);

    // Mirror StreamingEncoder::encodeFrameBytes MC-DPSK path: variable-CW
    // encode at the configured rate + total_cw patch.
    auto cws = v2::encodeFrameWithLDPC(fb, rate);
    uint8_t actual = (uint8_t)cws.size();
    if (fb.size() >= 17 && fb[12] != actual) {
        fb[12] = actual;
        uint16_t hcrc = v2::ControlFrame::calculateCRC(fb.data(), 15);
        fb[15] = (hcrc >> 8) & 0xFF; fb[16] = hcrc & 0xFF;
        uint16_t fcrc = v2::ControlFrame::calculateCRC(fb.data(), fb.size() - 2);
        fb[fb.size()-2] = (fcrc >> 8) & 0xFF; fb[fb.size()-1] = fcrc & 0xFF;
        cws = v2::encodeFrameWithLDPC(fb, rate);
        hexdump("frame_patched", fb);
    }
    Bytes encoded;
    for (size_t i = 0; i < cws.size(); i++) {
        char name[16]; snprintf(name, sizeof name, "cw%zu", i);
        hexdump(name, cws[i]);
        encoded.insert(encoded.end(), cws[i].begin(), cws[i].end());
    }
    printf("ncw %zu\n", cws.size());

    auto wf = WaveformFactory::createMCDPSK(carriers);
    wf->configure(mod, rate);

    Samples pre = wf->generatePreamble();
    writef32(prefix + "_preamble.f32", pre);
    Samples light = wf->generateDataPreamble();
    writef32(prefix + "_lightpre.f32", light);
    Samples modulated = wf->modulate(encoded);
    writef32(prefix + "_mod.f32", modulated);
    Samples full;
    full.insert(full.end(), light.begin(), light.end());
    full.insert(full.end(), modulated.begin(), modulated.end());
    writef32(prefix + "_light.f32", full);
    return 0;
}
