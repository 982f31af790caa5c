// Interop debug harness: links the reference's libultra_core.a and dumps
// intermediate TX-chain stages so the ria_tpu Python chain can be compared
// stage-by-stage.  This is a TEST FIXTURE GENERATOR, not product code.
//
// Stages dumped (hex on stdout, one "name hexbytes" per line):
//   frame        serialized v2 DataFrame bytes
//   cw<i>        LDPC-coded codeword i (post channel interleave if enabled)
//   fixed        encodeFixedFrame output (channel+frame interleaved, as modulated)
//   fixed_nochan encodeFixedFrame with channel interleave off
//   chanperm     ChannelInterleaver permutation (u16 pairs, for given bps)
//   frameperm    FrameInterleaver permutation (recovered via impulse probing)
// plus float32 sample dumps to files when -o prefix given:
//   <prefix>_preamble.f32, <prefix>_lts.f32, <prefix>_mod.f32

#include "protocol/frame_v2.hpp"
#include "fec/frame_interleaver.hpp"
#include "ultra/fec.hpp"
#include "ultra/ofdm.hpp"
#include "ultra/types.hpp"
#include "waveform/ofdm_chirp_waveform.hpp"

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
    std::string src = "ALPHA", dst = "BRAVO";
    std::string prefix;
    CodeRate rate = CodeRate::R1_4;
    Modulation mod = Modulation::DQPSK;
    int seq = 1;
    for (int i = 1; i < argc; i++) {
        if (!strcmp(argv[i], "-o") && i + 1 < argc) prefix = argv[++i];
        else if (!strcmp(argv[i], "-t") && i + 1 < argc) text = argv[++i];
        else if (!strcmp(argv[i], "-r") && i + 1 < argc) {
            std::string r = argv[++i];
            rate = r == "r1_2" ? CodeRate::R1_2 : r == "r2_3" ? CodeRate::R2_3
                 : r == "r3_4" ? CodeRate::R3_4 : CodeRate::R1_4;
        } else if (!strcmp(argv[i], "-m") && i + 1 < argc) {
            std::string m = argv[++i];
            mod = m == "qam16" ? Modulation::QAM16 : m == "qam64" ? Modulation::QAM64
                : m == "dbpsk" ? Modulation::DBPSK : m == "d8psk" ? Modulation::D8PSK
                : Modulation::DQPSK;
        }
    }

    auto frame = v2::DataFrame::makeData(src, dst, seq, text);
    Bytes fb = frame.serialize();
    hexdump("frame", fb);

    // --- encoder configuration mirroring StreamingEncoder defaults ---
    ModemConfig cfg;
    cfg.fft_size = 1024;
    cfg.num_carriers = 59;
    cfg.sample_rate = 48000;
    cfg.center_freq = 1500.0f;
    cfg.cp_mode = CyclicPrefixMode::MEDIUM;  // ModemEngine pushes MEDIUM (types.hpp:208)
    cfg.modulation = mod;
    cfg.code_rate = rate;
    cfg.use_pilots = true;
    cfg.pilot_spacing = 10;

    OFDMChirpWaveform wf(cfg);
    wf.configure(mod, rate);
    int pilot_spacing = wf.getPilotSpacing() > 0 ? wf.getPilotSpacing() : cfg.pilot_spacing;
    int pilot_count = (cfg.num_carriers + pilot_spacing - 1) / pilot_spacing;
    int data_carriers = cfg.num_carriers - pilot_count;
    int bits_per_carrier = (mod == Modulation::DBPSK) ? 1
        : (mod == Modulation::DQPSK) ? 2 : (mod == Modulation::D8PSK) ? 3
        : (mod == Modulation::QAM16) ? 4 : (mod == Modulation::QAM32) ? 5 : 6;
    size_t bps = (size_t)data_carriers * bits_per_carrier;
    printf("config data_carriers=%d pilot_spacing=%d bits_per_symbol=%zu\n",
           data_carriers, pilot_spacing, bps);

    // Per-codeword LDPC output, no interleaving
    {
        size_t bpc = v2::getBytesPerCodeword(rate);
        size_t total = v2::FIXED_FRAME_CODEWORDS * bpc;
        Bytes padded = fb;
        padded.resize(total, 0);
        LDPCEncoder enc(rate);
        for (int cw = 0; cw < v2::FIXED_FRAME_CODEWORDS; cw++) {
            Bytes chunk(padded.begin() + cw * bpc, padded.begin() + (cw + 1) * bpc);
            auto coded = enc.encode(chunk);
            char name[16];
            snprintf(name, sizeof name, "cw%d", cw);
            hexdump(name, coded);
        }
    }

    Bytes fixed = v2::encodeFixedFrame(fb, rate, true, bps);
    hexdump("fixed", fixed);
    Bytes fixed_nochan = v2::encodeFixedFrame(fb, rate, false, bps);
    hexdump("fixed_nochan", fixed_nochan);

    // Channel interleaver permutation via float impulses
    {
        ChannelInterleaver ci(bps, v2::LDPC_CODEWORD_BITS);
        std::vector<float> ramp(v2::LDPC_CODEWORD_BITS);
        for (size_t i = 0; i < ramp.size(); i++) ramp[i] = (float)i;
        auto out = ci.interleave(std::span<const float>(ramp));
        printf("chanperm");
        for (auto v : out) printf(" %d", (int)v);
        printf("\n");
    }
    // Frame interleaver permutation: interleave float ramp 0..2591
    {
        std::vector<std::vector<float>> soft(v2::FIXED_FRAME_CODEWORDS);
        for (int cw = 0; cw < v2::FIXED_FRAME_CODEWORDS; cw++) {
            soft[cw].resize(v2::LDPC_CODEWORD_BITS);
            for (size_t i = 0; i < soft[cw].size(); i++)
                soft[cw][i] = (float)(cw * v2::LDPC_CODEWORD_BITS + i);
        }
        auto inter = fec::FrameInterleaver::interleaveSoft(soft);
        printf("frameperm");
        for (auto v : inter) printf(" %d", (int)v);
        printf("\n");
    }

    if (!prefix.empty()) {
        Samples pre = wf.generatePreamble();
        writef32(prefix + "_preamble.f32", pre);
        Samples lts = wf.generateDataPreamble();
        writef32(prefix + "_lts.f32", lts);
        Samples modsamp = wf.modulate(fixed);
        writef32(prefix + "_mod.f32", modsamp);
        // full light frame = lts + mod (what `ria ptx` emits in connected mode)
        Samples full;
        full.insert(full.end(), lts.begin(), lts.end());
        full.insert(full.end(), modsamp.begin(), modsamp.end());
        writef32(prefix + "_light.f32", full);
    }
    return 0;
}
