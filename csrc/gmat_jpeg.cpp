// gmat_jpeg.cpp — baseline JFIF entropy codec (host half of the TPU JPEG
// path).  The TPU computes DCT+quantization tiles (gmat_tpu/ops/dct.py);
// this file turns quantized coefficients into standards-compliant JPEG
// bytes and back.  Replaces the reference's nvjpeg fixed-function codec
// (metrans/samples/AppNvjpegDec.cpp) — a TPU has no entropy engine, so
// Huffman coding stays on host in native code.
//
// Coefficient layout at the ABI: per plane, blocks in raster order,
// 64 int16 per block in *zigzag scan* order — the device program does
// the (free) permutation (ops/dct.to_zigzag/from_zigzag), so encode
// reads and decode writes are purely sequential here.  Quant tables
// stay natural-order at the ABI.  Planes are padded to whole MCUs by
// the caller; SOF carries true dims.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#define GJ_API extern "C" __attribute__((visibility("default")))

// thread_local: encode/decode fan out across host threads
// (jpeg_tpu workers=); each caller reads its own error, never a
// concurrent worker's
static thread_local char gj_err[256];

// ---------------------------------------------------------------- tables
static const uint8_t ZIGZAG[64] = {
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63};

static const uint8_t DC_L_BITS[17] = {0,0,1,5,1,1,1,1,1,1,0,0,0,0,0,0,0};
static const uint8_t DC_L_VALS[12] = {0,1,2,3,4,5,6,7,8,9,10,11};
static const uint8_t DC_C_BITS[17] = {0,0,3,1,1,1,1,1,1,1,1,1,0,0,0,0,0};
static const uint8_t DC_C_VALS[12] = {0,1,2,3,4,5,6,7,8,9,10,11};

static const uint8_t AC_L_BITS[17] = {0,0,2,1,3,3,2,4,3,5,5,4,4,0,0,1,0x7d};
static const uint8_t AC_L_VALS[162] = {
    0x01,0x02,0x03,0x00,0x04,0x11,0x05,0x12,0x21,0x31,0x41,0x06,0x13,0x51,
    0x61,0x07,0x22,0x71,0x14,0x32,0x81,0x91,0xa1,0x08,0x23,0x42,0xb1,0xc1,
    0x15,0x52,0xd1,0xf0,0x24,0x33,0x62,0x72,0x82,0x09,0x0a,0x16,0x17,0x18,
    0x19,0x1a,0x25,0x26,0x27,0x28,0x29,0x2a,0x34,0x35,0x36,0x37,0x38,0x39,
    0x3a,0x43,0x44,0x45,0x46,0x47,0x48,0x49,0x4a,0x53,0x54,0x55,0x56,0x57,
    0x58,0x59,0x5a,0x63,0x64,0x65,0x66,0x67,0x68,0x69,0x6a,0x73,0x74,0x75,
    0x76,0x77,0x78,0x79,0x7a,0x83,0x84,0x85,0x86,0x87,0x88,0x89,0x8a,0x92,
    0x93,0x94,0x95,0x96,0x97,0x98,0x99,0x9a,0xa2,0xa3,0xa4,0xa5,0xa6,0xa7,
    0xa8,0xa9,0xaa,0xb2,0xb3,0xb4,0xb5,0xb6,0xb7,0xb8,0xb9,0xba,0xc2,0xc3,
    0xc4,0xc5,0xc6,0xc7,0xc8,0xc9,0xca,0xd2,0xd3,0xd4,0xd5,0xd6,0xd7,0xd8,
    0xd9,0xda,0xe1,0xe2,0xe3,0xe4,0xe5,0xe6,0xe7,0xe8,0xe9,0xea,0xf1,0xf2,
    0xf3,0xf4,0xf5,0xf6,0xf7,0xf8,0xf9,0xfa};
static const uint8_t AC_C_BITS[17] = {0,0,2,1,2,4,4,3,4,7,5,4,4,0,1,2,0x77};
static const uint8_t AC_C_VALS[162] = {
    0x00,0x01,0x02,0x03,0x11,0x04,0x05,0x21,0x31,0x06,0x12,0x41,0x51,0x07,
    0x61,0x71,0x13,0x22,0x32,0x81,0x08,0x14,0x42,0x91,0xa1,0xb1,0xc1,0x09,
    0x23,0x33,0x52,0xf0,0x15,0x62,0x72,0xd1,0x0a,0x16,0x24,0x34,0xe1,0x25,
    0xf1,0x17,0x18,0x19,0x1a,0x26,0x27,0x28,0x29,0x2a,0x35,0x36,0x37,0x38,
    0x39,0x3a,0x43,0x44,0x45,0x46,0x47,0x48,0x49,0x4a,0x53,0x54,0x55,0x56,
    0x57,0x58,0x59,0x5a,0x63,0x64,0x65,0x66,0x67,0x68,0x69,0x6a,0x73,0x74,
    0x75,0x76,0x77,0x78,0x79,0x7a,0x82,0x83,0x84,0x85,0x86,0x87,0x88,0x89,
    0x8a,0x92,0x93,0x94,0x95,0x96,0x97,0x98,0x99,0x9a,0xa2,0xa3,0xa4,0xa5,
    0xa6,0xa7,0xa8,0xa9,0xaa,0xb2,0xb3,0xb4,0xb5,0xb6,0xb7,0xb8,0xb9,0xba,
    0xc2,0xc3,0xc4,0xc5,0xc6,0xc7,0xc8,0xc9,0xca,0xd2,0xd3,0xd4,0xd5,0xd6,
    0xd7,0xd8,0xd9,0xda,0xe2,0xe3,0xe4,0xe5,0xe6,0xe7,0xe8,0xe9,0xea,0xf2,
    0xf3,0xf4,0xf5,0xf6,0xf7,0xf8,0xf9,0xfa};

struct HuffEnc { uint16_t code[256]; uint8_t len[256]; };

static void build_enc(const uint8_t* bits, const uint8_t* vals, int nvals,
                      HuffEnc& h) {
    memset(h.len, 0, sizeof h.len);
    uint16_t code = 0;
    int k = 0;
    for (int l = 1; l <= 16; l++) {
        for (int i = 0; i < bits[l]; i++) {
            if (k >= nvals) return;   // bits[] claiming more codes than
            h.code[vals[k]] = code++; // vals must not read past the end
            h.len[vals[k]] = (uint8_t)l;
            k++;
        }
        code <<= 1;
    }
}

// ---------------------------------------------------------------- writer
// 64-bit accumulator: symbols (<=26 bits for code+magnitude) append
// without per-byte work; bytes drain in batches with JPEG 0xFF stuffing.
struct BitWriter {
    std::vector<uint8_t>& out;
    uint64_t acc = 0;
    int nbits = 0;
    explicit BitWriter(std::vector<uint8_t>& o) : out(o) {}
    inline void drain() {
        while (nbits >= 8) {
            uint8_t b = (uint8_t)(acc >> (nbits - 8));
            out.push_back(b);
            if (b == 0xFF) out.push_back(0x00);
            nbits -= 8;
        }
    }
    inline void put(uint32_t bits, int n) {
        acc = (acc << n) | (uint64_t)(bits & ((1u << n) - 1));
        nbits += n;
        if (nbits >= 32) drain();
    }
    void flush() {
        drain();
        if (nbits > 0) {
            uint8_t b = (uint8_t)((acc << (8 - nbits)) |
                                  ((1 << (8 - nbits)) - 1));
            out.push_back(b);
            if (b == 0xFF) out.push_back(0x00);
            nbits = 0;
        }
    }
};

static inline int bitlen(int v) {
    return v ? 32 - __builtin_clz((unsigned)v) : 0;
}

static void encode_block(BitWriter& bw, const int16_t* z, int& pred,
                         const HuffEnc& dc, const HuffEnc& ac) {
    // z is already in zigzag scan order (device-side permutation):
    // sequential reads; the nonzero mask build vectorizes
    uint64_t mask = 0;     // bit i set = zigzag coefficient i nonzero
    for (int i = 0; i < 64; i++)
        mask |= (uint64_t)(z[i] != 0) << i;
    int diff = z[0] - pred;
    pred = z[0];
    int n = bitlen(diff < 0 ? -diff : diff);
    bw.put(dc.code[n], dc.len[n]);
    if (n) bw.put(diff < 0 ? diff - 1 : diff, n);
    // visit only the nonzero ACs via ctz over the mask (runs fall out
    // of index deltas) — at typical 10-20% density this skips the
    // zero-branch entirely for ~85% of coefficients
    mask &= ~1ull;         // drop DC
    int last = 0;
    while (mask) {
        int i = __builtin_ctzll(mask);
        mask &= mask - 1;
        int run = i - last - 1;
        last = i;
        while (run > 15) {
            bw.put(ac.code[0xF0], ac.len[0xF0]);   // ZRL
            run -= 16;
        }
        int v = z[i];
        // baseline AC magnitude caps at 10 bits; clamp (reachable at
        // quality ~100 where quantizers hit 1)
        if (v > 1023) v = 1023;
        if (v < -1023) v = -1023;
        int s = bitlen(v < 0 ? -v : v);
        bw.put(ac.code[(run << 4) | s], ac.len[(run << 4) | s]);
        bw.put(v < 0 ? v - 1 : v, s);
    }
    if (last != 63) bw.put(ac.code[0x00], ac.len[0x00]);  // EOB
}

static void put_marker(std::vector<uint8_t>& o, uint8_t m) {
    o.push_back(0xFF); o.push_back(m);
}
static void put_u16(std::vector<uint8_t>& o, uint16_t v) {
    o.push_back((uint8_t)(v >> 8)); o.push_back((uint8_t)v);
}

static void put_dht(std::vector<uint8_t>& o, int cls, int id,
                    const uint8_t* bits, const uint8_t* vals, int nvals) {
    put_marker(o, 0xC4);
    put_u16(o, (uint16_t)(2 + 1 + 16 + nvals));
    o.push_back((uint8_t)((cls << 4) | id));
    for (int l = 1; l <= 16; l++) o.push_back(bits[l]);
    o.insert(o.end(), vals, vals + nvals);
}

// Walk every block in MCU scan order: block(comp, ptr64) with comp
// 0=Y 1=U 2=V; boundary() fires at restart-interval edges (not after
// the final MCU).  Shared by the encode pass and the optimize-mode
// symbol-counting pass so both see identical structure.
template <class BF, class RF>
static void walk_blocks(const int16_t* yc, const int16_t* uc,
                        const int16_t* vc, int width, int height,
                        int subsamp, int restart, BF&& block,
                        RF&& boundary) {
    long long total_mcus, mcus_done = 0;
    int mcu_count = 0;
    if (subsamp == 0)
        total_mcus = (long long)((width + 15) / 16) * ((height + 15) / 16);
    else if (subsamp == 3)
        total_mcus = (long long)((width + 15) / 16) * ((height + 7) / 8);
    else
        total_mcus = (long long)((width + 7) / 8) * ((height + 7) / 8);
    auto mcu_end = [&](void) {
        mcus_done++;
        if (restart > 0 && ++mcu_count == restart
            && mcus_done < total_mcus) {
            mcu_count = 0;
            boundary();
        }
    };
    if (subsamp == 0) {
        int mcux = (width + 15) / 16, mcuy = (height + 15) / 16;
        int ybw = mcux * 2, cbw = mcux;
        for (int my = 0; my < mcuy; my++)
            for (int mx = 0; mx < mcux; mx++) {
                for (int by = 0; by < 2; by++)
                    for (int bx = 0; bx < 2; bx++)
                        block(0, yc + ((long long)(my * 2 + by) * ybw
                                       + (mx * 2 + bx)) * 64);
                block(1, uc + ((long long)my * cbw + mx) * 64);
                block(2, vc + ((long long)my * cbw + mx) * 64);
                mcu_end();
            }
    } else if (subsamp == 3) {
        // 4:2:2 MCU = 2 horizontal luma blocks + 1 Cb + 1 Cr
        int mcux = (width + 15) / 16, mcuy = (height + 7) / 8;
        int ybw = mcux * 2, cbw = mcux;
        for (int my = 0; my < mcuy; my++)
            for (int mx = 0; mx < mcux; mx++) {
                for (int bx = 0; bx < 2; bx++)
                    block(0, yc + ((long long)my * ybw + (mx * 2 + bx)) * 64);
                block(1, uc + ((long long)my * cbw + mx) * 64);
                block(2, vc + ((long long)my * cbw + mx) * 64);
                mcu_end();
            }
    } else if (subsamp == 1) {
        int bwid = (width + 7) / 8, bhei = (height + 7) / 8;
        for (int by = 0; by < bhei; by++)
            for (int bx = 0; bx < bwid; bx++) {
                long long idx = (long long)by * bwid + bx;
                block(0, yc + idx * 64);
                block(1, uc + idx * 64);
                block(2, vc + idx * 64);
                mcu_end();
            }
    } else {
        int bwid = (width + 7) / 8, bhei = (height + 7) / 8;
        for (long long i = 0; i < (long long)bwid * bhei; i++) {
            block(0, yc + i * 64);
            mcu_end();
        }
    }
}

// Count the (run,size) / magnitude-class symbols one block would emit —
// must mirror encode_block exactly (incl. the 1023 clamp).
static void count_block(const int16_t* z, int& pred, uint32_t* dcf,
                        uint32_t* acf) {
    uint64_t mask = 0;
    for (int i = 0; i < 64; i++)
        mask |= (uint64_t)(z[i] != 0) << i;
    int diff = z[0] - pred;
    pred = z[0];
    dcf[bitlen(diff < 0 ? -diff : diff)]++;
    mask &= ~1ull;
    int last = 0;
    while (mask) {
        int i = __builtin_ctzll(mask);
        mask &= mask - 1;
        int run = i - last - 1;
        last = i;
        while (run > 15) { acf[0xF0]++; run -= 16; }
        int v = z[i];
        if (v > 1023) v = 1023;
        if (v < -1023) v = -1023;
        int s = bitlen(v < 0 ? -v : v);
        acf[(run << 4) | s]++;
    }
    if (last != 63) acf[0x00]++;
}

// Optimal JPEG-legal Huffman table from symbol frequencies (T.81 Annex
// K.2/K.3): pairwise frequency merge -> code lengths, 16-bit limit
// adjustment, reserved symbol 256 guarantees no all-ones code.
// Returns false when any code length exceeds 32: the Annex-K demote
// loop's pair invariant doesn't hold past bits[32] (a clamp would wrap
// the counters / emit a DHT that disagrees with vals_out).  Reaching
// depth 33 needs a ~Fib(35)-shaped frequency distribution — callers
// fall back to the default tables, mirroring libjpeg's hard error.
static bool build_opt_table(uint32_t freq[257], uint8_t bits_out[17],
                            uint8_t vals_out[256], int& nvals) {
    int codesize[257] = {0};
    int others[257];
    for (int i = 0; i < 257; i++) others[i] = -1;
    freq[256] = 1;
    for (;;) {
        int c1 = -1;
        uint32_t v = UINT32_MAX;
        for (int i = 0; i <= 256; i++)
            if (freq[i] && freq[i] <= v) { v = freq[i]; c1 = i; }
        int c2 = -1;
        v = UINT32_MAX;
        for (int i = 0; i <= 256; i++)
            if (freq[i] && freq[i] <= v && i != c1) { v = freq[i]; c2 = i; }
        if (c2 < 0) break;
        freq[c1] += freq[c2];
        freq[c2] = 0;
        codesize[c1]++;
        while (others[c1] >= 0) { c1 = others[c1]; codesize[c1]++; }
        others[c1] = c2;
        codesize[c2]++;
        while (others[c2] >= 0) { c2 = others[c2]; codesize[c2]++; }
    }
    int bitsN[33] = {0};
    for (int i = 0; i <= 256; i++) {
        if (codesize[i] > 32) return false;
        if (codesize[i]) bitsN[codesize[i]]++;
    }
    for (int l = 32; l > 16; l--)
        while (bitsN[l] > 0) {      // demote pairs into shorter prefixes
            int j = l - 2;
            while (j > 0 && bitsN[j] == 0) j--;
            bitsN[l] -= 2;
            bitsN[l - 1]++;
            bitsN[j + 1] += 2;
            bitsN[j]--;
        }
    int l = 16;
    while (l > 0 && bitsN[l] == 0) l--;
    if (l > 0) bitsN[l]--;          // drop the reserved symbol's code
    bits_out[0] = 0;
    for (int i = 1; i <= 16; i++) bits_out[i] = (uint8_t)bitsN[i];
    // canonical symbol order: original code length, ties by value
    nvals = 0;
    for (int len = 1; len <= 32; len++)
        for (int i = 0; i < 256; i++)
            if (codesize[i] == len) vals_out[nvals++] = (uint8_t)i;
    return true;
}

// Annex-K default table for slot t (0=DC luma, 1=AC luma, 2=DC chroma,
// 3=AC chroma) — the build_opt_table fallback when depth>32.
static void default_huff_table(int t, const uint8_t*& b, const uint8_t*& v,
                               int& n) {
    switch (t) {
        case 0: b = DC_L_BITS; v = DC_L_VALS; n = 12; break;
        case 1: b = AC_L_BITS; v = AC_L_VALS; n = 162; break;
        case 2: b = DC_C_BITS; v = DC_C_VALS; n = 12; break;
        default: b = AC_C_BITS; v = AC_C_VALS; n = 162; break;
    }
}

// subsamp: 0 = 4:2:0, 1 = 4:4:4, 2 = grayscale, 3 = 4:2:2
// restart: MCUs per restart interval (0 = no DRI/RSTn, the default
// wire shape; >0 writes a DRI segment and byte-aligned RSTn markers —
// independently decodable segments, the nvjpeg-style parallel unit)
// optimize: 2-pass encode with per-image optimal Huffman tables
// (libjpeg optimize_coding analog; ~5-15% smaller, any decoder reads it)
GJ_API int gjpeg_encode_ro(const int16_t* yc, const int16_t* uc,
                           const int16_t* vc,
                           int width, int height, int subsamp,
                           const uint8_t* qluma, const uint8_t* qchroma,
                           uint8_t* outbuf, long long capacity,
                           int restart, int optimize) {
    // SOF dimension fields are 16-bit and subsamp selects the MCU walk:
    // out-of-range values would silently emit a corrupt bitstream
    if (width <= 0 || height <= 0 || width > 65535 || height > 65535 ||
        subsamp < 0 || subsamp > 3) {
        snprintf(gj_err, sizeof gj_err,
                 "encode: bad dims %dx%d / subsamp %d", width, height,
                 subsamp);
        return -1;
    }
    // the DRI field is 16-bit; clamp BEFORE any pass so the counting
    // walk, the encode walk, and the header all agree
    if (restart > 65535) restart = 65535;
    std::vector<uint8_t> o;
    // typical 1080p output is ~0.5-1.5 MB: one upfront reservation keeps
    // the per-byte push_back on the no-grow fast path
    o.reserve((size_t)width * height / 2 + (1 << 16));
    put_marker(o, 0xD8);                                // SOI
    // APP0 JFIF
    put_marker(o, 0xE0); put_u16(o, 16);
    const char jfif[] = "JFIF";
    o.insert(o.end(), jfif, jfif + 5);
    o.push_back(1); o.push_back(1); o.push_back(0);
    put_u16(o, 1); put_u16(o, 1); o.push_back(0); o.push_back(0);
    // DQT (zigzag order per spec)
    int ncomp = subsamp == 2 ? 1 : 3;
    put_marker(o, 0xDB); put_u16(o, (uint16_t)(2 + 65 * (ncomp == 1 ? 1 : 2)));
    o.push_back(0x00);
    for (int i = 0; i < 64; i++) o.push_back(qluma[ZIGZAG[i]]);
    if (ncomp == 3) {
        o.push_back(0x01);
        for (int i = 0; i < 64; i++) o.push_back(qchroma[ZIGZAG[i]]);
    }
    // SOF0
    put_marker(o, 0xC0); put_u16(o, (uint16_t)(8 + 3 * ncomp));
    o.push_back(8); put_u16(o, (uint16_t)height); put_u16(o, (uint16_t)width);
    o.push_back((uint8_t)ncomp);
    int hs = (subsamp == 0 || subsamp == 3) ? 2 : 1;
    int vs = subsamp == 0 ? 2 : 1;
    o.push_back(1); o.push_back((uint8_t)((hs << 4) | vs)); o.push_back(0);
    if (ncomp == 3) {
        o.push_back(2); o.push_back(0x11); o.push_back(1);
        o.push_back(3); o.push_back(0x11); o.push_back(1);
    }
    // DHT: defaults, or per-image optimal tables from a counting pass
    HuffEnc dcl, acl, dcc, acc_;
    if (optimize) {
        static thread_local uint32_t fq[4][257];
        memset(fq, 0, sizeof fq);
        int pred[3] = {0, 0, 0};
        walk_blocks(yc, uc, vc, width, height, subsamp, restart,
                    [&](int comp, const int16_t* z) {
                        int cls = comp == 0 ? 0 : 1;
                        count_block(z, pred[comp], fq[cls * 2],
                                    fq[cls * 2 + 1]);
                    },
                    [&](void) { pred[0] = pred[1] = pred[2] = 0; });
        static thread_local uint8_t bits[4][17], vals[4][256];
        int nv[4] = {0, 0, 0, 0};
        int ntab = ncomp == 3 ? 4 : 2;
        for (int t = 0; t < ntab; t++)
            if (!build_opt_table(fq[t], bits[t], vals[t], nv[t])) {
                const uint8_t *db, *dv; int dn;
                default_huff_table(t, db, dv, dn);
                memcpy(bits[t], db, 17);
                memcpy(vals[t], dv, dn);
                nv[t] = dn;
            }
        put_dht(o, 0, 0, bits[0], vals[0], nv[0]);
        put_dht(o, 1, 0, bits[1], vals[1], nv[1]);
        if (ncomp == 3) {
            put_dht(o, 0, 1, bits[2], vals[2], nv[2]);
            put_dht(o, 1, 1, bits[3], vals[3], nv[3]);
        }
        build_enc(bits[0], vals[0], nv[0], dcl);
        build_enc(bits[1], vals[1], nv[1], acl);
        if (ncomp == 3) {
            build_enc(bits[2], vals[2], nv[2], dcc);
            build_enc(bits[3], vals[3], nv[3], acc_);
        }
    } else {
        // same slot->table mapping as the optimize fallback: one source
        // of truth (default_huff_table) for both paths
        HuffEnc* encs[4] = {&dcl, &acl, &dcc, &acc_};
        for (int t = 0; t < 4; t++) {
            const uint8_t *db, *dv; int dn;
            default_huff_table(t, db, dv, dn);
            if (t < 2 || ncomp == 3)
                put_dht(o, t & 1, t >> 1, db, dv, dn);
            build_enc(db, dv, dn, *encs[t]);
        }
    }
    // DRI
    if (restart > 0) {
        put_marker(o, 0xDD); put_u16(o, 4);
        put_u16(o, (uint16_t)restart);
    }
    // SOS
    put_marker(o, 0xDA); put_u16(o, (uint16_t)(6 + 2 * ncomp));
    o.push_back((uint8_t)ncomp);
    o.push_back(1); o.push_back(0x00);
    if (ncomp == 3) {
        o.push_back(2); o.push_back(0x11);
        o.push_back(3); o.push_back(0x11);
    }
    o.push_back(0); o.push_back(63); o.push_back(0);

    BitWriter bw(o);
    int pred[3] = {0, 0, 0};
    int rst = 0;
    walk_blocks(yc, uc, vc, width, height, subsamp, restart,
                [&](int comp, const int16_t* z) {
                    encode_block(bw, z, pred[comp],
                                 comp == 0 ? dcl : dcc,
                                 comp == 0 ? acl : acc_);
                },
                [&](void) {
                    // byte-align (1-padding), emit RSTn, reset DC
                    // predictors — F.1.2.3: intervals decode independently
                    bw.flush();
                    put_marker(o, (uint8_t)(0xD0 + (rst++ & 7)));
                    pred[0] = pred[1] = pred[2] = 0;
                });
    bw.flush();
    put_marker(o, 0xD9);                                 // EOI
    if ((long long)o.size() > capacity) {
        snprintf(gj_err, sizeof gj_err,
                 "encode needs %lld bytes, capacity %lld",
                 (long long)o.size(), capacity);
        return -1;
    }
    memcpy(outbuf, o.data(), o.size());
    return (int)o.size();
}

GJ_API int gjpeg_encode_r(const int16_t* yc, const int16_t* uc,
                          const int16_t* vc,
                          int width, int height, int subsamp,
                          const uint8_t* qluma, const uint8_t* qchroma,
                          uint8_t* outbuf, long long capacity,
                          int restart) {
    return gjpeg_encode_ro(yc, uc, vc, width, height, subsamp, qluma,
                           qchroma, outbuf, capacity, restart, 0);
}

GJ_API int gjpeg_encode(const int16_t* yc, const int16_t* uc,
                        const int16_t* vc,
                        int width, int height, int subsamp,
                        const uint8_t* qluma, const uint8_t* qchroma,
                        uint8_t* outbuf, long long capacity) {
    return gjpeg_encode_ro(yc, uc, vc, width, height, subsamp, qluma,
                           qchroma, outbuf, capacity, 0, 0);
}

// ------------------------------------------------ progressive encode
// T.81 Annex G encoder: spectral-selection + successive-approximation
// scans (the libjpeg simple-progression script) with per-scan optimal
// Huffman tables (2-pass: count symbols, build Annex K tables, emit).
// The coefficient ABI is identical to baseline — zigzag scan order,
// MCU-padded raster blocks from the device DCT program — so the same
// jitted transform feeds either wire format.  Mirrors the progressive
// decoder below; beyond nvjpeg (baseline-only encoder).

struct ProgScanDef {
    int ncomp;          // components in this scan (interleaved DC or 1)
    int ci[3];          // component indices
    int ss, se, ah, al;
};

struct PCompGeom { int bufw, cw, ch, h, v; };

// per-component block geometry; must mirror decode_progressive's math
static void prog_geom(int width, int height, int subsamp, PCompGeom g[3],
                      int& ncomp, int& mcux, int& mcuy) {
    int ch0 = (subsamp == 0 || subsamp == 3) ? 2 : 1;
    int cv0 = subsamp == 0 ? 2 : 1;
    ncomp = subsamp == 2 ? 1 : 3;
    mcux = (width + 8 * ch0 - 1) / (8 * ch0);
    mcuy = (height + 8 * cv0 - 1) / (8 * cv0);
    for (int c = 0; c < ncomp; c++) {
        int h = c == 0 ? ch0 : 1, v = c == 0 ? cv0 : 1;
        g[c].h = h; g[c].v = v;
        g[c].bufw = mcux * h;
        int compw = (width * h + ch0 - 1) / ch0;
        int comph = (height * v + cv0 - 1) / cv0;
        g[c].cw = (compw + 7) / 8;
        g[c].ch = (comph + 7) / 8;
    }
}

struct PCountSink {
    uint32_t* fq[2];
    inline void sym(int t, int s) { fq[t][s]++; }
    inline void put(uint32_t, int) {}
    inline void restart(int) {}
};

struct PEmitSink {
    BitWriter& bw;
    const HuffEnc* tab[2];
    inline void sym(int t, int s) { bw.put(tab[t]->code[s], tab[t]->len[s]); }
    inline void put(uint32_t v, int n) { if (n) bw.put(v, n); }
    inline void restart(int n) {        // byte-align + RSTn marker
        bw.flush();
        bw.out.push_back(0xFF);
        bw.out.push_back((uint8_t)(0xD0 + (n & 7)));
    }
};

// EOB-run flush: symbol (nbits<<4), the run's low bits, then every
// correction bit buffered while the run was open (jcphuff emit_eobrun)
template <class S>
static inline void prog_emit_eobrun(S& s, unsigned& eobrun,
                                    std::vector<uint8_t>& be) {
    if (!eobrun) return;
    int nb = bitlen((int)eobrun) - 1;
    s.sym(1, nb << 4);
    s.put(eobrun & ((1u << nb) - 1), nb);
    for (uint8_t b : be) s.put(b, 1);
    be.clear();
    eobrun = 0;
}

template <class S>
static void prog_dc_first(S& s, const int16_t* z, int tbl, int& pred,
                          int al) {
    int t = (int)z[0] >> al;        // DC point transform: arithmetic shift
    int diff = t - pred;
    pred = t;
    int nb = bitlen(diff < 0 ? -diff : diff);
    s.sym(tbl, nb);
    s.put((uint32_t)(diff < 0 ? diff - 1 : diff), nb);
}

template <class S>
static void prog_ac_first(S& s, const int16_t* z, int ss, int se, int al,
                          unsigned& eobrun, std::vector<uint8_t>& be) {
    int r = 0;
    for (int k = ss; k <= se; k++) {
        int temp = z[k], temp2;
        if (temp < 0) { temp = (-temp) >> al; temp2 = ~temp; }
        else { temp >>= al; temp2 = temp; }
        if (temp == 0) { r++; continue; }
        prog_emit_eobrun(s, eobrun, be);
        while (r > 15) { s.sym(1, 0xF0); r -= 16; }
        int nb = bitlen(temp);
        s.sym(1, (r << 4) | nb);
        s.put((uint32_t)temp2, nb);
        r = 0;
    }
    if (r > 0 && ++eobrun == 0x7FFF) prog_emit_eobrun(s, eobrun, be);
}

template <class S>
static void prog_ac_refine(S& s, const int16_t* z, int ss, int se, int al,
                           unsigned& eobrun, std::vector<uint8_t>& be) {
    int absval[64];
    int eob = ss - 1;
    for (int k = ss; k <= se; k++) {
        int t = z[k] < 0 ? -z[k] : z[k];
        absval[k] = t >> al;
        if (absval[k] == 1) eob = k;   // last newly-significant coef
    }
    int r = 0;
    uint8_t brb[64];                    // correction bits since last sym
    int brn = 0;
    for (int k = ss; k <= se; k++) {
        int temp = absval[k];
        if (temp == 0) { r++; continue; }
        while (r > 15 && k <= eob) {
            prog_emit_eobrun(s, eobrun, be);
            s.sym(1, 0xF0);
            r -= 16;
            for (int i = 0; i < brn; i++) s.put(brb[i], 1);
            brn = 0;
        }
        if (temp > 1) {                 // already significant: LSB only
            brb[brn++] = (uint8_t)(temp & 1);
            continue;
        }
        prog_emit_eobrun(s, eobrun, be);
        s.sym(1, (r << 4) | 1);
        s.put(z[k] < 0 ? 0u : 1u, 1);
        for (int i = 0; i < brn; i++) s.put(brb[i], 1);
        brn = 0;
        r = 0;
    }
    if (r > 0 || brn > 0) {             // block tail joins an EOB run
        eobrun++;
        be.insert(be.end(), brb, brb + brn);
        if (eobrun == 0x7FFF || be.size() > 930)
            prog_emit_eobrun(s, eobrun, be);
    }
}

// Run one scan over the image through sink S (identical walk for the
// counting and emitting passes).
template <class S>
static void prog_run_scan(S& s, const ProgScanDef& sc,
                          const int16_t* const* bufs, const PCompGeom* g,
                          int mcux, int mcuy, int restart = 0) {
    int pred[3] = {0, 0, 0};
    unsigned eobrun = 0;
    std::vector<uint8_t> be;
    // restart intervals count MCUs in interleaved scans and BLOCKS in
    // non-interleaved ones (T.81: the MCU of a non-interleaved scan is
    // one block) — the same convention the progressive decoder's
    // restart_check applies.  Fires between units, never after the last.
    long long unit = 0, total_units = (sc.ss == 0 && sc.ncomp > 1)
        ? (long long)mcux * mcuy
        : (long long)g[sc.ci[0]].cw * g[sc.ci[0]].ch;
    int rst = 0;
    auto boundary = [&](void) {
        ++unit;
        if (restart > 0 && unit % restart == 0 && unit < total_units) {
            prog_emit_eobrun(s, eobrun, be);
            s.restart(rst++ & 7);
            pred[0] = pred[1] = pred[2] = 0;
        }
    };
    if (sc.ss == 0 && sc.ncomp > 1) {
        for (int my = 0; my < mcuy; my++)
            for (int mx = 0; mx < mcux; mx++) {
                for (int k = 0; k < sc.ncomp; k++) {
                    int c = sc.ci[k];
                    for (int v = 0; v < g[c].v; v++)
                        for (int u = 0; u < g[c].h; u++) {
                            long long brow = (long long)my * g[c].v + v;
                            long long bcol = (long long)mx * g[c].h + u;
                            const int16_t* z = bufs[c]
                                + (brow * g[c].bufw + bcol) * 64;
                            if (sc.ah == 0)
                                prog_dc_first(s, z, c == 0 ? 0 : 1,
                                              pred[k], sc.al);
                            else
                                s.put((uint32_t)(z[0] >> sc.al) & 1, 1);
                        }
                }
                boundary();
            }
    } else {
        int c = sc.ci[0];
        for (long long by = 0; by < g[c].ch; by++)
            for (long long bx = 0; bx < g[c].cw; bx++) {
                const int16_t* z = bufs[c] + (by * g[c].bufw + bx) * 64;
                if (sc.ss == 0) {
                    if (sc.ah == 0)
                        prog_dc_first(s, z, 0, pred[0], sc.al);
                    else
                        s.put((uint32_t)(z[0] >> sc.al) & 1, 1);
                } else if (sc.ah == 0) {
                    prog_ac_first(s, z, sc.ss, sc.se, sc.al, eobrun, be);
                } else {
                    prog_ac_refine(s, z, sc.ss, sc.se, sc.al, eobrun, be);
                }
                boundary();
            }
    }
    prog_emit_eobrun(s, eobrun, be);
}

GJ_API int gjpeg_encode_progressive_r(const int16_t* yc,
                                      const int16_t* uc,
                                      const int16_t* vc, int width,
                                      int height, int subsamp,
                                      const uint8_t* qluma,
                                      const uint8_t* qchroma,
                                      uint8_t* outbuf,
                                      long long capacity, int restart) {
    if (width <= 0 || height <= 0 || width > 65535 || height > 65535 ||
        subsamp < 0 || subsamp > 3) {
        snprintf(gj_err, sizeof gj_err,
                 "encode: bad dims %dx%d / subsamp %d", width, height,
                 subsamp);
        return -1;
    }
    PCompGeom g[3];
    int ncomp, mcux, mcuy;
    prog_geom(width, height, subsamp, g, ncomp, mcux, mcuy);
    const int16_t* bufs[3] = {yc, uc, vc};

    std::vector<uint8_t> o;
    o.reserve((size_t)width * height / 2 + (1 << 16));
    put_marker(o, 0xD8);
    put_marker(o, 0xE0); put_u16(o, 16);
    const char jfif[] = "JFIF";
    o.insert(o.end(), jfif, jfif + 5);
    o.push_back(1); o.push_back(1); o.push_back(0);
    put_u16(o, 1); put_u16(o, 1); o.push_back(0); o.push_back(0);
    put_marker(o, 0xDB);
    put_u16(o, (uint16_t)(2 + 65 * (ncomp == 1 ? 1 : 2)));
    o.push_back(0x00);
    for (int i = 0; i < 64; i++) o.push_back(qluma[ZIGZAG[i]]);
    if (ncomp == 3) {
        o.push_back(0x01);
        for (int i = 0; i < 64; i++) o.push_back(qchroma[ZIGZAG[i]]);
    }
    if (restart > 65535) restart = 65535;
    if (restart < 0) restart = 0;
    put_marker(o, 0xC2);                     // SOF2: progressive DCT
    put_u16(o, (uint16_t)(8 + 3 * ncomp));
    o.push_back(8); put_u16(o, (uint16_t)height);
    put_u16(o, (uint16_t)width);
    o.push_back((uint8_t)ncomp);
    o.push_back(1);
    o.push_back((uint8_t)((g[0].h << 4) | g[0].v));
    o.push_back(0);
    if (ncomp == 3) {
        o.push_back(2); o.push_back(0x11); o.push_back(1);
        o.push_back(3); o.push_back(0x11); o.push_back(1);
    }

    if (restart > 0) {
        put_marker(o, 0xDD); put_u16(o, 4);
        put_u16(o, (uint16_t)restart);
    }

    // the libjpeg simple-progression script (jcparam.c)
    std::vector<ProgScanDef> script;
    if (ncomp == 3) {
        script = {
            {3, {0, 1, 2}, 0, 0, 0, 1},
            {1, {0}, 1, 5, 0, 2},
            {1, {2}, 1, 63, 0, 1},
            {1, {1}, 1, 63, 0, 1},
            {1, {0}, 6, 63, 0, 2},
            {1, {0}, 1, 63, 2, 1},
            {3, {0, 1, 2}, 0, 0, 1, 0},
            {1, {2}, 1, 63, 1, 0},
            {1, {1}, 1, 63, 1, 0},
            {1, {0}, 1, 63, 1, 0},
        };
    } else {
        script = {
            {1, {0}, 0, 0, 0, 1},
            {1, {0}, 1, 5, 0, 2},
            {1, {0}, 6, 63, 0, 2},
            {1, {0}, 1, 63, 2, 1},
            {1, {0}, 0, 0, 1, 0},
            {1, {0}, 1, 63, 1, 0},
        };
    }

    for (const auto& sc : script) {
        bool dc_refine = sc.ss == 0 && sc.ah > 0;
        HuffEnc enc0, enc1;
        if (!dc_refine) {
            // pass 1: count this scan's symbols, build optimal tables
            static thread_local uint32_t fq[2][257];
            memset(fq, 0, sizeof fq);
            PCountSink cs{{fq[0], fq[1]}};
            prog_run_scan(cs, sc, bufs, g, mcux, mcuy, restart);
            uint8_t bits0[17], vals0[256], bits1[17], vals1[256];
            int nv0 = 0, nv1 = 0;
            // Huffman depth >32 needs a Fibonacci-shaped distribution —
            // unreachable for real images, but progressive AC alphabets
            // (EOBn runs) have no default-table fallback, so fail loudly
            // rather than emit symbols the DHT can't encode.
            if (sc.ss == 0) {           // DC first: one table per class
                if (!build_opt_table(fq[0], bits0, vals0, nv0)) {
                    snprintf(gj_err, sizeof gj_err,
                             "progressive DC table depth overflow");
                    return -2;
                }
                put_dht(o, 0, 0, bits0, vals0, nv0);
                build_enc(bits0, vals0, nv0, enc0);
                if (sc.ncomp > 1) {
                    if (!build_opt_table(fq[1], bits1, vals1, nv1)) {
                        snprintf(gj_err, sizeof gj_err,
                                 "progressive DC table depth overflow");
                        return -2;
                    }
                    put_dht(o, 0, 1, bits1, vals1, nv1);
                    build_enc(bits1, vals1, nv1, enc1);
                }
            } else {                    // AC scan: table id 0, redefined
                if (!build_opt_table(fq[1], bits1, vals1, nv1)) {
                    snprintf(gj_err, sizeof gj_err,
                             "progressive AC table depth overflow");
                    return -2;
                }
                put_dht(o, 1, 0, bits1, vals1, nv1);
                build_enc(bits1, vals1, nv1, enc1);
            }
        }
        put_marker(o, 0xDA);
        put_u16(o, (uint16_t)(6 + 2 * sc.ncomp));
        o.push_back((uint8_t)sc.ncomp);
        for (int k = 0; k < sc.ncomp; k++) {
            o.push_back((uint8_t)(sc.ci[k] + 1));
            int td = sc.ss == 0 && sc.ah == 0 && sc.ci[k] > 0 ? 1 : 0;
            o.push_back((uint8_t)((td << 4) | 0));
        }
        o.push_back((uint8_t)sc.ss);
        o.push_back((uint8_t)sc.se);
        o.push_back((uint8_t)((sc.ah << 4) | sc.al));
        BitWriter bw(o);
        PEmitSink es{bw, {&enc0, &enc1}};
        prog_run_scan(es, sc, bufs, g, mcux, mcuy, restart);
        bw.flush();
    }
    put_marker(o, 0xD9);
    if ((long long)o.size() > capacity) {
        snprintf(gj_err, sizeof gj_err,
                 "encode needs %lld bytes, capacity %lld",
                 (long long)o.size(), capacity);
        return -1;
    }
    memcpy(outbuf, o.data(), o.size());
    return (int)o.size();
}

// ---------------------------------------------------------------- reader
struct HuffDec {
    // canonical decode: mincode/maxcode/valptr per length
    int32_t mincode[17], maxcode[17], valptr[17];
    uint8_t vals[256];
    // fast path: next-8-bits lookup for codes <= 8 bits (covers the
    // default tables' hottest symbols); lut_len 0 = take the slow path
    uint8_t lut_sym[256], lut_len[256];
};

static void build_dec(const uint8_t* bits, const uint8_t* vals, int nvals,
                      HuffDec& h) {
    memcpy(h.vals, vals, nvals);
    memset(h.lut_len, 0, sizeof h.lut_len);
    int code = 0, k = 0;
    for (int l = 1; l <= 16; l++) {
        h.valptr[l] = k;
        h.mincode[l] = code;
        for (int i = 0; i < bits[l]; i++, k++, code++) {
            if (l <= 8 && k < nvals) {
                int shift = 8 - l;
                long long base = (long long)code << shift;
                // bound: a malformed DHT whose counts exceed the prefix
                // space would index past the 256-entry LUT (untrusted
                // input -> heap corruption); such codes can never match
                // anyway, so skip them
                if (base + (1 << shift) <= 256)
                    for (int s = 0; s < (1 << shift); s++) {
                        h.lut_sym[base + s] = vals[k];
                        h.lut_len[base + s] = (uint8_t)l;
                    }
            }
        }
        h.maxcode[l] = code - 1;
        code <<= 1;
        if (!bits[l]) h.maxcode[l] = -1;
    }
}

struct BitReader {
    const uint8_t* p;
    long long n, pos = 0;
    uint64_t acc = 0;      // valid bits live at positions nbits-1..0
    int nbits = 0;
    bool marker_hit = false;
    bool stalled_marker = false;   // refill stopped at a real marker
    bool buffered;         // multi-byte refill (only safe without DRI:
                           // restart alignment pokes pos/nbits directly)
    BitReader(const uint8_t* d, long long sz, bool bulk = false)
        : p(d), n(sz), buffered(bulk) {}
    // buffer one stuffing-decoded byte; false = input ended / marker
    inline bool fill1() {
        if (pos >= n) return false;
        uint8_t b = p[pos++];
        if (b == 0xFF) {
            if (pos < n && p[pos] == 0x00) pos++;
            else { stalled_marker = true; return false; }
        }
        acc = (acc << 8) | b;
        nbits += 8;
        return true;
    }
    inline void fill() {
        if (buffered) {
            while (nbits <= 56 && !stalled_marker && pos < n)
                if (!fill1()) break;
        } else if (nbits == 0) {
            fill1();
        }
    }
    inline int bit() {
        if (nbits == 0) {
            fill();
            if (nbits == 0) {
                if (stalled_marker) marker_hit = true;
                return -1;
            }
        }
        nbits--;
        return (int)(acc >> nbits) & 1;
    }
    inline int bits(int cnt) {
        if (cnt == 0) return 0;
        if (nbits < cnt) fill();
        if (nbits >= cnt) {
            nbits -= cnt;
            return (int)(acc >> nbits) & ((1 << cnt) - 1);
        }
        int v = 0;                       // tail: bit-by-bit to the end
        for (int i = 0; i < cnt; i++) {
            int b = bit();
            if (b < 0) return -1;
            v = (v << 1) | b;
        }
        return v;
    }
};

static int huff_decode_slow(BitReader& br, const HuffDec& h) {
    int code = br.bit();
    if (code < 0) return -1;
    for (int l = 1; l <= 16; l++) {
        if (h.maxcode[l] >= 0 && code <= h.maxcode[l])
            return h.vals[h.valptr[l] + code - h.mincode[l]];
        int b = br.bit();
        if (b < 0) return -1;
        code = (code << 1) | b;
    }
    return -1;
}

static inline int huff_decode(BitReader& br, const HuffDec& h) {
    if (br.nbits < 8) br.fill();
    if (br.nbits >= 8) {
        int idx = (int)(br.acc >> (br.nbits - 8)) & 0xFF;
        int l = h.lut_len[idx];
        if (l) { br.nbits -= l; return h.lut_sym[idx]; }
    }
    return huff_decode_slow(br, h);
}

static inline int extend(int v, int s) {
    return v < (1 << (s - 1)) ? v - (1 << s) + 1 : v;
}

struct GjpegFile {
    int width = 0, height = 0, subsamp = -1, ncomp = 0;
    uint8_t qt[4][64];          // natural order
    int comp_qt[3] = {0, 0, 0};
    int comp_id[3] = {1, 2, 3};
    int comp_dc[3] = {0, 0, 0}, comp_ac[3] = {0, 0, 0};
    int comp_h[3] = {1, 1, 1}, comp_v[3] = {1, 1, 1};
    HuffDec dc[4], ac[4];
    bool has_dht[8] = {false};
    const uint8_t* scan = nullptr;
    long long scan_size = 0;
    int restart = 0;
    bool progressive = false;
    long long sos_off = 0;      // offset of the first SOS marker (0xFF)
    std::vector<uint8_t> data;
};

GJ_API const char* gjpeg_last_error() { return gj_err; }

// Parse one DHT segment body (may hold several tables).  Shared by the
// header parser and the progressive decoder's between-scan walk (T.81
// allows redefining tables between scans).
static bool parse_dht_segment(GjpegFile* f, const uint8_t* seg, int seglen) {
    int off = 0;
    while (off < seglen) {
        int cls = seg[off] >> 4, id = seg[off] & 15;
        off++;
        if (cls > 1 || id >= 4 || off + 16 > seglen) {
            snprintf(gj_err, sizeof gj_err,
                     "bad DHT (class=%d id=%d)", cls, id);
            return false;
        }
        uint8_t bits[17] = {0};
        int nv = 0;
        for (int l = 1; l <= 16; l++) { bits[l] = seg[off + l - 1]; nv += bits[l]; }
        off += 16;
        if (nv > 256 || off + nv > seglen) {
            snprintf(gj_err, sizeof gj_err, "bad DHT value count %d", nv);
            return false;
        }
        if (cls == 0) build_dec(bits, seg + off, nv, f->dc[id]);
        else build_dec(bits, seg + off, nv, f->ac[id]);
        f->has_dht[cls * 4 + id] = true;
        off += nv;
    }
    return true;
}

GJ_API void* gjpeg_parse(const uint8_t* buf, long long size) {
    auto* f = new GjpegFile();
    f->data.assign(buf, buf + size);
    const uint8_t* p = f->data.data();
    long long n = size, i = 0;
    if (n < 4 || p[0] != 0xFF || p[1] != 0xD8) {
        snprintf(gj_err, sizeof gj_err, "not a JPEG (no SOI)");
        delete f; return nullptr;
    }
    i = 2;
    while (i + 4 <= n) {
        if (p[i] != 0xFF) { i++; continue; }
        uint8_t m = p[i + 1];
        if (m == 0xFF) { i++; continue; }     // fill byte (B.1.1.2)
        if (m == 0xD8 || m == 0x01 ||         // TEM: length-less marker
            (m >= 0xD0 && m <= 0xD7)) { i += 2; continue; }
        if (m == 0xD9) break;
        int len = (p[i + 2] << 8) | p[i + 3];
        // every segment handler below indexes seg[0..len-3]: the length
        // field comes from the file and MUST fit the buffer
        if (len < 2 || i + 2 + len > n) {
            snprintf(gj_err, sizeof gj_err,
                     "truncated segment 0x%02X (len %d at %lld/%lld)",
                     m, len, i, n);
            delete f; return nullptr;
        }
        const uint8_t* seg = p + i + 4;
        int seglen = len - 2;
        if (m == 0xC2) {
            // progressive DCT: same SOF layout; multi-scan entropy data
            f->progressive = true;
            m = 0xC0;       // fall into the SOF handler below
        } else if ((m >= 0xC3 && m <= 0xCF) && m != 0xC4 && m != 0xC8 &&
                   m != 0xCC) {
            // lossless / arithmetic / hierarchical SOFs would mis-decode
            snprintf(gj_err, sizeof gj_err, "unsupported SOF 0x%02X", m);
            delete f; return nullptr;
        }
        if (m == 0xDB) {
            int off = 0;
            while (off < seglen) {
                int pq = seg[off] >> 4, tq = seg[off] & 15;
                off++;
                if (pq) {    // 16-bit tables would truncate silently
                    snprintf(gj_err, sizeof gj_err,
                             "16-bit quant tables not supported");
                    delete f; return nullptr;
                }
                if (tq >= 4 || off + 64 > seglen) {
                    snprintf(gj_err, sizeof gj_err,
                             "bad DQT (tq=%d, %d bytes left)", tq,
                             seglen - off);
                    delete f; return nullptr;
                }
                for (int k = 0; k < 64; k++) {
                    f->qt[tq][ZIGZAG[k]] = seg[off];
                    off++;
                }
            }
        } else if (m == 0xC0 || m == 0xC1) {
            if (seglen < 6 || seglen < 6 + 3 * (seg[5] & 0xFF)) {
                snprintf(gj_err, sizeof gj_err, "truncated SOF");
                delete f; return nullptr;
            }
            f->height = (seg[1] << 8) | seg[2];
            f->width = (seg[3] << 8) | seg[4];
            f->ncomp = seg[5];
            if (f->ncomp != 1 && f->ncomp != 3) {
                // caller buffers model exactly gray / 3-component YCbCr;
                // Nf=2/4 would walk geometry the buffers don't cover
                snprintf(gj_err, sizeof gj_err,
                         "unsupported component count %d", f->ncomp);
                delete f; return nullptr;
            }
            for (int c = 0; c < f->ncomp && c < 3; c++) {
                f->comp_id[c] = seg[6 + c * 3];
                f->comp_h[c] = seg[6 + c * 3 + 1] >> 4;
                f->comp_v[c] = seg[6 + c * 3 + 1] & 15;
                f->comp_qt[c] = seg[6 + c * 3 + 2];
                if (f->comp_qt[c] >= 4) {
                    snprintf(gj_err, sizeof gj_err,
                             "bad quant table id %d", f->comp_qt[c]);
                    delete f; return nullptr;
                }
            }
            if (f->ncomp == 3 &&
                (f->comp_h[1] != 1 || f->comp_v[1] != 1 ||
                 f->comp_h[2] != 1 || f->comp_v[2] != 1)) {
                // caller buffers assume 1x1 chroma; geometry derived from
                // declared sampling must never exceed them
                snprintf(gj_err, sizeof gj_err,
                         "unsupported chroma sampling %dx%d/%dx%d",
                         f->comp_h[1], f->comp_v[1], f->comp_h[2],
                         f->comp_v[2]);
                delete f; return nullptr;
            }
            if (f->ncomp == 1) {
                // Single-component frames: declared sampling factors are
                // layout-irrelevant (the sole component defines hmax/vmax,
                // so its dims equal the frame dims regardless — T.81
                // A.1.1), but decode_progressive sizes its MCU buffers
                // from comp_h/comp_v.  Normalize to 1x1 so an attacker
                // declaring 4x4 sampling can't inflate bufw past the
                // caller's ceil(w/8)*ceil(h/8) block allocation.
                f->comp_h[0] = f->comp_v[0] = 1;
                f->subsamp = 2;
            }
            else if (f->comp_h[0] == 2 && f->comp_v[0] == 2) f->subsamp = 0;
            else if (f->comp_h[0] == 1 && f->comp_v[0] == 1) f->subsamp = 1;
            else if (f->comp_h[0] == 2 && f->comp_v[0] == 1) f->subsamp = 3;
            else {
                snprintf(gj_err, sizeof gj_err,
                         "unsupported sampling %dx%d", f->comp_h[0], f->comp_v[0]);
                delete f; return nullptr;
            }
        } else if (m == 0xC4) {
            if (!parse_dht_segment(f, seg, seglen)) { delete f; return nullptr; }
        } else if (m == 0xDD) {
            if (seglen < 2) {
                snprintf(gj_err, sizeof gj_err, "truncated DRI");
                delete f; return nullptr;
            }
            f->restart = (seg[0] << 8) | seg[1];
        } else if (m == 0xDA) {
            if (f->progressive) {
                // scans are re-parsed by the progressive decoder; here
                // just record where they start
                f->sos_off = i;
                return f;
            }
            int ns = seglen > 0 ? seg[0] : 0;
            if (ns < 1 || ns > 3 || seglen < 1 + ns * 2 + 3) {
                snprintf(gj_err, sizeof gj_err, "bad SOS (%d comps)", ns);
                delete f; return nullptr;
            }
            if (ns != f->ncomp) {
                // spec-legal non-interleaved multi-scan baseline: the
                // single-scan walk below would mis-decode it — reject
                // with a clear diagnostic instead
                snprintf(gj_err, sizeof gj_err,
                         "unsupported baseline SOS: %d of %d components "
                         "(non-interleaved multi-scan)", ns, f->ncomp);
                delete f; return nullptr;
            }
            for (int c = 0; c < ns && c < 3; c++) {
                if (seg[1 + c * 2] != f->comp_id[c]) {
                    snprintf(gj_err, sizeof gj_err,
                             "SOS component order differs from SOF");
                    delete f; return nullptr;
                }
                f->comp_dc[c] = seg[1 + c * 2 + 1] >> 4;
                f->comp_ac[c] = seg[1 + c * 2 + 1] & 15;
                if (f->comp_dc[c] >= 4 || f->comp_ac[c] >= 4 ||
                    !f->has_dht[f->comp_dc[c]] ||
                    !f->has_dht[4 + f->comp_ac[c]]) {
                    // undefined tables would "decode" against zeroed
                    // HuffDecs into silent garbage
                    snprintf(gj_err, sizeof gj_err,
                             "bad SOS table selector (undefined DHT)");
                    delete f; return nullptr;
                }
            }
            f->scan = seg + 1 + ns * 2 + 3;
            f->scan_size = n - (f->scan - p);
            return f;
        }
        i += 2 + len;
    }
    snprintf(gj_err, sizeof gj_err, "no SOS marker found");
    delete f;
    return nullptr;
}

GJ_API void gjpeg_info(void* h, int* w, int* hh, int* subsamp) {
    auto* f = (GjpegFile*)h;
    *w = f->width; *hh = f->height; *subsamp = f->subsamp;
}

GJ_API void gjpeg_qtable(void* h, int comp, uint8_t* out64) {
    auto* f = (GjpegFile*)h;
    memcpy(out64, f->qt[f->comp_qt[comp < f->ncomp ? comp : 0]], 64);
}

GJ_API void gjpeg_free(void* h) { delete (GjpegFile*)h; }

// NOTE: writes only the nonzero coefficients (natural order via ZIGZAG)
// — callers pass zero-initialized buffers (jpeg_tpu allocates np.zeros)
// and each block is decoded exactly once.
static bool decode_block_d(BitReader& br, const HuffDec& dc, const HuffDec& ac,
                           int& pred, int16_t* out) {
    int s = huff_decode(br, dc);
    if (s < 0) return false;
    if (s > 15) return false;   // DC size caps at 11 (12-bit: 15); a
                                // malicious DHT value byte would drive
                                // bits()/extend() into shift UB
    if (s) {
        int v = br.bits(s);
        if (v < 0) return false;
        pred += extend(v, s);
    }
    out[0] = (int16_t)pred;
    int k = 1;
    if (br.buffered) {
        // fast loop: with >=26 valid bits, symbol (<=16) + magnitude
        // (<=10) decode from one accumulator peek — a single bound
        // check per coefficient instead of one per primitive
        while (k < 64) {
            if (br.nbits < 26) {
                br.fill();
                if (br.nbits < 26) break;        // tail: careful path
            }
            int idx = (int)(br.acc >> (br.nbits - 8)) & 0xFF;
            int l = ac.lut_len[idx], rs;
            if (l) { br.nbits -= l; rs = ac.lut_sym[idx]; }
            else {
                rs = huff_decode_slow(br, ac);   // consumes <=16 bits
                if (rs < 0) return false;
            }
            int r = rs >> 4, sz = rs & 15;
            if (sz == 0) {
                if (r == 15) { k += 16; continue; }
                return true;                     // EOB
            }
            k += r;
            if (k > 63) return false;
            if (br.nbits < sz) {
                // a 16-bit slow-path code leaves only 10 guaranteed
                // bits; a malicious DHT size 11..15 would drive nbits
                // negative (negative-count shift UB) — careful path
                int v = br.bits(sz);
                if (v < 0) return false;
                out[k++] = (int16_t)extend(v, sz);
                continue;
            }
            br.nbits -= sz;
            int v = (int)(br.acc >> br.nbits) & ((1 << sz) - 1);
            out[k++] = (int16_t)extend(v, sz);
        }
        if (k >= 64) return true;
    }
    while (k < 64) {
        int rs = huff_decode(br, ac);
        if (rs < 0) return false;
        int r = rs >> 4, sz = rs & 15;
        if (sz == 0) {
            if (r == 15) { k += 16; continue; }
            break;                       // EOB
        }
        k += r;
        if (k > 63) return false;
        int v = br.bits(sz);
        if (v < 0) return false;
        out[k++] = (int16_t)extend(v, sz);
    }
    return true;
}

// Decode quantized coefficients into caller buffers (padded raster block
// layout identical to the encoder's).  Returns 0 ok, -1 error.
static long long gj_total_mcus(const GjpegFile* f) {
    if (f->subsamp == 0)
        return (long long)((f->width + 15) / 16) * ((f->height + 15) / 16);
    if (f->subsamp == 3)
        return (long long)((f->width + 15) / 16) * ((f->height + 7) / 8);
    return (long long)((f->width + 7) / 8) * ((f->height + 7) / 8);
}

// Decode MCUs [m0, m1) with `br` positioned at their first bit; DC
// predictors start fresh (exactly a restart segment's state).  No
// restart handling inside — segment readers stop at the next marker.
static bool decode_mcu_range(const GjpegFile* f, BitReader& br,
                             long long m0, long long m1, int16_t* yc,
                             int16_t* uc, int16_t* vc) {
    int pred[3] = {0, 0, 0};
    if (f->subsamp == 0) {
        int mcux = (f->width + 15) / 16;
        int ybw = mcux * 2;
        for (long long m = m0; m < m1; m++) {
            int my = (int)(m / mcux), mx = (int)(m % mcux);
            for (int by = 0; by < 2; by++)
                for (int bx = 0; bx < 2; bx++) {
                    long long idx = (long long)(my * 2 + by) * ybw
                                    + (mx * 2 + bx);
                    if (!decode_block_d(br, f->dc[f->comp_dc[0]],
                                        f->ac[f->comp_ac[0]], pred[0],
                                        yc + idx * 64)) return false;
                }
            long long ci = (long long)my * mcux + mx;
            if (!decode_block_d(br, f->dc[f->comp_dc[1]],
                                f->ac[f->comp_ac[1]], pred[1],
                                uc + ci * 64)) return false;
            if (!decode_block_d(br, f->dc[f->comp_dc[2]],
                                f->ac[f->comp_ac[2]], pred[2],
                                vc + ci * 64)) return false;
        }
    } else if (f->subsamp == 3) {
        int mcux = (f->width + 15) / 16;
        int ybw = mcux * 2;
        for (long long m = m0; m < m1; m++) {
            long long my = m / mcux, mx = m % mcux;
            for (int bx = 0; bx < 2; bx++) {
                long long idx = my * ybw + (mx * 2 + bx);
                if (!decode_block_d(br, f->dc[f->comp_dc[0]],
                                    f->ac[f->comp_ac[0]], pred[0],
                                    yc + idx * 64)) return false;
            }
            long long ci = my * mcux + mx;
            if (!decode_block_d(br, f->dc[f->comp_dc[1]],
                                f->ac[f->comp_ac[1]], pred[1],
                                uc + ci * 64)) return false;
            if (!decode_block_d(br, f->dc[f->comp_dc[2]],
                                f->ac[f->comp_ac[2]], pred[2],
                                vc + ci * 64)) return false;
        }
    } else if (f->subsamp == 1) {
        for (long long i = m0; i < m1; i++) {
            if (!decode_block_d(br, f->dc[f->comp_dc[0]],
                                f->ac[f->comp_ac[0]], pred[0],
                                yc + i * 64)) return false;
            if (!decode_block_d(br, f->dc[f->comp_dc[1]],
                                f->ac[f->comp_ac[1]], pred[1],
                                uc + i * 64)) return false;
            if (!decode_block_d(br, f->dc[f->comp_dc[2]],
                                f->ac[f->comp_ac[2]], pred[2],
                                vc + i * 64)) return false;
        }
    } else {
        for (long long i = m0; i < m1; i++)
            if (!decode_block_d(br, f->dc[f->comp_dc[0]],
                                f->ac[f->comp_ac[0]], pred[0],
                                yc + i * 64)) return false;
    }
    return true;
}

// ------------------------------------------------- progressive decode
// T.81 Annex G: multiple scans refine the coefficient array — DC and AC
// bands arrive separately (spectral selection) and in bit slices
// (successive approximation).  Entropy decode stays on host; the
// refined coefficients feed the same device dequant+IDCT program as
// baseline (jpeg_tpu.decode_batch), so progressive rides the MXU too.
// Replaces the reference's nvjpeg progressive support
// (metrans/samples/AppNvjpegDec.cpp:24-67 accepts any libjpeg stream).

struct ProgScan {
    int ncomp = 0;
    int ci[3] = {0, 0, 0};      // component indices in f->comp_*
    int dct[3] = {0, 0, 0}, act[3] = {0, 0, 0};
    int ss = 0, se = 0, ah = 0, al = 0;
};

static bool parse_prog_scan_header(GjpegFile* f, const uint8_t* seg,
                                   int seglen, ProgScan& sc) {
    int ns = seglen > 0 ? seg[0] : 0;
    if (ns < 1 || ns > 3 || seglen < 1 + ns * 2 + 3) {
        snprintf(gj_err, sizeof gj_err, "bad progressive SOS (%d comps)", ns);
        return false;
    }
    sc.ncomp = ns;
    for (int k = 0; k < ns; k++) {
        int id = seg[1 + k * 2], ci = -1;
        for (int c = 0; c < f->ncomp && c < 3; c++)
            if (f->comp_id[c] == id) ci = c;
        if (ci < 0) {
            snprintf(gj_err, sizeof gj_err, "SOS names unknown component %d", id);
            return false;
        }
        sc.ci[k] = ci;
        sc.dct[k] = seg[1 + k * 2 + 1] >> 4;
        sc.act[k] = seg[1 + k * 2 + 1] & 15;
        if (sc.dct[k] >= 4 || sc.act[k] >= 4) {
            snprintf(gj_err, sizeof gj_err, "bad SOS table selector");
            return false;
        }
    }
    sc.ss = seg[1 + ns * 2];
    sc.se = seg[1 + ns * 2 + 1];
    sc.ah = seg[1 + ns * 2 + 2] >> 4;
    sc.al = seg[1 + ns * 2 + 2] & 15;
    if (sc.ss > 63 || sc.se > 63 || sc.se < sc.ss || sc.al > 13 ||
        sc.ah > 13) {
        snprintf(gj_err, sizeof gj_err, "bad spectral selection %d..%d/%d.%d",
                 sc.ss, sc.se, sc.ah, sc.al);
        return false;
    }
    if (sc.ss == 0 && sc.se != 0) {
        snprintf(gj_err, sizeof gj_err, "DC scan with Se=%d", sc.se);
        return false;
    }
    if (sc.ss > 0 && ns != 1) {
        snprintf(gj_err, sizeof gj_err, "interleaved AC scan");
        return false;
    }
    return true;
}

static bool prog_dc_first_block(BitReader& br, const HuffDec& dc, int& pred,
                                int al, int16_t* out) {
    int s = huff_decode(br, dc);
    if (s < 0 || s > 15) return false;
    int diff = 0;
    if (s) {
        int v = br.bits(s);
        if (v < 0) return false;
        diff = extend(v, s);
    }
    pred += diff;
    out[0] = (int16_t)(pred << al);
    return true;
}

static bool prog_dc_refine_block(BitReader& br, int al, int16_t* out) {
    int b = br.bit();
    if (b < 0) return false;
    if (b) out[0] = (int16_t)(out[0] | (1 << al));
    return true;
}

static bool prog_ac_first_block(BitReader& br, const HuffDec& ac, int ss,
                                int se, int al, unsigned& eobrun,
                                int16_t* out) {
    if (eobrun > 0) { eobrun--; return true; }
    int k = ss;
    while (k <= se) {
        int rs = huff_decode(br, ac);
        if (rs < 0) return false;
        int r = rs >> 4, s = rs & 15;
        if (s == 0) {
            if (r != 15) {      // EOBn: this block ends, 2^r-1+appended more
                eobrun = (1u << r) - 1;
                if (r) {
                    int v = br.bits(r);
                    if (v < 0) return false;
                    eobrun += (unsigned)v;
                }
                break;
            }
            k += 16;            // ZRL
            continue;
        }
        k += r;
        if (k > se) return false;
        int v = br.bits(s);
        if (v < 0) return false;
        out[k] = (int16_t)(extend(v, s) << al);
        k++;
    }
    return true;
}

static bool prog_ac_refine_block(BitReader& br, const HuffDec& ac, int ss,
                                 int se, int al, unsigned& eobrun,
                                 int16_t* out) {
    const int p1 = 1 << al, m1 = -(1 << al);
    int k = ss;
    if (eobrun == 0) {
        while (k <= se) {
            int rs = huff_decode(br, ac);
            if (rs < 0) return false;
            int r = rs >> 4, s = rs & 15;
            int newval = 0;
            if (s == 0) {
                if (r != 15) {  // EOBn: current block's tail still takes
                    eobrun = (1u << r);   // correction bits below
                    if (r) {
                        int v = br.bits(r);
                        if (v < 0) return false;
                        eobrun += (unsigned)v;
                    }
                    break;
                }
                // r == 15: run of 16 zero-history coefficients
            } else {
                if (s != 1) return false;   // refinement magnitude is 1 bit
                int b = br.bit();
                if (b < 0) return false;
                newval = b ? p1 : m1;
            }
            // advance over the band: nonzero-history coefficients eat a
            // correction bit each; zero-history ones count down the run
            while (k <= se) {
                int16_t* cp = out + k;
                if (*cp != 0) {
                    int b = br.bit();
                    if (b < 0) return false;
                    if (b && (*cp & p1) == 0)
                        *cp = (int16_t)(*cp + (*cp >= 0 ? p1 : m1));
                } else {
                    if (r == 0) {
                        if (newval) *cp = (int16_t)newval;
                        k++;
                        break;
                    }
                    r--;
                }
                k++;
            }
        }
    }
    if (eobrun > 0) {
        // inside an EOB run every nonzero-history coefficient in the
        // band still receives its correction bit
        while (k <= se) {
            int16_t* cp = out + k;
            if (*cp != 0) {
                int b = br.bit();
                if (b < 0) return false;
                if (b && (*cp & p1) == 0)
                    *cp = (int16_t)(*cp + (*cp >= 0 ? p1 : m1));
            }
            k++;
        }
        eobrun--;
    }
    return true;
}

// Decode one scan's entropy data.  Returns bytes consumed (up to the
// terminating marker) or -1.
static long long decode_prog_scan_data(GjpegFile* f, const ProgScan& sc,
                                       const uint8_t* data, long long size,
                                       int16_t* const* bufs,
                                       const int* bufw,
                                       const int* cw, const int* ch,
                                       int mcux, int mcuy) {
    // scan ends at the first marker that is neither stuffing nor RSTn
    long long end = size;
    for (long long j = 0; j + 1 < size; j++) {
        if (data[j] == 0xFF) {
            uint8_t b = data[j + 1];
            if (b == 0x00 || (b >= 0xD0 && b <= 0xD7)) { j++; continue; }
            end = j;
            break;
        }
    }
    BitReader br(data, end, f->restart == 0);
    int pred[3] = {0, 0, 0};
    unsigned eobrun = 0;
    int rst_count = 0;
    auto restart_check = [&](void) {
        if (f->restart && ++rst_count == f->restart) {
            rst_count = 0;
            br.nbits = 0;
            if (br.pos + 1 < br.n && br.p[br.pos] == 0xFF &&
                br.p[br.pos + 1] >= 0xD0 && br.p[br.pos + 1] <= 0xD7)
                br.pos += 2;
            br.marker_hit = false;
            br.stalled_marker = false;
            pred[0] = pred[1] = pred[2] = 0;
            eobrun = 0;
        }
    };
    bool ok = true;
    if (sc.ss == 0 && sc.ncomp > 1) {
        // interleaved DC scan: MCU order, comp_h x comp_v blocks each
        for (int my = 0; my < mcuy && ok; my++)
            for (int mx = 0; mx < mcux && ok; mx++) {
                for (int k = 0; k < sc.ncomp && ok; k++) {
                    int c = sc.ci[k];
                    for (int v = 0; v < f->comp_v[c] && ok; v++)
                        for (int u = 0; u < f->comp_h[c] && ok; u++) {
                            long long brow = (long long)my * f->comp_v[c] + v;
                            long long bcol = (long long)mx * f->comp_h[c] + u;
                            int16_t* out = bufs[c]
                                + (brow * bufw[c] + bcol) * 64;
                            ok = sc.ah == 0
                                ? prog_dc_first_block(br, f->dc[sc.dct[k]],
                                                      pred[k], sc.al, out)
                                : prog_dc_refine_block(br, sc.al, out);
                        }
                }
                if (ok) restart_check();
            }
    } else {
        // non-interleaved: one component, its own block raster; restart
        // interval counts single blocks
        int c = sc.ci[0];
        for (long long by = 0; by < ch[c] && ok; by++)
            for (long long bx = 0; bx < cw[c] && ok; bx++) {
                int16_t* out = bufs[c] + (by * bufw[c] + bx) * 64;
                if (sc.ss == 0)
                    ok = sc.ah == 0
                        ? prog_dc_first_block(br, f->dc[sc.dct[0]], pred[0],
                                              sc.al, out)
                        : prog_dc_refine_block(br, sc.al, out);
                else
                    ok = sc.ah == 0
                        ? prog_ac_first_block(br, f->ac[sc.act[0]], sc.ss,
                                              sc.se, sc.al, eobrun, out)
                        : prog_ac_refine_block(br, f->ac[sc.act[0]], sc.ss,
                                               sc.se, sc.al, eobrun, out);
                if (ok) restart_check();
            }
    }
    if (!ok) {
        snprintf(gj_err, sizeof gj_err, "progressive scan error "
                 "(Ss=%d Se=%d Ah=%d Al=%d)", sc.ss, sc.se, sc.ah, sc.al);
        return -1;
    }
    return end;
}

static int decode_progressive(GjpegFile* f, int16_t* yc, int16_t* uc,
                              int16_t* vc) {
    int hmax = 1, vmax = 1;
    for (int c = 0; c < f->ncomp && c < 3; c++) {
        if (f->comp_h[c] > hmax) hmax = f->comp_h[c];
        if (f->comp_v[c] > vmax) vmax = f->comp_v[c];
    }
    int mcux = (f->width + 8 * hmax - 1) / (8 * hmax);
    int mcuy = (f->height + 8 * vmax - 1) / (8 * vmax);
    int16_t* bufs[3] = {yc, uc, vc};
    int bufw[3] = {1, 1, 1};
    int cw[3] = {0, 0, 0}, ch[3] = {0, 0, 0};
    for (int c = 0; c < f->ncomp && c < 3; c++) {
        // caller buffers are MCU-grid padded (jpeg_tpu.decode_batch)
        bufw[c] = mcux * f->comp_h[c];
        int compw = (f->width * f->comp_h[c] + hmax - 1) / hmax;
        int comph = (f->height * f->comp_v[c] + vmax - 1) / vmax;
        cw[c] = (compw + 7) / 8;
        ch[c] = (comph + 7) / 8;
    }
    const uint8_t* p = f->data.data();
    long long n = (long long)f->data.size();
    long long i = f->sos_off;
    while (i + 2 <= n) {
        if (p[i] != 0xFF) {
            snprintf(gj_err, sizeof gj_err, "garbage between scans");
            return -1;
        }
        uint8_t m = p[i + 1];
        if (m == 0xD9) return 0;                         // EOI
        if (m == 0xFF) { i++; continue; }                // fill byte
        if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) { i += 2; continue; }
        if (i + 4 > n) break;
        int len = (p[i + 2] << 8) | p[i + 3];
        if (len < 2 || i + 2 + len > n) {
            snprintf(gj_err, sizeof gj_err,
                     "truncated segment 0x%02X between scans", m);
            return -1;
        }
        const uint8_t* seg = p + i + 4;
        int seglen = len - 2;
        if (m == 0xC4) {
            if (!parse_dht_segment(f, seg, seglen)) return -1;
        } else if (m == 0xDD) {
            if (seglen < 2) {
                snprintf(gj_err, sizeof gj_err, "truncated DRI");
                return -1;
            }
            f->restart = (seg[0] << 8) | seg[1];
        } else if (m == 0xDA) {
            ProgScan sc;
            if (!parse_prog_scan_header(f, seg, seglen, sc)) return -1;
            for (int k = 0; k < sc.ncomp; k++) {
                // refinement-only scans use no DC table; every other
                // scan's tables must have been defined by now
                bool need_dc = sc.ss == 0 && sc.ah == 0;
                bool need_ac = sc.ss > 0;
                if ((need_dc && !f->has_dht[sc.dct[k]]) ||
                    (need_ac && !f->has_dht[4 + sc.act[k]])) {
                    snprintf(gj_err, sizeof gj_err,
                             "scan references undefined Huffman table");
                    return -1;
                }
            }
            long long off = i + 2 + len;
            long long used = decode_prog_scan_data(
                f, sc, p + off, n - off, bufs, bufw, cw, ch,
                mcux, mcuy);
            if (used < 0) return -1;
            i = off + used;
            continue;
        }
        i += 2 + len;
    }
    return 0;   // data ended without EOI: keep what was refined so far
}

// Parallel decode over restart segments (the nvjpeg-style unit): each
// DRI interval is independently decodable, so segments fan out across
// threads.  Requires a well-formed RSTn layout; anything else falls
// back to the tolerant sequential decoder.
GJ_API int gjpeg_decode_coefs_mt(void* h, int16_t* yc, int16_t* uc,
                                 int16_t* vc, int nthreads);

GJ_API int gjpeg_decode_coefs(void* h, int16_t* yc, int16_t* uc, int16_t* vc) {
    auto* f = (GjpegFile*)h;
    if (f->progressive) return decode_progressive(f, yc, uc, vc);
    long long total = gj_total_mcus(f);
    // bulk refill only without restart intervals: restart alignment
    // manipulates pos/nbits with single-byte-buffer assumptions
    BitReader br(f->scan, f->scan_size, f->restart == 0);
    if (f->restart <= 0) {
        if (!decode_mcu_range(f, br, 0, total, yc, uc, vc)) {
            snprintf(gj_err, sizeof gj_err, "scan error");
            return -1;
        }
        return 0;
    }
    // restart intervals: decode each as an independent range (fresh DC
    // predictors), realigning to the byte/RSTn boundary in between —
    // tolerant of malformed layouts (marker missing = just continue),
    // which is why the parallel path falls back here
    long long m0 = 0;
    while (m0 < total) {
        long long m1 = m0 + f->restart;
        if (m1 > total) m1 = total;
        if (!decode_mcu_range(f, br, m0, m1, yc, uc, vc)) {
            snprintf(gj_err, sizeof gj_err,
                     "scan error in mcus %lld..%lld", m0, m1);
            return -1;
        }
        if (m1 < total) {
            br.nbits = 0;                  // byte-align, expect RSTn
            if (br.pos + 1 < br.n && br.p[br.pos] == 0xFF &&
                br.p[br.pos + 1] >= 0xD0 && br.p[br.pos + 1] <= 0xD7)
                br.pos += 2;
            br.marker_hit = false;
            br.stalled_marker = false;
        }
        m0 = m1;
    }
    return 0;
}

GJ_API int gjpeg_decode_coefs_mt(void* h, int16_t* yc, int16_t* uc,
                                 int16_t* vc, int nthreads) {
    auto* f = (GjpegFile*)h;
    long long total = gj_total_mcus(f);
    if (f->progressive || f->restart <= 0 || nthreads <= 1
        || total <= f->restart)
        return gjpeg_decode_coefs(h, yc, uc, vc);
    // segment k starts right after the k-th RSTn (segment 0 at offset 0)
    std::vector<long long> seg_off{0};
    const uint8_t* p = f->scan;
    for (long long i = 0; i + 1 < f->scan_size; i++) {
        if (p[i] == 0xFF) {
            uint8_t b = p[i + 1];
            if (b >= 0xD0 && b <= 0xD7) { seg_off.push_back(i + 2); i++; }
            else if (b == 0x00) i++;               // stuffing
        }
    }
    long long nseg = (total + f->restart - 1) / f->restart;
    if ((long long)seg_off.size() != nseg)
        return gjpeg_decode_coefs(h, yc, uc, vc); // malformed layout
    std::atomic<bool> ok{true};
    std::mutex emu;
    std::string emsg;
    int nt = nthreads < (int)nseg ? nthreads : (int)nseg;
    std::vector<std::thread> ts;
    for (int t = 0; t < nt; t++) {
        ts.emplace_back([&, t]() {
            for (long long s = t; s < nseg && ok.load(); s += nt) {
                long long m0 = s * f->restart;
                long long m1 = m0 + f->restart;
                if (m1 > total) m1 = total;
                // segments hold no restart boundaries: bulk refill is
                // safe and stops at the NEXT marker by construction
                BitReader br(f->scan + seg_off[s],
                             f->scan_size - seg_off[s], true);
                if (!decode_mcu_range(f, br, m0, m1, yc, uc, vc)) {
                    std::lock_guard<std::mutex> g(emu);
                    emsg = "scan error in restart segment "
                           + std::to_string((long long)s);
                    ok.store(false);
                }
            }
        });
    }
    for (auto& th : ts) th.join();
    if (!ok.load()) {
        std::lock_guard<std::mutex> g(emu);
        snprintf(gj_err, sizeof gj_err, "%s", emsg.c_str());
        return -1;
    }
    return 0;
}

GJ_API int gjpeg_encode_progressive(const int16_t* yc, const int16_t* uc,
                                    const int16_t* vc, int width,
                                    int height, int subsamp,
                                    const uint8_t* qluma,
                                    const uint8_t* qchroma,
                                    uint8_t* outbuf, long long capacity) {
    return gjpeg_encode_progressive_r(yc, uc, vc, width, height, subsamp,
                                      qluma, qchroma, outbuf, capacity, 0);
}
