// whisper_tpu native FLAC decoder — from scratch, no third-party code.
//
// The reference ingests FLAC through dr_flac vendored inside miniaudio
// (reference: examples/common-whisper.cpp:27,46 read_audio_data).  This is
// an independent implementation of the FLAC bitstream format with the same
// decoding contract; `whisper_tpu/audio/flac.py` is the pure-Python
// reference implementation of the identical logic, and both are pinned
// bit-exact against the reference's own vendored decoder in
// tests/test_flac_golden.py.
//
// Exposed C ABI (ctypes, see whisper_tpu/audio/native.py):
//   wtpu_flac_probe  — is this buffer a FLAC stream?
//   wtpu_flac_decode — whole-stream decode to interleaved sign-extended
//                      int32 at the stream bit depth (wasted-bit shifts
//                      applied); caller frees with wtpu_flac_free.
//
// Compiled into libwtpu_audio.so (see Makefile).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Bits {
    const uint8_t* data;
    size_t n;
    size_t byte = 0;
    int bit = 0;
    bool fail = false;

    bool eof() const { return byte >= n; }

    uint32_t read(int nb) {
        uint32_t v = 0;
        while (nb) {
            if (byte >= n) { fail = true; return 0; }
            int avail = 8 - bit;
            int take = nb < avail ? nb : avail;
            v = (v << take) |
                ((data[byte] >> (avail - take)) & ((1u << take) - 1));
            bit += take;
            if (bit == 8) { bit = 0; byte++; }
            nb -= take;
        }
        return v;
    }

    uint64_t read64(int nb) {
        uint64_t v = 0;
        if (nb > 32) { v = read(nb - 32); nb = 32; }
        return (v << nb) | read(nb);
    }

    int64_t read_signed(int nb) {
        uint64_t v = read64(nb);
        if (nb < 64 && (v >> (nb - 1)))
            return (int64_t) v - ((int64_t) 1 << nb);
        return (int64_t) v;
    }

    uint32_t unary() {
        uint32_t q = 0;
        for (;;) {
            if (byte >= n) { fail = true; return 0; }
            // fast path: scan whole bytes of zeros
            uint8_t cur = (uint8_t) (data[byte] << bit);
            if (cur == 0) {
                q += 8 - bit;
                bit = 0;
                byte++;
                continue;
            }
            while ((cur & 0x80) == 0) { q++; cur <<= 1; bit++; }
            bit++;   // consume the terminating 1
            if (bit >= 8) { bit -= 8; byte++; }
            return q;
        }
    }

    void align() {
        if (bit) { bit = 0; byte++; }
    }
};

// CRC-8 (poly 0x07) and CRC-16 (poly 0x8005), both init 0 — FLAC framing.
struct CrcTables {
    uint8_t c8[256];
    uint16_t c16[256];
    CrcTables() {
        for (int b = 0; b < 256; b++) {
            uint32_t c = (uint32_t) b;
            for (int i = 0; i < 8; i++)
                c = (c & 0x80) ? ((c << 1) ^ 0x07) & 0xFF : (c << 1) & 0xFF;
            c8[b] = (uint8_t) c;
            c = (uint32_t) b << 8;
            for (int i = 0; i < 8; i++)
                c = (c & 0x8000) ? ((c << 1) ^ 0x8005) & 0xFFFF
                                 : (c << 1) & 0xFFFF;
            c16[b] = (uint16_t) c;
        }
    }
};
const CrcTables kCrc;

uint8_t crc8(const uint8_t* p, size_t n) {
    uint8_t c = 0;
    for (size_t i = 0; i < n; i++) c = kCrc.c8[c ^ p[i]];
    return c;
}

uint16_t crc16(const uint8_t* p, size_t n) {
    uint16_t c = 0;
    for (size_t i = 0; i < n; i++)
        c = (uint16_t) (kCrc.c16[((c >> 8) ^ p[i]) & 0xFF] ^ (c << 8));
    return c;
}

const int kFixedOrderCoef[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool read_utf8_number(Bits& b, uint64_t* out) {
    uint32_t b0 = b.read(8);
    if (b.fail) return false;
    if (b0 < 0x80) { *out = b0; return true; }
    int n_extra = 0;
    uint32_t mask = 0x40;
    while (b0 & mask) { n_extra++; mask >>= 1; }
    if (n_extra == 0 || n_extra > 6) return false;
    uint64_t v = b0 & (mask - 1);
    for (int i = 0; i < n_extra; i++) {
        uint32_t bc = b.read(8);
        if (b.fail || (bc & 0xC0) != 0x80) return false;
        v = (v << 6) | (bc & 0x3F);
    }
    *out = v;
    return true;
}

bool read_residual(Bits& b, int block_size, int pred_order,
                   std::vector<int64_t>& out) {
    uint32_t method = b.read(2);
    if (b.fail || method > 1) return false;
    int plen = method ? 5 : 4;
    uint32_t escape = (1u << plen) - 1;
    int part_order = (int) b.read(4);
    int n_parts = 1 << part_order;
    if (block_size % n_parts) return false;
    out.clear();
    for (int p = 0; p < n_parts; p++) {
        int cnt = (block_size >> part_order) - (p == 0 ? pred_order : 0);
        if (cnt < 0) return false;
        uint32_t param = b.read(plen);
        if (b.fail) return false;
        if (param == escape) {
            int raw_bits = (int) b.read(5);
            if (raw_bits == 0) {
                out.insert(out.end(), cnt, 0);
            } else {
                for (int i = 0; i < cnt; i++)
                    out.push_back(b.read_signed(raw_bits));
            }
        } else {
            for (int i = 0; i < cnt; i++) {
                uint32_t q = b.unary();
                uint32_t r = param ? b.read(param) : 0;
                uint64_t v = ((uint64_t) q << param) | r;
                out.push_back((int64_t) (v >> 1) ^ -(int64_t) (v & 1));
            }
        }
        if (b.fail) return false;
    }
    return true;
}

bool decode_subframe(Bits& b, int block_size, int bps,
                     std::vector<int64_t>& samples) {
    if (b.read(1)) return false;   // padding bit must be 0
    uint32_t ftype = b.read(6);
    int wasted = 0;
    if (b.read(1)) {
        wasted = (int) b.unary() + 1;
        bps -= wasted;
        if (bps <= 0) return false;
    }
    if (b.fail) return false;

    samples.clear();
    samples.reserve(block_size);
    std::vector<int64_t> resid;

    if (ftype == 0) {                                // CONSTANT
        int64_t v = b.read_signed(bps);
        samples.assign(block_size, v);
    } else if (ftype == 1) {                         // VERBATIM
        for (int i = 0; i < block_size; i++)
            samples.push_back(b.read_signed(bps));
    } else if (ftype >= 8 && ftype <= 12) {          // FIXED
        int order = (int) ftype - 8;
        for (int i = 0; i < order; i++)
            samples.push_back(b.read_signed(bps));
        if (!read_residual(b, block_size, order, resid)) return false;
        const int* coef = kFixedOrderCoef[order];
        for (int64_t r : resid) {
            int64_t acc = r;
            size_t m = samples.size();
            for (int j = 0; j < order; j++)
                acc += (int64_t) coef[j] * samples[m - 1 - j];
            samples.push_back(acc);
        }
    } else if (ftype >= 32) {                        // LPC
        int order = (int) (ftype & 0x1F) + 1;
        for (int i = 0; i < order; i++)
            samples.push_back(b.read_signed(bps));
        int prec = (int) b.read(4) + 1;
        if (prec == 16) return false;
        int shift = (int) b.read_signed(5);
        if (shift < 0) return false;
        std::vector<int64_t> coef(order);
        for (int i = 0; i < order; i++)
            coef[i] = b.read_signed(prec);
        if (!read_residual(b, block_size, order, resid)) return false;
        for (int64_t r : resid) {
            int64_t acc = 0;
            size_t m = samples.size();
            for (int j = 0; j < order; j++)
                acc += coef[j] * samples[m - 1 - j];
            samples.push_back(r + (acc >> shift));
        }
    } else {
        return false;                                // reserved type
    }
    if (b.fail) return false;

    if (wasted)
        for (auto& s : samples) s <<= wasted;
    return true;
}

}  // namespace

extern "C" {

// 1 if the buffer starts with the fLaC stream marker.
int wtpu_flac_probe(const uint8_t* data, uint64_t n) {
    return n >= 4 && memcmp(data, "fLaC", 4) == 0;
}

// Decode a whole FLAC stream.  On success (return 0) *out_pcm is a
// malloc'd interleaved buffer of out_frames*out_channels int32 samples,
// sign-extended at *out_bits depth; free with wtpu_flac_free.
// Nonzero return = parse/CRC error (buffer untouched).
int wtpu_flac_decode(const uint8_t* data, uint64_t n,
                     int32_t** out_pcm, uint64_t* out_frames,
                     uint32_t* out_channels, uint32_t* out_rate,
                     uint32_t* out_bits, int verify_crc) {
    if (!wtpu_flac_probe(data, n)) return 1;
    size_t pos = 4;
    uint32_t rate = 0, channels = 0, bps = 0;
    uint64_t total = 0;
    bool have_streaminfo = false;
    for (;;) {
        if (pos + 4 > n) return 2;
        bool last = data[pos] & 0x80;
        int btype = data[pos] & 0x7F;
        uint32_t blen = ((uint32_t) data[pos + 1] << 16) |
                        ((uint32_t) data[pos + 2] << 8) | data[pos + 3];
        if (pos + 4 + blen > n) return 2;
        if (btype == 0) {
            if (blen < 34) return 2;
            Bits b{data + pos + 4, blen};
            b.read(16); b.read(16); b.read(24); b.read(24);
            rate = b.read(20);
            channels = b.read(3) + 1;
            bps = b.read(5) + 1;
            total = b.read64(36);
            have_streaminfo = true;
        }
        pos += 4 + blen;
        if (last) break;
    }
    if (!have_streaminfo || channels == 0) return 3;

    std::vector<int32_t> pcm;
    if (total) pcm.reserve((size_t) (total * channels));
    std::vector<std::vector<int64_t>> chans(8);
    uint64_t n_decoded = 0;

    Bits b{data, n, pos, 0};
    while (!b.eof() && (total == 0 || n_decoded < total)) {
        size_t frame_start = b.byte;
        if (b.read(14) != 0x3FFE) return 4;
        if (b.read(1)) return 4;
        b.read(1);   // blocking strategy
        uint32_t bs_code = b.read(4);
        uint32_t sr_code = b.read(4);
        uint32_t ch_code = b.read(4);
        uint32_t bps_code = b.read(3);
        if (b.read(1)) return 4;
        uint64_t coded_no;
        if (!read_utf8_number(b, &coded_no)) return 4;

        int block_size;
        if (bs_code == 0) return 4;
        else if (bs_code == 1) block_size = 192;
        else if (bs_code <= 5) block_size = 576 << (bs_code - 2);
        else if (bs_code == 6) block_size = (int) b.read(8) + 1;
        else if (bs_code == 7) block_size = (int) b.read(16) + 1;
        else block_size = 256 << (bs_code - 8);

        if (sr_code == 12) b.read(8);
        else if (sr_code == 13 || sr_code == 14) b.read(16);
        else if (sr_code == 15) return 4;

        int frame_bps;
        switch (bps_code) {
            case 0: frame_bps = (int) bps; break;
            case 1: frame_bps = 8; break;
            case 2: frame_bps = 12; break;
            case 4: frame_bps = 16; break;
            case 5: frame_bps = 20; break;
            case 6: frame_bps = 24; break;
            case 7: frame_bps = 32; break;
            default: return 4;
        }

        uint32_t hdr_crc = b.read(8);
        if (b.fail) return 4;
        if (verify_crc &&
            hdr_crc != crc8(data + frame_start, b.byte - 1 - frame_start))
            return 5;

        uint32_t n_ch;
        if (ch_code < 8) {
            n_ch = ch_code + 1;
            for (uint32_t c = 0; c < n_ch; c++)
                if (!decode_subframe(b, block_size, frame_bps, chans[c]))
                    return 6;
        } else if (ch_code <= 10) {
            n_ch = 2;
            int bps0 = frame_bps + (ch_code == 9 ? 1 : 0);
            int bps1 = frame_bps + (ch_code != 9 ? 1 : 0);
            if (!decode_subframe(b, block_size, bps0, chans[0]) ||
                !decode_subframe(b, block_size, bps1, chans[1]))
                return 6;
            if (ch_code == 8) {          // left/side: right = left - side
                for (int i = 0; i < block_size; i++)
                    chans[1][i] = chans[0][i] - chans[1][i];
            } else if (ch_code == 9) {   // side/right: left = right + side
                for (int i = 0; i < block_size; i++)
                    chans[0][i] = chans[1][i] + chans[0][i];
            } else {                     // mid/side
                for (int i = 0; i < block_size; i++) {
                    int64_t m = chans[0][i], s = chans[1][i];
                    m = (m << 1) | (s & 1);
                    chans[0][i] = (m + s) >> 1;
                    chans[1][i] = (m - s) >> 1;
                }
            }
        } else {
            return 4;
        }
        if (n_ch != channels) return 4;

        b.align();
        uint32_t frame_crc = b.read(16);
        if (b.fail) return 4;
        if (verify_crc &&
            frame_crc != crc16(data + frame_start, b.byte - 2 - frame_start))
            return 5;

        uint64_t keep = (uint64_t) block_size;
        if (total && n_decoded + keep > total) keep = total - n_decoded;
        for (uint64_t i = 0; i < keep; i++)
            for (uint32_t c = 0; c < channels; c++)
                pcm.push_back((int32_t) chans[c][i]);
        n_decoded += block_size;
    }
    if (total && n_decoded < total) return 7;

    uint64_t frames = total ? total : n_decoded;
    int32_t* buf = (int32_t*) malloc(sizeof(int32_t) *
                                     (size_t) (frames * channels + 1));
    if (!buf) return 8;
    memcpy(buf, pcm.data(), sizeof(int32_t) * (size_t) (frames * channels));
    *out_pcm = buf;
    *out_frames = frames;
    *out_channels = channels;
    *out_rate = rate;
    *out_bits = bps;
    return 0;
}

void wtpu_flac_free(int32_t* p) { free(p); }

}  // extern "C"
