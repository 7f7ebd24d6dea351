// Native (C++) Ogg Vorbis decoder — the fast path behind audio/vorbis.py.
//
// Semantics are a 1:1 mirror of the framework's pure-Python decoder
// (whisper_tpu/audio/vorbis.py + ogg.py), which is itself written from the
// Vorbis I specification and pinned against the reference's vendored
// stb_vorbis (reference: examples/common-whisper.cpp:11-27 compiles
// stb_vorbis inside miniaudio).  Every deliberate stb-quirk mirrored by the
// Python decoder (floor1 ilog(range)-1 Y bits, draw_line y&255 wrap,
// residue-2 actual_size=n*2 clamp, sequence_p chaining arithmetic,
// pull-mode zero-frame termination) is mirrored here too — see the Python
// module docstring for the full list and rationale.
//
// Numerical contract: all f32 arithmetic (residue accumulation, coupling,
// floor multiply, overlap-add) uses the same operation order as the numpy
// path so results round identically (build with -ffp-contract=off, no
// -ffast-math).  The IMDCT is computed in f64 like the Python path; the FFT
// implementation differs from pocketfft by ~1e-15 relative, which after the
// final f32 cast leaves outputs equal except for rare 1-ulp boundaries —
// tests/test_vorbis_native.py pins native-vs-Python within 1 s16 LSB and
// native-vs-stb_vorbis within the same 2-LSB envelope as the Python goldens.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <map>
#include <unordered_map>
#include <vector>

namespace {

struct VorbisErr {};  // any malformed-stream condition (Python: VorbisError)
struct Eop {};        // huffman walk ran out of packet bits (_EndOfPacket)

static int ilog(long long n) {
    int b = 0;
    while (n > 0) { b++; n >>= 1; }
    return b;
}

static float float32_unpack(uint32_t x) {
    uint32_t mant = x & 0x1FFFFF;
    int expn = (int)((x & 0x7FE00000u) >> 21);
    double val = std::ldexp((double)mant, expn - 788);
    if (x & 0x80000000u) val = -val;
    return (float)val;
}

static bool pow_leq(long long b, int e, long long limit) {
    // b**e <= limit without overflow
    long long r = 1;
    for (int i = 0; i < e; i++) {
        if (b != 0 && r > limit / b) return false;
        r *= b;
        if (r > limit) return false;
    }
    return r <= limit;
}

static long long lookup1_values(long long entries, int dims) {
    long long v = 0;
    if (entries > 0)
        v = (long long)std::floor(std::exp(std::log((double)entries) / dims));
    if (pow_leq(v + 1, dims, entries)) v += 1;
    if (pow_leq(v + 1, dims, entries) || !pow_leq(v, dims, entries))
        throw VorbisErr{};
    return v;
}

// floor1 inverse-dB lookup, spec 10.1: 10^(7*(i-255)/256), stored f32
static const float* inverse_db_table() {
    static float tbl[256];
    static bool init = [] {
        for (int i = 0; i < 256; i++)
            tbl[i] = (float)std::pow(10.0, 7.0 * ((double)i - 255.0) / 256.0);
        return true;
    }();
    (void)init;
    return tbl;
}

// ---------------------------------------------------------------------------
// Ogg container (mirrors audio/ogg.py iter_packets)

struct OggPacket {
    std::vector<uint8_t> bytes;
    uint64_t granule = 0;
    bool has_granule = false;  // last packet completing on its page
    bool page_is_last = false;
};

struct OggReader {
    const uint8_t* data;
    size_t len;
    size_t off = 0;
    std::vector<uint8_t> partial;
    bool have_partial = false;
    std::deque<OggPacket> queue;

    OggReader(const uint8_t* d, size_t n) : data(d), len(n) {}

    bool next(OggPacket& out) {
        while (queue.empty())
            if (!parse_page()) return false;
        out = std::move(queue.front());
        queue.pop_front();
        return true;
    }

    // -> false at end of data / trailing garbage; throws on malformed framing
    bool parse_page() {
        if (off >= len) return false;
        if (off + 4 > len || std::memcmp(data + off, "OggS", 4) != 0)
            return false;  // tolerate trailing garbage (no capture pattern)
        if (off + 27 > len) throw VorbisErr{};  // truncated page header
        if (data[off + 4] != 0) throw VorbisErr{};  // unsupported version
        uint8_t header_type = data[off + 5];
        uint64_t granule = 0;
        for (int i = 0; i < 8; i++)
            granule |= (uint64_t)data[off + 6 + i] << (8 * i);
        unsigned nsegs = data[off + 26];
        size_t lace_end = off + 27 + nsegs;
        if (lace_end > len) throw VorbisErr{};  // truncated lacing table
        const uint8_t* lacing = data + off + 27;
        size_t body_len = 0;
        for (unsigned i = 0; i < nsegs; i++) body_len += lacing[i];
        size_t next_off = lace_end + body_len;
        if (next_off > len) throw VorbisErr{};  // truncated page body
        const uint8_t* payload = data + lace_end;
        bool continued = (header_type & 0x01) != 0;
        bool is_last = (header_type & 0x04) != 0;
        if (!continued && have_partial) {
            partial.clear();  // lost continuation: drop the partial packet
            have_partial = false;
        }
        unsigned start = 0;
        if (continued && !have_partial) {
            // continuation of a packet we never started: skip the orphan
            int term = -1;
            for (unsigned i = 0; i < nsegs; i++)
                if (lacing[i] < 255) { term = (int)i; break; }
            if (term < 0) { off = next_off; return true; }  // all orphan middle
            start = (unsigned)term + 1;
        }
        int last_completing = -1;
        for (unsigned i = 0; i < nsegs; i++)
            if (lacing[i] < 255) last_completing = (int)i;
        size_t pos = 0;
        for (unsigned i = 0; i < start; i++) pos += lacing[i];
        for (unsigned i = start; i < nsegs; i++) {
            unsigned lv = lacing[i];
            partial.insert(partial.end(), payload + pos, payload + pos + lv);
            have_partial = true;
            pos += lv;
            if (lv < 255) {
                OggPacket p;
                p.bytes.swap(partial);
                p.has_granule = ((int)i == last_completing);
                p.granule = granule;
                p.page_is_last = is_last;
                queue.push_back(std::move(p));
                have_partial = false;
            }
        }
        off = next_off;
        return true;
    }
};

// ---------------------------------------------------------------------------
// Bit reader (LSB-first Vorbis bitpacking; read() latches eop returning 0,
// read1() throws Eop — same split as the Python _BitReader)

struct BitReader {
    std::vector<uint8_t> padded;  // packet + 8 zero bytes for word peeks
    const uint8_t* buf;
    size_t nbits;
    size_t pos = 0;
    bool eop = false;

    BitReader(const uint8_t* p, size_t n) {
        padded.assign(p, p + n);
        padded.resize(n + 8, 0);
        buf = padded.data();
        nbits = n * 8;
    }

    uint32_t read(int n) {
        if (n == 0) return 0;
        if (eop || pos + (size_t)n > nbits) {
            eop = true;
            pos = nbits;
            return 0;
        }
        uint64_t w;
        std::memcpy(&w, buf + (pos >> 3), 8);
        uint64_t mask = (n >= 32) ? 0xFFFFFFFFull : ((1ull << n) - 1);
        uint32_t v = (uint32_t)((w >> (pos & 7)) & mask);
        pos += (size_t)n;
        return v;
    }

    int read1() {
        if (eop || pos >= nbits) {
            eop = true;
            throw Eop{};
        }
        int b = (buf[pos >> 3] >> (pos & 7)) & 1;
        pos++;
        return b;
    }

    uint32_t peek_word() const {  // next >=25 stream bits (zero-padded)
        uint64_t w;
        std::memcpy(&w, buf + (pos >> 3), 8);
        return (uint32_t)(w >> (pos & 7));
    }
};

// ---------------------------------------------------------------------------
// Codebook

constexpr int FAST_BITS = 12;  // acceleration-table width (matches Python)

struct Codebook {
    int dims = 0;
    int entries = 0;
    int lookup_type = 0;
    bool sequence_p = false;
    float minimum = 0.0f, delta = 0.0f;
    std::vector<float> vq;  // (entries, dims) row-major when lookup_type != 0
    int maxlen = 0;
    std::vector<int32_t> fast_entry;
    std::vector<uint8_t> fast_len;
    uint32_t fast_mask = 0;
    std::unordered_map<uint64_t, int> table;  // (len<<32)|code -> entry

    void parse(BitReader& r);
    int decode_scalar(BitReader& r) const;
};

// canonical Vorbis codeword assignment (spec 3.2.1); lens[i]==0 -> unused
static void assign_codewords(const std::vector<int>& lengths,
                             std::vector<uint32_t>& codes,
                             std::vector<int>& lens) {
    size_t n = lengths.size();
    codes.assign(n, 0);
    lens.assign(n, 0);
    uint32_t available[33] = {0};
    bool first = true;
    for (size_t i = 0; i < n; i++) {
        int ln = lengths[i];
        if (ln < 0) continue;  // sparse unused entry
        if (ln < 1 || ln > 32) throw VorbisErr{};
        if (first) {
            codes[i] = 0;
            lens[i] = ln;
            for (int d = 1; d <= ln; d++) available[d] = 1u << (32 - d);
            first = false;
            continue;
        }
        int z = ln;
        while (z > 0 && !available[z]) z--;
        if (z == 0) throw VorbisErr{};  // overspecified huffman tree
        uint32_t res = available[z];
        available[z] = 0;
        codes[i] = res >> (32 - ln);  // ln <= 31 (length 32 rejected at parse)
        lens[i] = ln;
        for (int y = ln; y > z; y--) available[y] = res + (1u << (32 - y));
    }
}

void Codebook::parse(BitReader& r) {
    if (r.read(24) != 0x564342) throw VorbisErr{};  // 'BCV' sync lost
    dims = (int)r.read(16);
    entries = (int)r.read(24);
    if (dims == 0 && entries != 0) throw VorbisErr{};  // dimensionless
    // Hardening, not spec: entries(24b) x dims(16b) size the huffman map
    // and the (entries, dims) VQ table, so a ~40-byte setup header could
    // otherwise demand multi-GB allocations on the server request path.
    // Caps match whisper_tpu/audio/vorbis.py (_MAX_CB_ENTRIES/_MAX_CB_CELLS)
    // exactly so the two decoders keep error parity.
    if (entries > (1 << 20) || (long long)entries * dims > (1LL << 24))
        throw VorbisErr{};  // codebook too large
    int ordered = r.read1();
    std::vector<int> lengths;
    lengths.reserve((size_t)entries);
    if (ordered) {
        int cur_len = (int)r.read(5) + 1;
        while ((int)lengths.size() < entries) {
            long long limit = entries - (long long)lengths.size();
            long long count = r.read(ilog(limit));
            if (cur_len >= 32 || (long long)lengths.size() + count > entries)
                throw VorbisErr{};
            lengths.insert(lengths.end(), (size_t)count, cur_len);
            cur_len++;
        }
    } else {
        int sparse = r.read1();
        for (int i = 0; i < entries; i++) {
            if (sparse && !r.read1()) {
                lengths.push_back(-1);
            } else {
                int ln = (int)r.read(5) + 1;
                if (ln == 32) throw VorbisErr{};
                lengths.push_back(ln);
            }
        }
    }
    if (r.eop) throw VorbisErr{};  // EOP in codebook header

    std::vector<uint32_t> codes;
    std::vector<int> lens;
    assign_codewords(lengths, codes, lens);
    maxlen = 0;
    for (int e = 0; e < entries; e++)
        if (lens[e]) {
            table[((uint64_t)lens[e] << 32) | codes[e]] = e;
            maxlen = std::max(maxlen, lens[e]);
        }
    // acceleration table: stream-order (LSB-first) K-bit peek -> entry
    int k = maxlen ? std::min(FAST_BITS, maxlen) : 0;
    size_t size = (size_t)1 << k;
    fast_entry.assign(size, -1);
    fast_len.assign(size, 0);
    fast_mask = (uint32_t)(size - 1);
    for (int e = 0; e < entries; e++) {
        int ln = lens[e];
        if (!ln || ln > k) continue;
        uint32_t code = codes[e];
        uint32_t pat = 0;  // codeword bits as they appear on the wire
        for (int i = 0; i < ln; i++)
            pat |= ((code >> (ln - 1 - i)) & 1u) << i;
        for (size_t v = pat; v < size; v += (size_t)1 << ln) {
            fast_entry[v] = e;
            fast_len[v] = (uint8_t)ln;
        }
    }

    lookup_type = (int)r.read(4);
    if (lookup_type > 2) throw VorbisErr{};
    if (lookup_type) {
        minimum = float32_unpack(r.read(32));
        delta = float32_unpack(r.read(32));
        int value_bits = (int)r.read(4) + 1;
        sequence_p = r.read1() != 0;
        long long lv;
        if (lookup_type == 1)
            lv = lookup1_values(entries, dims);
        else
            lv = (long long)entries * dims;
        if (lv == 0) throw VorbisErr{};  // empty lookup table
        std::vector<float> mults((size_t)lv);
        for (long long j = 0; j < lv; j++)
            mults[(size_t)j] = (float)r.read(value_bits);
        if (r.eop) throw VorbisErr{};  // EOP in codebook lookup
        // Pre-expand to a per-entry (entries, dims) f32 table with the exact
        // arithmetic the Python path bakes at setup (incl. `last` carrying
        // across entries when sequence_p is set).
        vq.assign((size_t)entries * (size_t)dims, 0.0f);
        float last = 0.0f;
        if (lookup_type == 1) {
            for (int e = 0; e < entries; e++) {
                if (!lens[e]) continue;  // sparse unused rows stay zero
                long long div = 1;
                for (int d = 0; d < dims; d++) {
                    long long offv = (e / div) % lv;
                    float val = mults[(size_t)offv] * delta + minimum + last;
                    vq[(size_t)e * dims + d] = val;
                    if (sequence_p) last = val;
                    div *= lv;
                }
            }
        } else {
            for (long long j = 0; j < lv; j++) {
                float val = mults[(size_t)j] * delta + minimum + last;
                vq[(size_t)j] = val;
                if (sequence_p) last = val;
            }
        }
    }
}

int Codebook::decode_scalar(BitReader& r) const {
    size_t pos = r.pos;
    if (pos < r.nbits) {
        uint32_t v = r.peek_word() & fast_mask;
        int32_t entry = fast_entry[v];
        if (entry >= 0) {
            size_t end = pos + fast_len[v];
            if (end <= r.nbits) {
                r.pos = end;
                return entry;
            }
            // codeword extends past the packet: EOP (stb: valid_bits < len)
            r.eop = true;
            r.pos = r.nbits;
            throw Eop{};
        }
    }
    // slow path: codewords longer than the acceleration width
    uint32_t code = 0;
    for (int ln = 1; ln <= maxlen; ln++) {
        code = (code << 1) | (uint32_t)r.read1();
        auto it = table.find(((uint64_t)ln << 32) | code);
        if (it != table.end()) return it->second;
    }
    throw VorbisErr{};  // invalid codeword (underspecified tree)
}

// ---------------------------------------------------------------------------
// Floor 1

static const int RANGE_LIST[4] = {256, 128, 86, 64};

static int predict_point(int x, int x0, int x1, int y0, int y1) {
    int dy = y1 - y0;
    int adx = x1 - x0;
    int err = std::abs(dy) * (x - x0);
    int off = err / adx;
    return dy < 0 ? y0 - off : y0 + off;
}

static void draw_line(float* out, int x0, int y0, int x1, int y1, int n) {
    // Bresenham floor-line render; bit-exact integer walk required by the
    // format (every decoder must produce these exact quantized y's)
    const float* tbl = inverse_db_table();
    int dy = y1 - y0;
    int adx = x1 - x0;
    int ady = std::abs(dy);
    int base = dy / adx;  // C truncating division
    int sy = dy < 0 ? base - 1 : base + 1;
    ady -= std::abs(base) * adx;
    if (x1 > n) x1 = n;
    if (x0 >= x1) return;
    out[x0] *= tbl[y0 & 255];
    int err = 0, y = y0;
    for (int x = x0 + 1; x < x1; x++) {
        err += ady;
        if (err >= adx) {
            err -= adx;
            y += sy;
        } else {
            y += base;
        }
        out[x] *= tbl[y & 255];
    }
}

struct Floor1 {
    int partitions = 0;
    std::vector<int> partition_class, class_dims, class_subclasses,
        class_masterbooks;
    std::vector<std::vector<int>> subclass_books;
    int multiplier = 1;
    std::vector<int> xlist, sorted_order;
    std::vector<std::pair<int, int>> neigh;

    void parse(BitReader& r, int n_books) {
        partitions = (int)r.read(5);
        partition_class.resize(partitions);
        for (int i = 0; i < partitions; i++)
            partition_class[i] = (int)r.read(4);
        int max_class = -1;
        for (int c : partition_class) max_class = std::max(max_class, c);
        for (int c = 0; c <= max_class; c++) {
            int dim = (int)r.read(3) + 1;
            int sub = (int)r.read(2);
            int master = -1;
            if (sub) {
                master = (int)r.read(8);
                if (master >= n_books) throw VorbisErr{};
            }
            std::vector<int> books;
            for (int j = 0; j < (1 << sub); j++) {
                int b = (int)r.read(8) - 1;
                if (b >= n_books) throw VorbisErr{};
                books.push_back(b);
            }
            class_dims.push_back(dim);
            class_subclasses.push_back(sub);
            class_masterbooks.push_back(master);
            subclass_books.push_back(std::move(books));
        }
        multiplier = (int)r.read(2) + 1;
        int rangebits = (int)r.read(4);
        xlist = {0, 1 << rangebits};
        for (int j = 0; j < partitions; j++) {
            int c = partition_class[j];
            for (int d = 0; d < class_dims[c]; d++)
                xlist.push_back((int)r.read(rangebits));
        }
        {
            std::vector<int> s(xlist);
            std::sort(s.begin(), s.end());
            for (size_t i = 1; i < s.size(); i++)
                if (s[i] == s[i - 1]) throw VorbisErr{};  // duplicate X
        }
        sorted_order.resize(xlist.size());
        for (size_t i = 0; i < xlist.size(); i++) sorted_order[i] = (int)i;
        std::stable_sort(sorted_order.begin(), sorted_order.end(),
                         [this](int a, int b) { return xlist[a] < xlist[b]; });
        neigh.assign(2, {0, 0});
        for (size_t j = 2; j < xlist.size(); j++) {
            // nearest X below/above xlist[j] among xlist[:j] (spec 9.2.4/5)
            int low_v = -1, low_i = -1, high_v = 65536, high_i = -1;
            for (size_t i = 0; i < j; i++) {
                if (xlist[i] > low_v && xlist[i] < xlist[j]) {
                    low_v = xlist[i];
                    low_i = (int)i;
                }
                if (xlist[i] < high_v && xlist[i] > xlist[j]) {
                    high_v = xlist[i];
                    high_i = (int)i;
                }
            }
            neigh.push_back({low_i, high_i});
        }
    }

    // -> false when this channel's floor is unused this frame
    bool decode(BitReader& r, const std::vector<Codebook>& books,
                std::vector<int>& final_y, std::vector<uint8_t>& step2) const {
        try {
            if (!r.read1()) return false;
        } catch (Eop&) {
            return false;
        }
        int rng = RANGE_LIST[multiplier - 1];
        int ybits = ilog(rng) - 1;  // stb semantics; see Python docstring
        final_y.clear();
        final_y.push_back((int)r.read(ybits));
        final_y.push_back((int)r.read(ybits));
        try {
            for (int j = 0; j < partitions; j++) {
                int pclass = partition_class[j];
                int cdim = class_dims[pclass];
                int cbits = class_subclasses[pclass];
                int csub = (1 << cbits) - 1;
                int cval = 0;
                if (cbits)
                    cval = books[class_masterbooks[pclass]].decode_scalar(r);
                for (int d = 0; d < cdim; d++) {
                    int book = subclass_books[pclass][cval & csub];
                    cval >>= cbits;
                    if (book >= 0)
                        final_y.push_back(books[book].decode_scalar(r));
                    else
                        final_y.push_back(0);
                }
            }
        } catch (Eop&) {
            return false;
        }
        if (r.eop) return false;  // stb: valid_bits==INVALID_BITS -> unused
        size_t values = xlist.size();
        step2.assign(values, 0);
        step2[0] = step2[1] = 1;
        for (size_t j = 2; j < values; j++) {
            auto [low, high] = neigh[j];
            int pred = predict_point(xlist[j], xlist[low], xlist[high],
                                     final_y[low], final_y[high]);
            int val = final_y[j];
            int highroom = rng - pred;
            int lowroom = pred;
            int room = 2 * std::min(highroom, lowroom);
            if (val) {
                step2[low] = step2[high] = step2[j] = 1;
                if (val >= room) {
                    if (highroom > lowroom)
                        final_y[j] = val - lowroom + pred;
                    else
                        final_y[j] = pred - val + highroom - 1;
                } else if (val & 1) {
                    final_y[j] = pred - ((val + 1) >> 1);
                } else {
                    final_y[j] = pred + (val >> 1);
                }
            } else {
                step2[j] = 0;
                final_y[j] = pred;
            }
        }
        return true;
    }

    // multiply the rendered floor curve into target[:n2] (spec 7.2.4)
    void render(const std::vector<int>& final_y,
                const std::vector<uint8_t>& step2, int n2,
                float* target) const {
        const float* tbl = inverse_db_table();
        int mult = multiplier;
        int lx = 0, ly = final_y[0] * mult;
        for (size_t q = 1; q < xlist.size(); q++) {
            int j = sorted_order[q];
            // stb's deferred-floor render keys on finalY[j] >= 0: drops
            // non-step2 posts AND negative-amplitude posts — mirror exactly
            if (!step2[j] || final_y[j] < 0) continue;
            int hy = final_y[j] * mult;
            int hx = xlist[j];
            if (lx != hx) draw_line(target, lx, ly, hx, hy, n2);
            lx = hx;
            ly = hy;
        }
        if (lx < n2) {
            float f = tbl[ly & 255];
            for (int i = lx; i < n2; i++) target[i] *= f;
        }
    }
};

// ---------------------------------------------------------------------------
// Residue

struct Residue {
    int rtype = 0;
    long long begin = 0, end = 0;
    int part_size = 1, classifications = 1, classbook = 0;
    std::vector<std::array<int, 8>> books;
    std::vector<std::vector<int>> classdata;  // per classbook entry

    void parse(BitReader& r, int rt, const std::vector<Codebook>& cbs) {
        rtype = rt;
        begin = r.read(24);
        end = r.read(24);
        if (end < begin) throw VorbisErr{};
        part_size = (int)r.read(24) + 1;
        classifications = (int)r.read(6) + 1;
        classbook = (int)r.read(8);
        if (classbook >= (int)cbs.size()) throw VorbisErr{};
        if (cbs[classbook].dims <= 0) throw VorbisErr{};  // unused book as classbook
        std::vector<int> cascade(classifications);
        for (int j = 0; j < classifications; j++) {
            int low = (int)r.read(3);
            int high = r.read1() ? (int)r.read(5) : 0;
            cascade[j] = high * 8 + low;
        }
        books.resize(classifications);
        for (int j = 0; j < classifications; j++) {
            for (int k = 0; k < 8; k++) {
                if (cascade[j] & (1 << k)) {
                    int b = (int)r.read(8);
                    if (b >= (int)cbs.size()) throw VorbisErr{};
                    if (cbs[b].dims <= 0) throw VorbisErr{};
                    books[j][k] = b;
                } else {
                    books[j][k] = -1;
                }
            }
        }
        // per-classword-entry class sequences (stb: classdata)
        const Codebook& cb = cbs[classbook];
        classdata.resize((size_t)cb.entries);
        for (int e = 0; e < cb.entries; e++) {
            long long temp = e;
            std::vector<int> seq((size_t)cb.dims);
            for (int k = cb.dims - 1; k >= 0; k--) {
                seq[(size_t)k] = (int)(temp % classifications);
                temp /= classifications;
            }
            classdata[(size_t)e] = std::move(seq);
        }
    }

    void decode_partition(BitReader& r, const Codebook& book, float* target,
                          long long offset, int n, int rt) const {
        if (book.lookup_type == 0) throw VorbisErr{};  // scalar book in VQ
        int dims = book.dims;
        if (rt == 0) {
            // stb interleave quirk: len = n - offset - k with offset ABSOLUTE,
            // silently discarding values for partitions past the first while
            // still consuming symbols (see Python _decode_partition docstring)
            int step = n / dims;
            for (int k = 0; k < step; k++) {
                int z = book.decode_scalar(r);
                const float* vals = &book.vq[(size_t)z * dims];
                long long lim = std::min<long long>(dims, n - offset - k);
                if (lim > 0) {
                    if (book.sequence_p) {
                        float acc = 0.0f;  // np.cumsum in f32
                        for (long long i = 0; i < lim; i++) {
                            acc += vals[i];
                            target[offset + k + i * step] += acc;
                        }
                    } else {
                        for (long long i = 0; i < lim; i++)
                            target[offset + k + i * step] += vals[i];
                    }
                }
            }
        } else {
            long long k = 0, off = offset;
            while (k < n) {
                int z = book.decode_scalar(r);
                const float* vals = &book.vq[(size_t)z * dims];
                long long lim = std::min<long long>(dims, n - k);
                if (book.sequence_p) {
                    // stb codebook_decode: last = val + minimum each step
                    float acc = 0.0f;
                    for (long long i = 0; i < lim; i++) {
                        float v = vals[i] + acc;
                        target[off + i] += v;
                        acc = v + book.minimum;
                    }
                } else {
                    for (long long i = 0; i < lim; i++)
                        target[off + i] += vals[i];
                }
                k += dims;
                off += dims;
            }
        }
    }

    void decode_generic(BitReader& r, const std::vector<Codebook>& cbs,
                        std::vector<std::vector<float>>& bufs, int ch,
                        const std::vector<uint8_t>& dnd, long long lb,
                        long long part_read, int classwords,
                        const Codebook& cb) const {
        size_t csize = (size_t)(part_read / classwords + 1) * classwords;
        std::vector<std::vector<int>> classes(
            (size_t)ch, std::vector<int>(csize, 0));
        for (int p = 0; p < 8; p++) {
            long long pcount = 0;
            while (pcount < part_read) {
                if (p == 0) {
                    for (int j = 0; j < ch; j++) {
                        if (dnd[j]) continue;
                        int temp = cb.decode_scalar(r);
                        const auto& seq = classdata[(size_t)temp];
                        std::copy(seq.begin(), seq.end(),
                                  classes[(size_t)j].begin() + pcount);
                    }
                }
                for (int i = 0; i < classwords && pcount < part_read;
                     i++, pcount++) {
                    for (int j = 0; j < ch; j++) {
                        if (dnd[j]) continue;
                        int c = classes[(size_t)j][(size_t)pcount];
                        int b = books[(size_t)c][(size_t)p];
                        if (b >= 0)
                            decode_partition(r, cbs[(size_t)b],
                                             bufs[(size_t)j].data(),
                                             lb + pcount * part_size,
                                             part_size,
                                             rtype == 2 ? 1 : rtype);
                    }
                }
            }
        }
    }

    // residue-2 coded vector decoded into one flat interleaved buffer
    // (index = sample*ch + channel), deinterleaved afterwards; do-not-decode
    // channels consume values exactly like the oracle (zeroed later by
    // really_zero).  Eop deinterleaves the partial result, like Python's
    // try/finally around the partition loop.
    void decode_interleaved(BitReader& r, const std::vector<Codebook>& cbs,
                            std::vector<std::vector<float>>& bufs, int ch,
                            int n2, long long lb, long long part_read,
                            int classwords, const Codebook& cb) const {
        size_t csize = (size_t)(part_read / classwords + 1) * classwords;
        std::vector<int> classes(csize, 0);
        long long ps = part_size;
        long long limit = (long long)n2 * ch;
        std::vector<float> flat((size_t)limit, 0.0f);
        bool eop = false;
        // no try/catch here: a VorbisErr propagates and the caller
        // discards bufs, so no cleanup/deinterleave is needed
        for (int p = 0; p < 8 && !eop; p++) {
            long long pcount = 0;
            while (pcount < part_read && !eop) {
                long long fpos = lb + pcount * ps;
                if (p == 0) {
                    int temp;
                    try {
                        temp = cb.decode_scalar(r);
                    } catch (Eop&) {
                        eop = true;
                        break;
                    }
                    const auto& seq = classdata[(size_t)temp];
                    std::copy(seq.begin(), seq.end(),
                              classes.begin() + pcount);
                }
                for (int i = 0; i < classwords && pcount < part_read;
                     i++, pcount++) {
                    int b = books[(size_t)classes[(size_t)pcount]]
                                 [(size_t)p];
                    if (b >= 0) {
                        const Codebook& book = cbs[(size_t)b];
                        if (book.lookup_type == 0) throw VorbisErr{};
                        int dims = book.dims;
                        long long nsyms = (ps + dims - 1) / dims;
                        for (long long s = 0; s < nsyms; s++) {
                            if (fpos >= limit)
                                throw VorbisErr{};  // write past vector end
                            int z;
                            try {
                                z = book.decode_scalar(r);
                            } catch (Eop&) {
                                eop = true;
                                break;
                            }
                            const float* vals =
                                &book.vq[(size_t)z * dims];
                            long long wlen =
                                std::min<long long>(dims, limit - fpos);
                            if (book.sequence_p) {
                                float acc = 0.0f;  // cumsum per codeword
                                for (long long q = 0; q < wlen; q++) {
                                    acc += vals[q];
                                    flat[(size_t)(fpos + q)] += acc;
                                }
                            } else {
                                for (long long q = 0; q < wlen; q++)
                                    flat[(size_t)(fpos + q)] += vals[q];
                            }
                            fpos += (fpos + dims <= limit)
                                        ? dims
                                        : (limit - fpos);
                        }
                        if (eop) break;
                    } else {
                        fpos = lb + pcount * ps + ps;
                    }
                }
            }
        }
        for (int j = 0; j < ch; j++) {
            float* bj = bufs[(size_t)j].data();
            for (int i = 0; i < n2; i++) bj[i] = flat[(size_t)i * ch + j];
        }
    }

    // decode this residue for ch channel slots -> ch f32[n2] buffers
    void decode(BitReader& r, const std::vector<Codebook>& cbs, int ch,
                int n2, const std::vector<uint8_t>& dnd,
                std::vector<std::vector<float>>& out) const {
        const Codebook& cb = cbs[(size_t)classbook];
        int classwords = cb.dims;
        long long actual = rtype == 2 ? (long long)n2 * 2 : n2;
        long long buf_len = (rtype == 2 && ch == 1) ? actual : n2;
        out.assign((size_t)ch, std::vector<float>((size_t)buf_len, 0.0f));
        long long lb = std::min(begin, actual);
        long long le = std::min(end, actual);
        long long part_read = (le - lb) / part_size;
        if (part_read > 0) {
            try {
                if (rtype == 2 && ch > 1) {
                    bool all_dnd = true;
                    for (int j = 0; j < ch; j++)
                        if (!dnd[j]) all_dnd = false;
                    if (!all_dnd)
                        decode_interleaved(r, cbs, out, ch, n2, lb, part_read,
                                           classwords, cb);
                } else {
                    decode_generic(r, cbs, out, ch, dnd, lb, part_read,
                                   classwords, cb);
                }
            } catch (Eop&) {
                // spec 8.6.2: stop, keep the partial decode
            }
        }
        for (auto& b : out) b.resize((size_t)n2);  // drop r2-mono scratch tail
    }
};

// ---------------------------------------------------------------------------
// Mapping / Mode

struct Mapping {
    int submaps = 1;
    std::vector<std::pair<int, int>> coupling;
    std::vector<int> mux, submap_floor, submap_residue;

    void parse(BitReader& r, int channels, int n_floors, int n_residues) {
        if (r.read(16) != 0) throw VorbisErr{};  // nonzero mapping type
        submaps = r.read1() ? (int)r.read(4) + 1 : 1;
        if (r.read1()) {
            int steps = (int)r.read(8) + 1;
            if (steps > channels) throw VorbisErr{};
            int bits = ilog(channels - 1);
            for (int s = 0; s < steps; s++) {
                int mag = (int)r.read(bits);
                int ang = (int)r.read(bits);
                if (mag >= channels || ang >= channels || mag == ang)
                    throw VorbisErr{};
                coupling.push_back({mag, ang});
            }
        }
        if (r.read(2)) throw VorbisErr{};  // nonzero reserved bits
        if (submaps > 1) {
            mux.resize((size_t)channels);
            for (int c = 0; c < channels; c++) {
                mux[(size_t)c] = (int)r.read(4);
                if (mux[(size_t)c] >= submaps) throw VorbisErr{};
            }
        } else {
            mux.assign((size_t)channels, 0);
        }
        for (int s = 0; s < submaps; s++) {
            r.read(8);  // discarded time config
            int fl = (int)r.read(8);
            int rs = (int)r.read(8);
            if (fl >= n_floors || rs >= n_residues) throw VorbisErr{};
            submap_floor.push_back(fl);
            submap_residue.push_back(rs);
        }
    }
};

struct Mode {
    int blockflag = 0, mapping = 0;
    void parse(BitReader& r, int n_mappings) {
        blockflag = r.read1();
        if (r.read(16) != 0 || r.read(16) != 0) throw VorbisErr{};
        mapping = (int)r.read(8);
        if (mapping >= n_mappings) throw VorbisErr{};
    }
};

// ---------------------------------------------------------------------------
// IMDCT (spec 4.3.5) — f64 DCT-IV via complex FFT, matching the Python
// path's factorization; differences vs pocketfft are ~1e-15 relative.

struct FftPlan {
    int n = 0;  // FFT size (power of two)
    std::vector<int> rev;
    std::vector<double> wre, wim;  // per-stage twiddles, packed

    explicit FftPlan(int size) : n(size) {
        rev.resize((size_t)n);
        int lg = 0;
        while ((1 << lg) < n) lg++;
        for (int i = 0; i < n; i++) {
            int r = 0;
            for (int b = 0; b < lg; b++)
                if (i & (1 << b)) r |= 1 << (lg - 1 - b);
            rev[(size_t)i] = r;
        }
        wre.resize((size_t)n / 2);
        wim.resize((size_t)n / 2);
        for (int i = 0; i < n / 2; i++) {
            double a = -2.0 * M_PI * i / n;  // forward FFT (e^{-i2πk/N})
            wre[(size_t)i] = std::cos(a);
            wim[(size_t)i] = std::sin(a);
        }
    }

    void run(std::vector<double>& re, std::vector<double>& im) const {
        for (int i = 0; i < n; i++) {
            int j = rev[(size_t)i];
            if (j > i) {
                std::swap(re[(size_t)i], re[(size_t)j]);
                std::swap(im[(size_t)i], im[(size_t)j]);
            }
        }
        for (int len = 2; len <= n; len <<= 1) {
            int half = len >> 1;
            int tstep = n / len;
            for (int base = 0; base < n; base += len) {
                for (int k = 0; k < half; k++) {
                    double tw_r = wre[(size_t)(k * tstep)];
                    double tw_i = wim[(size_t)(k * tstep)];
                    size_t a = (size_t)(base + k), b = a + (size_t)half;
                    double xr = re[b] * tw_r - im[b] * tw_i;
                    double xi = re[b] * tw_i + im[b] * tw_r;
                    re[b] = re[a] - xr;
                    im[b] = im[a] - xi;
                    re[a] += xr;
                    im[a] += xi;
                }
            }
        }
    }
};

struct ImdctPlan {
    int m;  // spectral length (n/2)
    FftPlan fft;  // size 2m
    std::vector<double> pre_re, pre_im;   // e^{-iπk/(2m)}, k<m
    std::vector<double> post_re, post_im; // e^{-iπ(2i+1)/(4m)}, i<m

    explicit ImdctPlan(int m_) : m(m_), fft(2 * m_) {
        pre_re.resize((size_t)m);
        pre_im.resize((size_t)m);
        post_re.resize((size_t)m);
        post_im.resize((size_t)m);
        for (int k = 0; k < m; k++) {
            double a = -M_PI * k / (2.0 * m);
            pre_re[(size_t)k] = std::cos(a);
            pre_im[(size_t)k] = std::sin(a);
            double b = -M_PI * (2.0 * k + 1.0) / (4.0 * m);
            post_re[(size_t)k] = std::cos(b);
            post_im[(size_t)k] = std::sin(b);
        }
    }

    // spec f32[m] -> time f32[2m] (computed in f64, cast at the end)
    void run(const float* spec, float* out) const {
        int n2x = 2 * m;
        std::vector<double> re((size_t)n2x, 0.0), im((size_t)n2x, 0.0);
        for (int k = 0; k < m; k++) {
            double x = (double)spec[k];
            re[(size_t)k] = x * pre_re[(size_t)k];
            im[(size_t)k] = x * pre_im[(size_t)k];
        }
        fft.run(re, im);
        // c[i] = Re(ft[i] * e^{-iπ(2i+1)/(4m)})
        std::vector<double> c((size_t)m);
        for (int i = 0; i < m; i++)
            c[(size_t)i] = re[(size_t)i] * post_re[(size_t)i] -
                           im[(size_t)i] * post_im[(size_t)i];
        int h = m / 2;
        for (int i = 0; i < h; i++) out[i] = (float)c[(size_t)(h + i)];
        for (int i = 0; i < m; i++)
            out[h + i] = (float)(-c[(size_t)(m - 1 - i)]);
        for (int i = 0; i < h; i++) out[h + m + i] = (float)(-c[(size_t)i]);
    }
};

// ---------------------------------------------------------------------------
// Stream state machine (mirrors _VorbisStream)

struct Stream {
    int headers_seen = 0;
    int channels = 0;
    uint32_t rate = 0;
    int blocksizes[2] = {0, 0};
    std::vector<Codebook> codebooks;
    std::vector<Floor1> floors;
    std::vector<Residue> residues;
    std::vector<Mapping> mappings;
    std::vector<Mode> modes;
    // decode state
    std::vector<std::vector<float>> previous;
    long long previous_length = 0;
    bool first_decode = true;
    uint32_t current_loc = 0;
    bool current_loc_valid = false;
    long long discard_deferred = 0;
    std::map<long long, std::vector<float>> windows;
    std::map<int, ImdctPlan> imdct_plans;
    // scratch reused across packets
    std::vector<std::vector<int>> floor_y;
    std::vector<std::vector<uint8_t>> floor_step2;

    void parse_header(const uint8_t* pkt, size_t n) {
        if (n < 7 || std::memcmp(pkt + 1, "vorbis", 6) != 0)
            throw VorbisErr{};
        int kind = pkt[0];
        static const int expect_seq[3] = {1, 3, 5};
        if (kind != expect_seq[headers_seen]) throw VorbisErr{};
        BitReader r(pkt + 7, n - 7);
        try {
            if (kind == 1) {
                if (r.read(32) != 0) throw VorbisErr{};  // version != 0
                channels = (int)r.read(8);
                rate = r.read(32);
                if (!channels || !rate) throw VorbisErr{};
                r.read(32);
                r.read(32);
                r.read(32);  // bitrate hints
                int b0 = 1 << r.read(4);
                int b1 = 1 << r.read(4);
                if (!(64 <= b0 && b0 <= 8192 && 64 <= b1 && b1 <= 8192 &&
                      b0 <= b1))
                    throw VorbisErr{};
                if (!r.read1()) throw VorbisErr{};  // missing framing bit
                blocksizes[0] = b0;
                blocksizes[1] = b1;
            } else if (kind == 3) {
                // comments: ignored
            } else {
                parse_setup(r);
            }
        } catch (Eop&) {
            throw VorbisErr{};  // truncated header packet
        }
        headers_seen++;
    }

    void parse_setup(BitReader& r) {
        int n_books = (int)r.read(8) + 1;
        for (int i = 0; i < n_books; i++) {
            codebooks.emplace_back();
            codebooks.back().parse(r);
        }
        int n_times = (int)r.read(6) + 1;
        for (int i = 0; i < n_times; i++)
            if (r.read(16) != 0) throw VorbisErr{};
        int n_floors = (int)r.read(6) + 1;
        for (int i = 0; i < n_floors; i++) {
            int ftype = (int)r.read(16);
            if (ftype > 1) throw VorbisErr{};
            if (ftype == 0) {
                // parse past the header, then refuse like stb (:382)
                r.read(8);
                r.read(16);
                r.read(16);
                r.read(6);
                r.read(8);
                int nb = (int)r.read(4) + 1;
                for (int j = 0; j < nb; j++) r.read(8);
                throw VorbisErr{};  // floor 0 not supported (matches stb)
            }
            floors.emplace_back();
            floors.back().parse(r, (int)codebooks.size());
        }
        int n_res = (int)r.read(6) + 1;
        for (int i = 0; i < n_res; i++) {
            int rt = (int)r.read(16);
            if (rt > 2) throw VorbisErr{};
            residues.emplace_back();
            residues.back().parse(r, rt, codebooks);
        }
        int n_maps = (int)r.read(6) + 1;
        for (int i = 0; i < n_maps; i++) {
            mappings.emplace_back();
            mappings.back().parse(r, channels, (int)floors.size(),
                                  (int)residues.size());
        }
        int n_modes = (int)r.read(6) + 1;
        for (int i = 0; i < n_modes; i++) {
            modes.emplace_back();
            modes.back().parse(r, (int)mappings.size());
        }
        if (r.eop) throw VorbisErr{};  // EOP in setup header
        if (!r.read1()) throw VorbisErr{};  // missing setup framing bit
    }

    const std::vector<float>& get_window(long long length) {
        auto it = windows.find(length);
        if (it != windows.end()) return it->second;
        std::vector<float> w((size_t)length);
        for (long long i = 0; i < length; i++) {
            double s = std::sin(((double)i + 0.5) / (double)length * 0.5 * M_PI);
            w[(size_t)i] = (float)std::sin(0.5 * M_PI * (s * s));
        }
        return windows.emplace(length, std::move(w)).first->second;
    }

    const ImdctPlan& get_imdct(int m) {
        auto it = imdct_plans.find(m);
        if (it != imdct_plans.end()) return it->second;
        return imdct_plans.emplace(m, ImdctPlan(m)).first->second;
    }

    // -> false for a non-audio / undecodable-mode packet (Python: None)
    bool decode_audio_packet(const uint8_t* pkt, size_t n,
                             std::vector<std::vector<float>>& blocks, int& N,
                             int& left_start, int& left_end, int& right_start,
                             int& right_end) {
        BitReader r(pkt, n);
        int mode_idx;
        try {
            if (r.read1() != 0) return false;  // non-audio packet
            mode_idx = (int)r.read(ilog((long long)modes.size() - 1));
        } catch (Eop&) {
            return false;
        }
        if (r.eop || mode_idx >= (int)modes.size()) return false;
        const Mode& mode = modes[(size_t)mode_idx];
        int prev_flag = 0, next_flag = 0;
        if (mode.blockflag) {
            prev_flag = (int)r.read(1);
            next_flag = (int)r.read(1);
        }
        int b0 = blocksizes[0], b1 = blocksizes[1];
        N = mode.blockflag ? b1 : b0;
        int wc = N >> 1;
        if (mode.blockflag && !prev_flag) {
            left_start = (N - b0) >> 2;
            left_end = (N + b0) >> 2;
        } else {
            left_start = 0;
            left_end = wc;
        }
        if (mode.blockflag && !next_flag) {
            right_start = (N * 3 - b0) >> 2;
            right_end = (N * 3 + b0) >> 2;
        } else {
            right_start = wc;
            right_end = N;
        }
        int n2 = N >> 1;
        const Mapping& mapping = mappings[(size_t)mode.mapping];
        int ch = channels;

        // floors
        floor_y.resize((size_t)ch);
        floor_step2.resize((size_t)ch);
        std::vector<uint8_t> zero_channel((size_t)ch, 0);
        for (int i = 0; i < ch; i++) {
            const Floor1& fl =
                floors[(size_t)mapping.submap_floor[(size_t)mapping
                                                        .mux[(size_t)i]]];
            if (!fl.decode(r, codebooks, floor_y[(size_t)i],
                           floor_step2[(size_t)i]))
                zero_channel[(size_t)i] = 1;
        }
        std::vector<uint8_t> really_zero(zero_channel);
        for (auto [mag, ang] : mapping.coupling)
            if (!zero_channel[(size_t)mag] || !zero_channel[(size_t)ang])
                zero_channel[(size_t)mag] = zero_channel[(size_t)ang] = 0;

        // residues, per submap
        std::vector<std::vector<float>> residue_out((size_t)ch);
        for (int s = 0; s < mapping.submaps; s++) {
            std::vector<int> idxs;
            for (int j = 0; j < ch; j++)
                if (mapping.mux[(size_t)j] == s) idxs.push_back(j);
            std::vector<uint8_t> dnd;
            for (int j : idxs) dnd.push_back(zero_channel[(size_t)j]);
            const Residue& res =
                residues[(size_t)mapping.submap_residue[(size_t)s]];
            std::vector<std::vector<float>> bufs;
            res.decode(r, codebooks, (int)idxs.size(), n2, dnd, bufs);
            for (size_t k = 0; k < idxs.size(); k++)
                residue_out[(size_t)idxs[k]] = std::move(bufs[k]);
        }

        // inverse coupling (spec 4.3.5), f32 like the oracle
        for (auto it = mapping.coupling.rbegin();
             it != mapping.coupling.rend(); ++it) {
            float* m = residue_out[(size_t)it->first].data();
            float* a = residue_out[(size_t)it->second].data();
            for (int i = 0; i < n2; i++) {
                float M = m[i], A = a[i], nm, na;
                if (M > 0.0f) {
                    if (A > 0.0f) { nm = M; na = M - A; }
                    else          { nm = M + A; na = M; }
                } else {
                    if (A > 0.0f) { nm = M; na = M + A; }
                    else          { nm = M - A; na = M; }
                }
                m[i] = nm;
                a[i] = na;
            }
        }

        // floor curve multiply + IMDCT
        const ImdctPlan& plan = get_imdct(n2);
        blocks.assign((size_t)ch, std::vector<float>());
        for (int i = 0; i < ch; i++) {
            blocks[(size_t)i].assign((size_t)N, 0.0f);
            if (really_zero[(size_t)i]) continue;
            float* spec = residue_out[(size_t)i].data();
            const Floor1& fl =
                floors[(size_t)mapping.submap_floor[(size_t)mapping
                                                        .mux[(size_t)i]]];
            fl.render(floor_y[(size_t)i], floor_step2[(size_t)i], n2, spec);
            plan.run(spec, blocks[(size_t)i].data());
        }
        return true;
    }

    // overlap-add one frame (stb vorbis_finish_frame semantics);
    // emits blocks[ch][e0:e1] (e1<=e0 -> nothing to emit this frame)
    void finish_frame(std::vector<std::vector<float>>& blocks,
                      long long length, long long left, long long right,
                      long long& e0, long long& e1) {
        if (previous_length) {
            long long nprev = previous_length;
            const std::vector<float>& w = get_window(nprev);
            for (int i = 0; i < channels; i++) {
                if (left + nprev > (long long)blocks[(size_t)i].size())
                    throw VorbisErr{};  // numpy would broadcast-error here
                float* b = blocks[(size_t)i].data();
                const float* pv = previous[(size_t)i].data();
                for (long long k = 0; k < nprev; k++) {
                    float s = b[left + k] * w[(size_t)k];
                    float p = pv[k] * w[(size_t)(nprev - 1 - k)];
                    b[left + k] = s + p;
                }
            }
        }
        long long prev = previous_length;
        previous_length = std::max<long long>(0, length - right);
        previous.assign((size_t)channels, {});
        for (int i = 0; i < channels; i++)
            if (length > right)
                previous[(size_t)i].assign(
                    blocks[(size_t)i].begin() + right,
                    blocks[(size_t)i].begin() + length);
        if (!prev) {
            e0 = e1 = 0;
            return;
        }
        long long r2 = length < right ? length : right;
        e0 = left;
        e1 = r2;
    }
};

// ---------------------------------------------------------------------------
// top-level decode (mirrors decode_ogg_vorbis incl. granule/current_loc)

static int decode_stream(const uint8_t* data, size_t len,
                         std::vector<float>& out, uint32_t& rate_out,
                         uint32_t& channels_out) {
    if (len < 4 || std::memcmp(data, "OggS", 4) != 0) return 1;
    Stream st;
    OggReader rdr(data, len);
    bool done = false;
    long long n_frames = 0;
    OggPacket pkt;
    std::vector<std::vector<float>> blocks;
    while (!done && rdr.next(pkt)) {
        if (st.headers_seen < 3) {
            st.parse_header(pkt.bytes.data(), pkt.bytes.size());
            continue;
        }
        int N, ls, le_, rs, re;
        if (!st.decode_audio_packet(pkt.bytes.data(), pkt.bytes.size(),
                                    blocks, N, ls, le_, rs, re))
            continue;
        long long n2 = N >> 1;
        long long length = re;
        bool truncated = false;

        if (st.first_decode) {
            st.current_loc = (uint32_t)(0u - (uint32_t)n2);  // (-n2) & U32
            st.discard_deferred = N - re;
            st.current_loc_valid = true;
            st.first_decode = false;
        } else if (st.discard_deferred) {
            if (st.discard_deferred >= rs - ls) {
                st.discard_deferred -= (rs - ls);
                ls = rs;
            } else {
                ls += (int)st.discard_deferred;
                st.discard_deferred = 0;
            }
        }

        if (pkt.has_granule) {
            if (st.current_loc_valid && pkt.page_is_last) {
                uint32_t current_end = (uint32_t)pkt.granule;
                uint32_t expect =
                    st.current_loc + (uint32_t)((long long)re - ls);
                if (current_end < expect) {
                    long long lnew;
                    if (current_end < st.current_loc)
                        lnew = 0;
                    else
                        lnew = (long long)(current_end - st.current_loc);
                    lnew += ls;
                    if (lnew > re) lnew = re;
                    length = lnew;
                    st.current_loc =
                        st.current_loc + (uint32_t)(uint64_t)length;
                    truncated = true;
                }
            }
            if (!truncated) {
                st.current_loc =
                    (uint32_t)(pkt.granule - (uint64_t)(n2 - ls));
                st.current_loc_valid = true;
            }
        }
        if (st.current_loc_valid && !truncated)
            st.current_loc += (uint32_t)((long long)rs - ls);

        long long e0, e1;
        st.finish_frame(blocks, length, ls, rs, e0, e1);
        if (e1 > e0) {
            size_t base = out.size();
            size_t cnt = (size_t)(e1 - e0);
            out.resize(base + cnt * (size_t)st.channels);
            for (int c = 0; c < st.channels; c++) {
                const float* bc = blocks[(size_t)c].data();
                for (size_t k = 0; k < cnt; k++)
                    out[base + k * (size_t)st.channels + (size_t)c] =
                        bc[(size_t)e0 + k];
            }
        } else if (n_frames > 0) {
            // file-path oracle semantics: stb PULL mode ends the stream on a
            // zero-sample frame (see Python decode_ogg_vorbis)
            done = true;
        }
        n_frames++;
        if (truncated && pkt.page_is_last) done = true;
    }
    if (st.headers_seen < 3) return 1;  // incomplete vorbis headers
    rate_out = st.rate;
    channels_out = (uint32_t)st.channels;
    return 0;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI (same shape as the FLAC/MP3 entry points in this library)

extern "C" {

// 1 when `data` is an Ogg stream whose first packet is a Vorbis ID header
int wtpu_vorbis_probe(const uint8_t* data, uint64_t len) {
    if (len < 4 || std::memcmp(data, "OggS", 4) != 0) return 0;
    try {
        OggReader rdr(data, (size_t)std::min<uint64_t>(len, 65536));
        OggPacket pkt;
        if (!rdr.next(pkt)) return 0;
        return pkt.bytes.size() >= 7 && pkt.bytes[0] == 1 &&
               std::memcmp(pkt.bytes.data() + 1, "vorbis", 6) == 0;
    } catch (...) {
        return 0;
    }
}

// Decode an Ogg Vorbis stream.  On success (*pcm, *frames, *channels, *rate)
// describe interleaved f32 PCM owned by the library (free with
// wtpu_vorbis_free).  Returns 0 on success (possibly 0 frames), nonzero on
// malformed streams — exactly where the Python decoder raises.
int wtpu_vorbis_decode(const uint8_t* data, uint64_t len, float** pcm,
                       uint64_t* frames, uint32_t* channels, uint32_t* rate) {
    *pcm = nullptr;
    *frames = 0;
    *channels = 0;
    *rate = 0;
    try {
        std::vector<float> out;
        uint32_t r = 0, ch = 0;
        int rc = decode_stream(data, (size_t)len, out, r, ch);
        if (rc != 0) return rc;
        float* buf = (float*)std::malloc(std::max<size_t>(
            out.size() * sizeof(float), sizeof(float)));
        if (!buf) return 2;
        if (!out.empty())
            std::memcpy(buf, out.data(), out.size() * sizeof(float));
        *pcm = buf;
        *frames = ch ? out.size() / ch : 0;
        *channels = ch;
        *rate = r;
        return 0;
    } catch (...) {
        return 1;
    }
}

void wtpu_vorbis_free(float* pcm) { std::free(pcm); }

}  // extern "C"
