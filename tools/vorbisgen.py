"""Spec-valid Ogg Vorbis bitstream generator (the Vorbis analog of
tools/flacgen.py / tools/mp3gen.py).

Builds complete Vorbis I streams — codebooks (ordered/unordered/sparse,
lookup types 0/1/2), floor 1 configurations, residue types 0/1/2, channel
coupling, submap muxing, long/short block transitions, continued ogg
packets, and granule-trimmed final frames — so the decoder
(whisper_tpu/audio/vorbis.py) can be pinned case-by-case against the
reference's vendored stb_vorbis (tests/test_vorbis_golden.py).

The packet writers are structural mirrors of the decode loops: the encoder
walks the same partition/classword/cursor state machine and writes a random
(seeded) codeword wherever the decoder would read one.  The audio content
is therefore arbitrary, which is exactly what a decoder-parity corpus
needs — both decoders must agree on every sample regardless.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from whisper_tpu.audio.ogg import pack_pages                    # noqa: E402
from whisper_tpu.audio.vorbis import assign_codewords, ilog     # noqa: E402


class BitWriter:
    """LSB-first bit packer (Vorbis spec 2)."""

    def __init__(self):
        self.bits: list[int] = []

    def write(self, val: int, nbits: int) -> None:
        for i in range(nbits):
            self.bits.append((val >> i) & 1)

    def write_code(self, code: int, nbits: int) -> None:
        """Write a huffman codeword MSB-first (root bit enters the stream
        first)."""
        for i in range(nbits - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def to_bytes(self) -> bytes:
        arr = np.array(self.bits, dtype=np.uint8)
        return np.packbits(arr, bitorder="little").tobytes()


def float32_pack(x: float) -> int:
    """Inverse of vorbis float32_unpack for values with <=21 mantissa bits."""
    if x == 0:
        return 0
    sign = 0x80000000 if x < 0 else 0
    m, e = math.frexp(abs(x))             # m in [0.5, 1)
    mant = int(round(m * (1 << 21)))
    exp = e - 21 + 788
    assert 0 <= exp < 1024 and mant < (1 << 21), f"unpackable {x}"
    return sign | (exp << 21) | mant


class Book:
    """One codebook: header writer + symbol encoder."""

    def __init__(self, dims: int, lengths: list[int | None], *,
                 ordered: bool = False, sparse: bool = False,
                 lookup: int = 0, minimum: float = 0.0, delta: float = 1.0,
                 value_bits: int = 4, sequence_p: bool = False,
                 mults: list[int] | None = None):
        self.dims = dims
        self.entries = len(lengths)
        self.lengths = lengths
        self.ordered = ordered
        self.sparse = sparse
        self.lookup = lookup
        self.minimum = minimum
        self.delta = delta
        self.value_bits = value_bits
        self.sequence_p = sequence_p
        self.mults = mults or []
        self.codes = assign_codewords(lengths)
        self.present = [i for i, c in enumerate(self.codes) if c is not None]
        if ordered:
            ls = [l for l in lengths if l is not None]
            assert ls == sorted(ls) and None not in lengths, \
                "ordered books need monotonically nondecreasing lengths"

    def n_lookup_values(self) -> int:
        if self.lookup == 1:
            v = int(math.floor(math.exp(math.log(self.entries) / self.dims)))
            if (v + 1) ** self.dims <= self.entries:
                v += 1
            return v
        if self.lookup == 2:
            return self.entries * self.dims
        return 0

    def write_header(self, bw: BitWriter) -> None:
        bw.write(0x564342, 24)
        bw.write(self.dims, 16)
        bw.write(self.entries, 24)
        bw.write(1 if self.ordered else 0, 1)
        if self.ordered:
            cur = self.lengths[0]
            bw.write(cur - 1, 5)
            i = 0
            while i < self.entries:
                run = 0
                while i + run < self.entries and self.lengths[i + run] == cur:
                    run += 1
                bw.write(run, ilog(self.entries - i))
                i += run
                cur += 1
        else:
            bw.write(1 if self.sparse else 0, 1)
            for ln in self.lengths:
                if self.sparse:
                    bw.write(1 if ln is not None else 0, 1)
                    if ln is not None:
                        bw.write(ln - 1, 5)
                else:
                    assert ln is not None
                    bw.write(ln - 1, 5)
        bw.write(self.lookup, 4)
        if self.lookup:
            nvals = self.n_lookup_values()
            assert len(self.mults) == nvals, (len(self.mults), nvals)
            bw.write(float32_pack(self.minimum), 32)
            bw.write(float32_pack(self.delta), 32)
            bw.write(self.value_bits - 1, 4)
            bw.write(1 if self.sequence_p else 0, 1)
            for q in self.mults:
                assert 0 <= q < (1 << self.value_bits)
                bw.write(q, self.value_bits)

    def encode(self, bw: BitWriter, entry: int) -> None:
        code = self.codes[entry]
        assert code is not None, f"entry {entry} has no codeword"
        bw.write_code(code[0], code[1])

    def random_entry(self, rng) -> int:
        return self.present[rng.randint(len(self.present))]


def full_book(nbits: int, dims: int = 1, **kw) -> Book:
    """Complete binary tree: 2^nbits entries, all codewords nbits long."""
    return Book(dims, [nbits] * (1 << nbits), **kw)


class Floor:
    def __init__(self, partition_classes: list[int],
                 class_dims: list[int], class_subclasses: list[int],
                 class_masterbooks: list[int], subclass_books: list[list[int]],
                 multiplier: int, rangebits: int, xs: list[int]):
        self.partition_classes = partition_classes
        self.class_dims = class_dims
        self.class_subclasses = class_subclasses
        self.class_masterbooks = class_masterbooks
        self.subclass_books = subclass_books   # book indices, -1 = unused
        self.multiplier = multiplier
        self.rangebits = rangebits
        self.xs = xs                           # the free X values, in order
        need = sum(class_dims[c] for c in partition_classes)
        assert len(xs) == need, (len(xs), need)
        assert len(class_dims) == max(partition_classes) + 1, \
            "decoder parses exactly max(partition_class)+1 class configs"
        allx = [0, 1 << rangebits] + xs
        assert len(set(allx)) == len(allx), "duplicate floor X"

    def write_header(self, bw: BitWriter) -> None:
        bw.write(len(self.partition_classes), 5)
        for c in self.partition_classes:
            bw.write(c, 4)
        for j in range(len(self.class_dims)):
            bw.write(self.class_dims[j] - 1, 3)
            bw.write(self.class_subclasses[j], 2)
            if self.class_subclasses[j]:
                bw.write(self.class_masterbooks[j], 8)
            for b in self.subclass_books[j]:
                bw.write(b + 1, 8)
        bw.write(self.multiplier - 1, 2)
        bw.write(self.rangebits, 4)
        for x in self.xs:
            bw.write(x, self.rangebits)

    def encode_channel(self, bw: BitWriter, books: list[Book], rng,
                       used: bool) -> None:
        bw.write(1 if used else 0, 1)
        if not used:
            return
        rng_range = (256, 128, 86, 64)[self.multiplier - 1]
        ybits = ilog(rng_range) - 1            # stb semantics
        bw.write(rng.randint(1 << ybits), ybits)
        bw.write(rng.randint(1 << ybits), ybits)
        for c in self.partition_classes:
            cdim = self.class_dims[c]
            cbits = self.class_subclasses[c]
            subs = [rng.randint(1 << cbits) for _ in range(cdim)]
            if cbits:
                cval = 0
                for k, s in enumerate(subs):
                    cval |= s << (k * cbits)
                books[self.class_masterbooks[c]].encode(bw, cval)
            for k in range(cdim):
                b = self.subclass_books[c][subs[k] if cbits else 0]
                if b >= 0:
                    books[b].encode(bw, books[b].random_entry(rng))


class Residue:
    def __init__(self, rtype: int, begin: int, end: int, part_size: int,
                 classifications: int, classbook: int,
                 books: list[list[int]]):
        self.rtype = rtype
        self.begin = begin
        self.end = end
        self.part_size = part_size
        self.classifications = classifications
        self.classbook = classbook
        self.books = books          # [classifications][8], -1 = no book

    def write_header(self, bw: BitWriter) -> None:
        bw.write(self.rtype, 16)
        bw.write(self.begin, 24)
        bw.write(self.end, 24)
        bw.write(self.part_size - 1, 24)
        bw.write(self.classifications - 1, 6)
        bw.write(self.classbook, 8)
        for row in self.books:
            cascade = sum(1 << k for k in range(8) if row[k] >= 0)
            bw.write(cascade & 7, 3)
            if cascade >> 3:
                bw.write(1, 1)
                bw.write(cascade >> 3, 5)
            else:
                bw.write(0, 1)
        for row in self.books:
            for k in range(8):
                if row[k] >= 0:
                    bw.write(row[k], 8)

    # -- packet-side encoders (mirror the decoder's state machines) --------

    def _encode_vq_run(self, bw, books, rng, book_idx: int, nsyms: int):
        book = books[book_idx]
        for _ in range(nsyms):
            book.encode(bw, book.random_entry(rng))

    def encode(self, bw: BitWriter, books: list[Book], rng, ch: int,
               n2: int, dnd: list[bool]) -> None:
        cb = books[self.classbook]
        classwords = cb.dims
        actual = n2 * 2 if self.rtype == 2 else n2
        lb = min(self.begin, actual)
        le = min(self.end, actual)
        part_read = (le - lb) // self.part_size
        if part_read <= 0:
            return
        interleaved = self.rtype == 2 and ch > 1
        if interleaved and all(dnd):
            return

        def classword_value(cls_seq):
            v = 0
            for c in cls_seq:
                v = v * self.classifications + c
            return v

        ngroups = -(-part_read // classwords)
        if interleaved:
            classes = [rng.randint(self.classifications)
                       for _ in range(ngroups * classwords)]
            ps = self.part_size
            for p in range(8):
                pcount = 0
                c_inter = p_inter = 0
                while pcount < part_read:
                    z = lb + pcount * ps
                    c_inter, p_inter = z % ch, z // ch
                    if p == 0:
                        g = pcount  # group start == pcount (groups are
                        #             consecutive classword-sized chunks)
                        cb.encode(bw, classword_value(
                            classes[g:g + classwords]))
                    i = 0
                    while i < classwords and pcount < part_read:
                        b = self.books[classes[pcount]][p]
                        if b >= 0:
                            book = books[b]
                            total = ps
                            while total > 0:
                                book.encode(bw, book.random_entry(rng))
                                eff = min(book.dims,
                                          n2 * ch - (p_inter * ch + c_inter))
                                adv = c_inter + eff
                                p_inter += adv // ch
                                c_inter = adv % ch
                                total -= eff
                        else:
                            z2 = lb + pcount * ps + ps
                            c_inter, p_inter = z2 % ch, z2 // ch
                        i += 1
                        pcount += 1
        else:
            classes = [[rng.randint(self.classifications)
                        for _ in range(ngroups * classwords)]
                       for _ in range(ch)]
            for p in range(8):
                pcount = 0
                while pcount < part_read:
                    if p == 0:
                        for j in range(ch):
                            if not dnd[j]:
                                g = pcount
                                cb.encode(bw, classword_value(
                                    classes[j][g:g + classwords]))
                    i = 0
                    while i < classwords and pcount < part_read:
                        for j in range(ch):
                            if dnd[j]:
                                continue
                            b = self.books[classes[j][pcount]][p]
                            if b >= 0:
                                book = books[b]
                                if self.rtype == 0:
                                    nsyms = self.part_size // book.dims
                                else:
                                    nsyms = -(-self.part_size // book.dims)
                                self._encode_vq_run(bw, books, rng, b, nsyms)
                        i += 1
                        pcount += 1


class Mapping:
    def __init__(self, submaps: int, coupling: list[tuple[int, int]],
                 mux: list[int], submap_floor: list[int],
                 submap_residue: list[int]):
        self.submaps = submaps
        self.coupling = coupling
        self.mux = mux
        self.submap_floor = submap_floor
        self.submap_residue = submap_residue

    def write_header(self, bw: BitWriter, channels: int) -> None:
        bw.write(0, 16)
        if self.submaps > 1:
            bw.write(1, 1)
            bw.write(self.submaps - 1, 4)
        else:
            bw.write(0, 1)
        if self.coupling:
            bw.write(1, 1)
            bw.write(len(self.coupling) - 1, 8)
            bits = ilog(channels - 1)
            for mag, ang in self.coupling:
                bw.write(mag, bits)
                bw.write(ang, bits)
        else:
            bw.write(0, 1)
        bw.write(0, 2)
        if self.submaps > 1:
            for m in self.mux:
                bw.write(m, 4)
        for s in range(self.submaps):
            bw.write(0, 8)
            bw.write(self.submap_floor[s], 8)
            bw.write(self.submap_residue[s], 8)


class Setup:
    """Everything needed to emit headers + audio packets for one stream."""

    def __init__(self, *, channels: int, rate: int, bs0: int, bs1: int,
                 books: list[Book], floors: list[Floor],
                 residues: list[Residue], mappings: list[Mapping],
                 modes: list[tuple[int, int]]):   # (blockflag, mapping)
        self.channels = channels
        self.rate = rate
        self.bs0 = bs0
        self.bs1 = bs1
        self.books = books
        self.floors = floors
        self.residues = residues
        self.mappings = mappings
        self.modes = modes

    # -- headers ------------------------------------------------------------

    def id_packet(self) -> bytes:
        bw = BitWriter()
        bw.write(0, 32)
        bw.write(self.channels, 8)
        bw.write(self.rate, 32)
        bw.write(0, 32), bw.write(0, 32), bw.write(0, 32)
        bw.write(int(math.log2(self.bs0)), 4)
        bw.write(int(math.log2(self.bs1)), 4)
        bw.write(1, 1)
        return b"\x01vorbis" + bw.to_bytes()

    def comment_packet(self) -> bytes:
        vendor = b"whisper_tpu vorbisgen"
        return (b"\x03vorbis"
                + len(vendor).to_bytes(4, "little") + vendor
                + (0).to_bytes(4, "little") + b"\x01")

    def setup_packet(self) -> bytes:
        bw = BitWriter()
        bw.write(len(self.books) - 1, 8)
        for b in self.books:
            b.write_header(bw)
        bw.write(0, 6)            # 1 time transform
        bw.write(0, 16)
        bw.write(len(self.floors) - 1, 6)
        for fl in self.floors:
            bw.write(1, 16)
            fl.write_header(bw)
        bw.write(len(self.residues) - 1, 6)
        for res in self.residues:
            res.write_header(bw)
        bw.write(len(self.mappings) - 1, 6)
        for m in self.mappings:
            m.write_header(bw, self.channels)
        bw.write(len(self.modes) - 1, 6)
        for blockflag, mapping in self.modes:
            bw.write(blockflag, 1)
            bw.write(0, 16)
            bw.write(0, 16)
            bw.write(mapping, 8)
        bw.write(1, 1)
        return b"\x05vorbis" + bw.to_bytes()

    # -- audio --------------------------------------------------------------

    def audio_packet(self, rng, mode_idx: int, prev_flag: int,
                     next_flag: int, unused_channels=()) -> bytes:
        bw = BitWriter()
        bw.write(0, 1)
        bw.write(mode_idx, ilog(len(self.modes) - 1))
        blockflag, mapping_idx = self.modes[mode_idx]
        if blockflag:
            bw.write(prev_flag, 1)
            bw.write(next_flag, 1)
        n = self.bs1 if blockflag else self.bs0
        n2 = n >> 1
        mp = self.mappings[mapping_idx]
        zero = [i in unused_channels for i in range(self.channels)]
        for i in range(self.channels):
            fl = self.floors[mp.submap_floor[mp.mux[i]]]
            fl.encode_channel(bw, self.books, rng, used=not zero[i])
        # coupling re-enable, then per-submap residue
        dnd_all = list(zero)
        for mag, ang in mp.coupling:
            if not zero[mag] or not zero[ang]:
                dnd_all[mag] = dnd_all[ang] = False
        for s in range(mp.submaps):
            idxs = [j for j in range(self.channels) if mp.mux[j] == s]
            dnd = [dnd_all[j] for j in idxs]
            self.residues[mp.submap_residue[s]].encode(
                bw, self.books, rng, len(idxs), n2, dnd)
        return bw.to_bytes()

    def geometry(self, blockflag: int, prev_flag: int, next_flag: int):
        n = self.bs1 if blockflag else self.bs0
        wc = n >> 1
        if blockflag and not prev_flag:
            left = ((n - self.bs0) >> 2, (n + self.bs0) >> 2)
        else:
            left = (0, wc)
        if blockflag and not next_flag:
            right = ((n * 3 - self.bs0) >> 2, (n * 3 + self.bs0) >> 2)
        else:
            right = (wc, n)
        return n, left, right


def make_stream(setup: Setup, block_flags: list[int], *, seed: int = 0,
                trim: int = 0, max_segs_per_page: int = 32,
                unused_plan: dict[int, tuple[int, ...]] | None = None) -> bytes:
    """Assemble a full ogg stream.

    block_flags: blockflag per audio packet (selects the first mode with
    that flag).  unused_plan: packet index -> tuple of floor-unused channel
    indices.  trim: subtract this many samples from the final granule to
    exercise last-frame truncation.
    """
    rng = np.random.RandomState(seed)
    unused_plan = unused_plan or {}
    mode_of_flag = {bf: i for i, (bf, _m) in reversed(list(enumerate(setup.modes)))}

    packets: list[tuple[bytes, int]] = [
        (setup.id_packet(), 0),
        (setup.comment_packet(), 0),
        (setup.setup_packet(), 0),
    ]

    loc = None
    deferred = 0
    u32 = (1 << 32) - 1
    for i, bf in enumerate(block_flags):
        prev_flag = block_flags[i - 1] if i > 0 else 1
        next_flag = block_flags[i + 1] if i + 1 < len(block_flags) else 1
        mode_idx = mode_of_flag[bf]
        pkt = setup.audio_packet(rng, mode_idx, prev_flag, next_flag,
                                 unused_channels=unused_plan.get(i, ()))
        n, (ls, _le), (rs, re_) = setup.geometry(bf, prev_flag, next_flag)
        if loc is None:
            loc = (-(n >> 1)) & u32
            deferred = n - re_
        elif deferred:
            if deferred >= rs - ls:
                deferred -= rs - ls
                ls = rs
            else:
                ls += deferred
                deferred = 0
        loc = (loc + (rs - ls)) & u32
        packets.append((pkt, loc))
    if trim:
        pkt, g = packets[-1]
        packets[-1] = (pkt, max(0, g - trim))
    return pack_pages(packets, max_segs_per_page=max_segs_per_page)


# ---------------------------------------------------------------------------
# Corpus: named cases covering the decode surface.

def _base_books():
    """Books 0-3 shared by most cases: floor master/value books + the
    residue classbook (indices stay stable so the case setups below can
    reference VQ books at 4/5)."""
    return [
        full_book(6),                                   # 0: floor masterbook
        Book(1, [1, 2, 3, 4, 5, 6, 7, 8, 8]),           # 1: skewed floor book
        Book(1, [None, 3, None, 3, 2, None, 2, 2],      # 2: sparse floor book
             sparse=True),
        Book(2, [4] * 9),                               # 3: residue classbook
        #        (classwords=2, supports <=3 classifications)
    ]


def _vq_book_type2(dims=4, nbits=3, delta=0.25, minimum=-1.0):
    n = 1 << nbits
    rng = np.random.RandomState(7)
    return Book(dims, [nbits] * n, lookup=2, minimum=minimum, delta=delta,
                value_bits=4, mults=list(rng.randint(0, 16, n * dims)))


def _vq_book_type1(dims=2, entries=16, delta=0.5, minimum=-2.0):
    rng = np.random.RandomState(11)
    v = int(math.floor(entries ** (1.0 / dims)))
    if (v + 1) ** dims <= entries:
        v += 1
    return Book(dims, [4] * entries, lookup=1, minimum=minimum, delta=delta,
                value_bits=5, mults=list(rng.randint(0, 32, v)))


def _simple_floor(masterbook=0, books=(1, 1, 1, 1), multiplier=1,
                  rangebits=7, xs=(32, 96, 64)):
    """One class, 3 dims, 2 subclass bits."""
    return Floor([0], [3], [2], [masterbook], [list(books)],
                 multiplier, rangebits, list(xs))


def case_mono_short(seed=1):
    books = _base_books() + [_vq_book_type2(dims=4)]
    fl = _simple_floor()
    res = Residue(2, 0, 128, 16, 2, 3,
                  [[4, -1, -1, -1, -1, -1, -1, -1],
                   [4, 4, -1, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [], [0], [0], [0])
    setup = Setup(channels=1, rate=16000, bs0=256, bs1=512,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0)])
    return make_stream(setup, [0] * 12, seed=seed)


def case_mono_long_short(seed=2):
    books = _base_books() + [_vq_book_type2(dims=4)]
    fl = _simple_floor(rangebits=8, xs=(40, 200, 120))
    res = Residue(2, 0, 256, 32, 2, 3,
                  [[4, -1, -1, -1, -1, -1, -1, -1],
                   [-1, 4, 4, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [], [0], [0], [0])
    setup = Setup(channels=1, rate=22050, bs0=256, bs1=512,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0), (1, 0)])
    # first block LONG with next short -> exercises the deferred start
    # discard; bs0/bs1 chosen so the discard (64) is smaller than the
    # first short frame (128) — a larger ratio swallows a whole frame,
    # which the reference's pull-mode stb treats as end-of-stream (that
    # terminal behavior is covered by test_discard_swallows_stream)
    flags = [1, 0, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 1]
    return make_stream(setup, flags, seed=seed)


def case_stereo_coupled(seed=3):
    books = _base_books() + [_vq_book_type2(dims=4), _vq_book_type1()]
    fl = _simple_floor(books=(1, 2, 1, -1))   # one transparent subclass slot
    res = Residue(2, 0, 384, 32, 3, 3,
                  [[4, -1, -1, -1, -1, -1, -1, -1],
                   [4, 5, -1, -1, -1, -1, -1, -1],
                   [-1, 4, -1, 5, -1, -1, -1, -1]])
    mp = Mapping(1, [(0, 1)], [0, 0], [0], [0])
    setup = Setup(channels=2, rate=44100, bs0=256, bs1=1024,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0), (1, 0)])
    flags = [0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 0]
    return make_stream(setup, flags, seed=seed)


def case_stereo_submaps(seed=4):
    """Two submaps (no coupling): residue 1 on ch0, residue 0 on ch1."""
    books = _base_books() + [_vq_book_type2(dims=4), _vq_book_type1(dims=2)]
    fl0 = _simple_floor()
    fl1 = _simple_floor(masterbook=0, books=(2, 1, -1, 2), rangebits=6,
                        xs=(20, 40, 10))
    res1 = Residue(1, 0, 128, 16, 2, 3,
                   [[4, -1, -1, -1, -1, -1, -1, -1],
                    [4, -1, 5, -1, -1, -1, -1, -1]])
    res0 = Residue(0, 0, 128, 8, 2, 3,
                   [[5, -1, -1, -1, -1, -1, -1, -1],
                    [-1, 5, -1, -1, -1, -1, -1, -1]])
    mp = Mapping(2, [], [0, 1], [0, 1], [0, 1])
    setup = Setup(channels=2, rate=32000, bs0=256, bs1=512,
                  books=books, floors=[fl0, fl1], residues=[res1, res0],
                  mappings=[mp], modes=[(0, 0)])
    return make_stream(setup, [0] * 10, seed=seed)


def case_unused_channels(seed=5):
    books = _base_books() + [_vq_book_type2(dims=4)]
    fl = _simple_floor()
    res = Residue(2, 0, 256, 32, 2, 3,
                  [[4, -1, -1, -1, -1, -1, -1, -1],
                   [4, 4, -1, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [(0, 1)], [0, 0], [0], [0])
    setup = Setup(channels=2, rate=24000, bs0=256, bs1=512,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0)])
    plan = {2: (0,), 3: (1,), 5: (0, 1), 7: (1,)}
    return make_stream(setup, [0] * 10, seed=seed, unused_plan=plan)


def case_begin_end(seed=6):
    """begin > 0, end < n2, partial tail partition ignored."""
    books = _base_books() + [_vq_book_type2(dims=4)]
    fl = _simple_floor()
    res = Residue(2, 24, 116, 20, 2, 3,
                  [[4, -1, -1, -1, -1, -1, -1, -1],
                   [4, 4, -1, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [], [0], [0], [0])
    setup = Setup(channels=1, rate=16000, bs0=256, bs1=512,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0)])
    return make_stream(setup, [0] * 8, seed=seed)


def _count_continued_pages(blob: bytes) -> int:
    """Walk the raw pages and count those with the continued-packet flag."""
    off, n = 0, 0
    while off + 27 <= len(blob) and blob[off:off + 4] == b"OggS":
        nsegs = blob[off + 26]
        lacing = blob[off + 27:off + 27 + nsegs]
        n += bool(blob[off + 5] & 0x01)
        off += 27 + nsegs + sum(lacing)
    return n


def case_spanning_pages(seed=7):
    """Tiny page budget: packets split across pages (continued packets).

    A dims=2 value book makes each audio packet several hundred bytes
    (>=2 lacing segments), and the 1-segment page budget forces every
    multi-segment packet to straddle a page boundary — asserted below so
    the case can't silently stop covering the continued-packet path."""
    books = _base_books() + [_vq_book_type2(dims=2, nbits=4)]
    fl = _simple_floor()
    res = Residue(2, 0, 512, 64, 2, 3,
                  [[4, 4, -1, -1, -1, -1, -1, -1],
                   [4, 4, 4, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [], [0], [0], [0])
    setup = Setup(channels=1, rate=48000, bs0=1024, bs1=2048,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0)])
    blob = make_stream(setup, [0] * 6, seed=seed, max_segs_per_page=1)
    assert _count_continued_pages(blob) >= 3, "case lost its continued pages"
    return blob


def case_trimmed_end(seed=8):
    books = _base_books() + [_vq_book_type2(dims=4)]
    fl = _simple_floor()
    res = Residue(2, 0, 128, 16, 2, 3,
                  [[4, -1, -1, -1, -1, -1, -1, -1],
                   [4, 4, -1, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [], [0], [0], [0])
    setup = Setup(channels=1, rate=16000, bs0=256, bs1=512,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0)])
    return make_stream(setup, [0] * 9, seed=seed, trim=57)


def case_multiplier3(seed=9):
    """Floor multiplier 3 (range 86): stb's ilog(range)-1 Y-bit quirk and
    the y&255 wrap in draw_line (big Y book pushes finalY past 255)."""
    big = Book(1, [9] * 512)
    books = _base_books() + [_vq_book_type2(dims=4), big]
    fl = Floor([0, 1], [3, 3], [2, 2], [0, 0],
               [[5, 5, 5, 5], [5, 5, 5, 5]],
               3, 7, [32, 96, 64, 16, 48, 112])
    res = Residue(2, 0, 128, 16, 2, 3,
                  [[4, -1, -1, -1, -1, -1, -1, -1],
                   [4, 4, -1, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [], [0], [0], [0])
    setup = Setup(channels=1, rate=16000, bs0=256, bs1=512,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0)])
    return make_stream(setup, [0] * 10, seed=seed)


def case_ordered_books(seed=10):
    """Ordered-codebook parse path + floor tail-fill (2^rangebits < n2)."""
    ordered = Book(1, [2, 3, 3, 4, 4, 5, 5, 5, 6, 6, 6, 6], ordered=True)
    books = [full_book(6), ordered, _vq_book_type2(dims=4)]
    fl = Floor([0], [3], [2], [0], [[1, 1, 1, 1]], 2, 6, [20, 40, 10])
    res = Residue(2, 0, 128, 16, 2, 0,
                  [[2, -1, -1, -1, -1, -1, -1, -1],
                   [2, 2, -1, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [], [0], [0], [0])
    setup = Setup(channels=1, rate=16000, bs0=256, bs1=512,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0)])
    return make_stream(setup, [0] * 8, seed=seed)


def case_discard_swallow(seed=12):
    """First block long-with-next-short where the start discard swallows the
    whole second frame: the reference's file path (pull-mode stb) treats the
    zero-sample frame as end-of-stream and yields NO samples at all."""
    books = _base_books() + [_vq_book_type2(dims=4)]
    fl = _simple_floor(rangebits=8, xs=(40, 200, 120))
    res = Residue(2, 0, 256, 32, 2, 3,
                  [[4, -1, -1, -1, -1, -1, -1, -1],
                   [-1, 4, 4, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [], [0], [0], [0])
    setup = Setup(channels=1, rate=22050, bs0=128, bs1=512,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0), (1, 0)])
    return make_stream(setup, [1, 0, 0, 1, 0, 1], seed=seed)


def case_long_stream(seed=11):
    """Multi-page stereo long/short stream with every feature mixed."""
    books = _base_books() + [_vq_book_type2(dims=4), _vq_book_type1()]
    fl = _simple_floor(rangebits=9, xs=(64, 320, 180))
    res = Residue(2, 0, 1024, 64, 3, 3,
                  [[4, -1, -1, -1, -1, -1, -1, -1],
                   [4, 5, -1, -1, -1, -1, -1, -1],
                   [5, -1, 4, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [(0, 1)], [0, 0], [0], [0])
    setup = Setup(channels=2, rate=44100, bs0=256, bs1=2048,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0), (1, 0)])
    rng = np.random.RandomState(seed + 100)
    flags = list(int(x) for x in rng.randint(0, 2, 40))
    plan = {7: (0,), 21: (0, 1)}
    return make_stream(setup, flags, seed=seed, unused_plan=plan,
                       max_segs_per_page=6, trim=13)


def case_deep_codes(seed=13):
    """Comb-shaped huffman tree with codewords up to 20 bits: exercises the
    decoder's slow path past the 12-bit acceleration table."""
    comb = Book(1, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
                    17, 18, 19, 20, 20])
    books = [full_book(6), comb, _vq_book_type2(dims=4),
             Book(2, [4] * 9)]
    fl = Floor([0], [3], [2], [0], [[1, 1, 1, 1]], 1, 7, [32, 96, 64])
    res = Residue(2, 0, 128, 16, 2, 3,
                  [[2, -1, -1, -1, -1, -1, -1, -1],
                   [2, 2, -1, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [], [0], [0], [0])
    setup = Setup(channels=1, rate=16000, bs0=256, bs1=512,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0)])
    return make_stream(setup, [0] * 10, seed=seed)


def case_big_blocks(seed=14):
    """Maximum legal block sizes (2048/8192): big IMDCTs and window slopes."""
    books = _base_books() + [_vq_book_type2(dims=8, nbits=4)]
    fl = _simple_floor(rangebits=12, xs=(512, 2560, 1500))
    res = Residue(2, 0, 4096, 128, 2, 3,
                  [[4, -1, -1, -1, -1, -1, -1, -1],
                   [4, 4, -1, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [], [0], [0], [0])
    setup = Setup(channels=1, rate=48000, bs0=2048, bs1=8192,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0), (1, 0)])
    return make_stream(setup, [0, 1, 1, 0, 1, 0, 0, 1], seed=seed)


def case_many_floor_partitions(seed=15):
    """Wide floor: 8 partitions over 4 classes, 30 posts, 3 subclass bits."""
    rng = np.random.RandomState(77)
    part_classes = [0, 1, 2, 3, 1, 0, 3, 2]
    class_dims = [3, 4, 2, 5]
    class_subclasses = [2, 3, 0, 1]
    masterbooks = [0, 4, -1, 0]   # book 4: 12-bit master (4 dims x 3 subbits)
    subclass_books = [[1, 1, 1, 1], [1, 1, 1, 1, 1, 1, 1, 1], [1], [1, 1]]
    need = sum(class_dims[c] for c in part_classes)
    xs = list(rng.choice(np.arange(1, 255), size=need, replace=False))
    xs = [int(x) for x in xs]
    fl = Floor(part_classes, class_dims, class_subclasses, masterbooks,
               subclass_books, 2, 8, xs)
    books = [full_book(6), Book(1, [1, 2, 3, 4, 5, 6, 7, 8, 8]),
             Book(1, [None, 3, None, 3, 2, None, 2, 2], sparse=True),
             Book(2, [4] * 9), full_book(12),
             _vq_book_type2(dims=4)]
    res = Residue(2, 0, 128, 16, 2, 3,
                  [[5, -1, -1, -1, -1, -1, -1, -1],
                   [5, 5, -1, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [], [0], [0], [0])
    setup = Setup(channels=1, rate=16000, bs0=512, bs1=1024,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0)])
    return make_stream(setup, [0] * 8, seed=seed)


def case_lookup1_odd(seed=16):
    """Type-1 VQ book whose entry count is not a perfect power of its
    dimensions (entries=20, dims=3 -> lookup1_values=2)."""
    rng = np.random.RandomState(5)
    odd = Book(3, [5] * 20, lookup=1, minimum=-0.5, delta=0.125,
               value_bits=4, mults=list(rng.randint(0, 16, 2)))
    books = _base_books() + [odd]
    fl = _simple_floor()
    res = Residue(1, 0, 126, 18, 2, 3,
                  [[4, -1, -1, -1, -1, -1, -1, -1],
                   [4, 4, -1, -1, -1, -1, -1, -1]])
    mp = Mapping(1, [], [0], [0], [0])
    setup = Setup(channels=1, rate=16000, bs0=256, bs1=512,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0)])
    return make_stream(setup, [0] * 8, seed=seed)


def gen_stream(seed: int, secs: float, rate: int = 16000) -> bytes:
    """Arbitrary-duration stereo-or-mono stream for the differential fuzzer:
    ~`secs` seconds of decoded audio at `rate`, mixed long/short blocks,
    occasional unused channels.  Both decoders consume the SAME file, so the
    audio content comes from the stream itself."""
    rng = np.random.RandomState(seed)
    channels = int(rng.randint(1, 3))
    # small VQ deltas keep the decoded waveform near unit scale (the IMDCT
    # sums ~512 coefficients), so transcription-level fuzzing sees realistic
    # mel inputs rather than saturated ones
    books = _base_books() + [
        _vq_book_type2(dims=4, delta=1 / 512, minimum=-1 / 64),
        _vq_book_type1(delta=1 / 256, minimum=-1 / 32),
    ]
    fl = _simple_floor(rangebits=9, xs=(64, 320, 180))
    res = Residue(2, 0, 512, 64, 3, 3,
                  [[4, -1, -1, -1, -1, -1, -1, -1],
                   [4, 5, -1, -1, -1, -1, -1, -1],
                   [5, -1, 4, -1, -1, -1, -1, -1]])
    coupling = [(0, 1)] if channels == 2 and rng.rand() < 0.7 else []
    mp = Mapping(1, coupling, [0] * channels, [0], [0])
    setup = Setup(channels=channels, rate=rate, bs0=512, bs1=1024,
                  books=books, floors=[fl], residues=[res],
                  mappings=[mp], modes=[(0, 0), (1, 0)])
    # ~384 samples per mixed block on average
    n_blocks = max(4, int(secs * rate / 384))
    flags = [0] + [int(x) for x in rng.randint(0, 2, n_blocks - 1)]
    plan = {}
    for i in sorted(rng.choice(max(2, n_blocks), size=n_blocks // 16,
                               replace=False)):
        plan[int(i)] = tuple(
            c for c in range(channels) if rng.rand() < 0.6) or (0,)
    return make_stream(setup, flags, seed=seed + 1, unused_plan=plan,
                       max_segs_per_page=16,
                       trim=int(rng.randint(0, 100)))


def corpus() -> list[tuple[str, bytes]]:
    return [
        ("mono_short", case_mono_short()),
        ("mono_long_short", case_mono_long_short()),
        ("stereo_coupled", case_stereo_coupled()),
        ("stereo_submaps", case_stereo_submaps()),
        ("unused_channels", case_unused_channels()),
        ("begin_end", case_begin_end()),
        ("spanning_pages", case_spanning_pages()),
        ("trimmed_end", case_trimmed_end()),
        ("multiplier3", case_multiplier3()),
        ("ordered_books", case_ordered_books()),
        ("discard_swallow", case_discard_swallow()),
        ("deep_codes", case_deep_codes()),
        ("big_blocks", case_big_blocks()),
        ("many_floor_partitions", case_many_floor_partitions()),
        ("lookup1_odd", case_lookup1_odd()),
        ("long_stream", case_long_stream()),
    ]


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vorbisgen"
    os.makedirs(outdir, exist_ok=True)
    for name, blob in corpus():
        path = os.path.join(outdir, f"{name}.ogg")
        with open(path, "wb") as f:
            f.write(blob)
        print(path, len(blob))
