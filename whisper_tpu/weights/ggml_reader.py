"""Reader for the legacy ggml Whisper model container.

File layout (reference: src/whisper.cpp:1487-1969, writer
models/convert-pt-to-ggml.py:265-342):

    uint32  magic = 0x67676d6c ("ggml" LE)
    int32   n_vocab, n_audio_ctx, n_audio_state, n_audio_head, n_audio_layer,
            n_text_ctx, n_text_state, n_text_head, n_text_layer, n_mels, ftype
    int32   filters.n_mel, filters.n_fft
    f32     filters[n_mel * n_fft]
    int32   n_vocab_in_file
    repeat: uint32 len; bytes token[len]
    repeat until EOF:
        int32 n_dims, name_len, ttype
        int32 ne[n_dims]            (ggml order: ne[0] is contiguous)
        bytes name[name_len]
        raw tensor data (ggml type `ttype`), NO alignment padding

All integers little-endian.  Tensor numpy shape = reversed(ne).
"""

from __future__ import annotations

import dataclasses
import io
import struct
from typing import BinaryIO

import numpy as np

from ..constants import GGML_FILE_MAGIC, MODEL_TYPE_BY_AUDIO_LAYERS
from ..languages import lang_str
from . import quant

GGML_QNT_VERSION_FACTOR = 1000  # reference: ggml/include/ggml.h GGML_QNT_VERSION_FACTOR


@dataclasses.dataclass
class Hparams:
    """Model hyper-parameters (reference: src/whisper.cpp:634-647)."""
    n_vocab: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int
    n_mels: int
    ftype: int

    @property
    def model_type(self) -> str:
        base = MODEL_TYPE_BY_AUDIO_LAYERS.get(self.n_audio_layer, "unknown")
        if base == "large" and self.n_vocab == 51866:
            return "large-v3"
        return base


@dataclasses.dataclass
class Vocab:
    """Token table + special ids (reference: src/whisper.cpp:473-502)."""
    n_vocab: int
    id_to_token: list[bytes]
    token_to_id: dict[bytes, int]
    token_eot: int = 50256
    token_sot: int = 50257
    token_translate: int = 50357
    token_transcribe: int = 50358
    token_solm: int = 50359
    token_prev: int = 50360
    token_nosp: int = 50361
    token_not: int = 50362
    token_beg: int = 50363

    @property
    def is_multilingual(self) -> bool:
        return self.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        return self.n_vocab - 51765 - (1 if self.is_multilingual else 0)

    def token_lang(self, lang_id: int) -> int:
        """whisper_token_lang (reference: src/whisper.cpp:4231)."""
        return self.token_sot + 1 + lang_id

    def token_str(self, tid: int) -> str:
        return self.id_to_token[tid].decode("utf-8", errors="replace")

    def token_bytes(self, tid: int) -> bytes:
        return self.id_to_token[tid]


@dataclasses.dataclass
class RawTensor:
    name: str
    ttype: int           # ggml type id
    ne: tuple[int, ...]  # ggml order (ne[0] contiguous)
    data: bytes          # raw on-disk bytes

    @property
    def shape(self) -> tuple[int, ...]:
        """Numpy row-major shape."""
        return tuple(reversed(self.ne))

    def to_numpy(self) -> np.ndarray:
        return quant.decode_tensor(self.data, self.ttype, self.shape)


@dataclasses.dataclass
class GgmlModelFile:
    hparams: Hparams
    filters: np.ndarray          # (n_mel, n_fft) f32 mel filterbank
    vocab: Vocab
    tensors: dict[str, RawTensor]
    wtype: int                   # ggml type of the "mostly" weights

    @property
    def n_loaded(self) -> int:
        return len(self.tensors)


def _read_i32(f: BinaryIO) -> int:
    return struct.unpack("<i", f.read(4))[0]


def _read_u32(f: BinaryIO) -> int:
    return struct.unpack("<I", f.read(4))[0]


def special_token_ids(n_vocab: int) -> dict[str, int]:
    """THE single derivation of the special-token layout for a vocab size.

    Reference: src/whisper.cpp:473-502 (GPT-2 defaults) and :1637-1652
    (multilingual adjustment): multilingual shifts eot/sot by ONE (the
    extra <|sot|> slot) and the later specials by dt = num_languages - 98
    only (NOT one more).  Every other construction site (file loader,
    from_random, bench) must call this — do not re-derive the arithmetic.
    """
    multilingual = n_vocab >= 51865
    shift = 1 if multilingual else 0
    # num_languages = n_vocab - 51765 - (1 if multilingual); dt = nl - 98
    dt = (n_vocab - 51864) if multilingual else 0
    return dict(
        token_eot=50256 + shift, token_sot=50257 + shift,
        token_translate=50357 + dt, token_transcribe=50358 + dt,
        token_solm=50359 + dt, token_prev=50360 + dt,
        token_nosp=50361 + dt, token_not=50362 + dt,
        token_beg=50363 + dt)


def synthetic_vocab(n_vocab: int) -> Vocab:
    """Vocab with correct special ids but synthetic token strings.

    Timing-faithful stand-in when no model file is available (bench,
    from_random): ids/specials match a real model of this vocab size,
    only the strings differ.
    """
    id_to_token = [b" t%d" % i for i in range(n_vocab)]
    return Vocab(
        n_vocab=n_vocab, id_to_token=id_to_token,
        token_to_id={t: i for i, t in enumerate(id_to_token)},
        **special_token_ids(n_vocab))


def _build_vocab(hparams: Hparams, tokens_in_file: list[bytes]) -> Vocab:
    """Replicates reference vocab construction (src/whisper.cpp:1601-1688)."""
    id_to_token = list(tokens_in_file)
    vocab = Vocab(
        n_vocab=hparams.n_vocab,
        id_to_token=id_to_token,
        token_to_id={},
        **special_token_ids(hparams.n_vocab),
    )

    # synthesize names for special tokens not present in the file
    if len(id_to_token) < hparams.n_vocab:
        for i in range(len(id_to_token), hparams.n_vocab):
            if i > vocab.token_beg:
                word = f"[_TT_{i - vocab.token_beg}]"
            elif i == vocab.token_eot:
                word = "[_EOT_]"
            elif i == vocab.token_sot:
                word = "[_SOT_]"
            elif i == vocab.token_translate:
                word = "[_TRANSLATE_]"
            elif i == vocab.token_transcribe:
                word = "[_TRANSCRIBE_]"
            elif i == vocab.token_solm:
                word = "[_SOLM_]"
            elif i == vocab.token_prev:
                word = "[_PREV_]"
            elif i == vocab.token_nosp:
                word = "[_NOSP_]"
            elif i == vocab.token_not:
                word = "[_NOT_]"
            elif i == vocab.token_beg:
                word = "[_BEG_]"
            elif vocab.token_sot < i <= vocab.token_sot + vocab.num_languages:
                word = f"[_LANG_{lang_str(i - vocab.token_sot - 1)}]"
            else:
                word = f"[_extra_token_{i}]"
            id_to_token.append(word.encode("utf-8"))

    vocab.token_to_id = {tok: i for i, tok in enumerate(id_to_token)}
    return vocab


def read_ggml_file(path_or_file) -> GgmlModelFile:
    """Parse a legacy ggml Whisper model file (or file-like / bytes)."""
    if isinstance(path_or_file, (str, bytes)) and not hasattr(path_or_file, "read"):
        if isinstance(path_or_file, bytes):
            f: BinaryIO = io.BytesIO(path_or_file)
        else:
            f = open(path_or_file, "rb")
    else:
        f = path_or_file

    magic = _read_u32(f)
    if magic != GGML_FILE_MAGIC:
        raise ValueError(f"invalid model data (bad magic 0x{magic:08x})")

    fields = struct.unpack("<11i", f.read(44))
    hparams = Hparams(*fields)
    # quantization version is folded into ftype (reference: whisper.cpp:1562-1565)
    hparams.ftype = hparams.ftype % GGML_QNT_VERSION_FACTOR
    if hparams.ftype not in quant.FTYPE_TO_TYPE:
        raise ValueError(f"invalid model (bad ftype value {hparams.ftype})")
    wtype = quant.FTYPE_TO_TYPE[hparams.ftype]

    n_mel = _read_i32(f)
    n_fft = _read_i32(f)
    filters = np.frombuffer(f.read(4 * n_mel * n_fft), dtype="<f4").reshape(n_mel, n_fft)

    n_vocab_file = _read_i32(f)
    tokens = []
    for _ in range(n_vocab_file):
        ln = _read_u32(f)
        tokens.append(f.read(ln) if ln else b"")
    vocab = _build_vocab(hparams, tokens)

    tensors: dict[str, RawTensor] = {}
    while True:
        head = f.read(12)
        if len(head) < 12:
            break
        n_dims, name_len, ttype = struct.unpack("<3i", head)
        ne = struct.unpack(f"<{n_dims}i", f.read(4 * n_dims))
        name = f.read(name_len).decode("utf-8")
        nelements = int(np.prod(ne))
        nbytes = quant.type_nbytes(ttype, nelements)
        data = f.read(nbytes)
        if len(data) != nbytes:
            raise ValueError(f"truncated tensor data for '{name}'")
        tensors[name] = RawTensor(name=name, ttype=ttype, ne=tuple(ne), data=data)

    if hasattr(f, "close") and f is not path_or_file:
        f.close()

    return GgmlModelFile(hparams=hparams, filters=filters.copy(), vocab=vocab,
                         tensors=tensors, wtype=wtype)
