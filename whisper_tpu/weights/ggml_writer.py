"""Writer for the legacy ggml Whisper container.

Produces byte-identical layout to the reference converter
(models/convert-pt-to-ggml.py:265-342): f32 tensors for 1-D / conv-bias /
positional embeddings, f16 (or quantized) for the rest.  Used by the
HF/OpenAI checkpoint converter and the quantize tool.
"""

from __future__ import annotations

import struct
from typing import Iterable

import numpy as np

from ..constants import GGML_FILE_MAGIC
from . import quant

# tensors that always stay f32 (reference: convert-pt-to-ggml.py:306-317)
_ALWAYS_F32 = {
    "encoder.conv1.bias",
    "encoder.conv2.bias",
    "encoder.positional_embedding",
    "decoder.positional_embedding",
}

# tensors never quantized by the quantize tool
# (reference: examples/common-ggml.cpp ggml_common_quantize_0 skip list)
QUANTIZE_SKIP_SUFFIXES = (".bias",)
QUANTIZE_SKIP_NAMES = {
    "encoder.conv1.weight",
    "encoder.conv2.weight",
    "encoder.positional_embedding",
    "decoder.positional_embedding",
}


def write_ggml(path: str,
               hparams: dict,
               filters: np.ndarray,
               tokens: Iterable[bytes],
               tensors: dict[str, np.ndarray],
               ftype: int = 1,
               qtype: int | None = None) -> None:
    """Write a Whisper ggml file.

    hparams keys: n_vocab n_audio_ctx n_audio_state n_audio_head
    n_audio_layer n_text_ctx n_text_state n_text_head n_text_layer n_mels.
    ftype: 0=f32, 1=f16, or a quantized ggml_ftype (2,3,7,8,9) with `qtype`
    the matching ggml_type for 2-D weights.
    """
    tokens = list(tokens)
    with open(path, "wb") as f:
        f.write(struct.pack("<I", GGML_FILE_MAGIC))
        for key in ("n_vocab", "n_audio_ctx", "n_audio_state", "n_audio_head",
                    "n_audio_layer", "n_text_ctx", "n_text_state",
                    "n_text_head", "n_text_layer", "n_mels"):
            f.write(struct.pack("<i", hparams[key]))
        f.write(struct.pack("<i", ftype))

        f.write(struct.pack("<i", filters.shape[0]))
        f.write(struct.pack("<i", filters.shape[1]))
        f.write(np.ascontiguousarray(filters, dtype="<f4").tobytes())

        f.write(struct.pack("<i", len(tokens)))
        for tok in tokens:
            if isinstance(tok, str):
                tok = tok.encode("utf-8")
            f.write(struct.pack("<I", len(tok)))
            f.write(tok)

        for name, data in tensors.items():
            data = np.squeeze(np.asarray(data))
            if name in ("encoder.conv1.bias", "encoder.conv2.bias"):
                data = data.reshape(-1, 1)

            if qtype is not None and data.ndim == 2 \
                    and name not in QUANTIZE_SKIP_NAMES \
                    and not name.endswith(QUANTIZE_SKIP_SUFFIXES) \
                    and data.shape[-1] % quant.QK == 0:
                ttype = qtype
                payload = quant.QUANTIZERS[qtype](data.astype(np.float32))
            elif ftype == 0 or data.ndim < 2 or name in _ALWAYS_F32:
                ttype = quant.GGML_TYPE_F32
                payload = np.ascontiguousarray(data, dtype="<f4").tobytes()
            else:
                ttype = quant.GGML_TYPE_F16
                payload = np.ascontiguousarray(data, dtype="<f2").tobytes()

            name_b = name.encode("utf-8")
            f.write(struct.pack("<3i", data.ndim, len(name_b), ttype))
            for i in range(data.ndim):
                f.write(struct.pack("<i", data.shape[data.ndim - 1 - i]))
            f.write(name_b)
            f.write(payload)
