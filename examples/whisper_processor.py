"""Minimal "process a wav, get a string" helper (reference:
examples/python/whisper_processor.py, which shells out to ./main).

Since this framework IS Python, the idiomatic version calls the library
directly — no subprocess, no stdout scraping.

    from whisper_processor import process_audio
    text = process_audio("audio.wav", "base.en")
"""

import os
import sys


def process_audio(wav_file: str, model_name: str = "base.en") -> str:
    """Transcribe `wav_file` -> plain text (no timestamps).

    model_name may be a whisper size name (resolved against ./models like
    the reference) or a direct path to a ggml .bin file.
    """
    model = (model_name if os.path.exists(model_name)
             else f"./models/ggml-{model_name}.bin")
    if not os.path.exists(model):
        raise FileNotFoundError(
            f"Model file not found: {model}\n\nDownload one with:\n\n"
            f"> python tools/download_model.py {model_name}\n")
    if not os.path.exists(wav_file):
        raise FileNotFoundError(f"WAV file not found: {wav_file}")

    import whisper_tpu as wt
    from whisper_tpu.audio.io import load_audio

    ctx = wt.WhisperContext.from_file(model)
    params = wt.full_default_params()
    params.print_progress = False
    params.no_timestamps = True
    pcm, _ = load_audio(wav_file)
    ctx.full(params, pcm)
    text = "".join(ctx.full_get_segment_text(i)
                   for i in range(ctx.full_n_segments())).strip()
    return text.replace("[BLANK_AUDIO]", "").strip()


def main() -> None:
    if len(sys.argv) < 2:
        print("Usage: python whisper_processor.py <wav_file> [<model_name>]")
        return
    wav_file = sys.argv[1]
    model_name = sys.argv[2] if len(sys.argv) == 3 else "base.en"
    try:
        print(process_audio(wav_file, model_name))
    except Exception as e:  # mirror the reference's error surface
        print(f"Error: {e}")


if __name__ == "__main__":
    main()
