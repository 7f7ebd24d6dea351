"""ctypes bindings for the native (C++) audio frontend.

Loads native/libwtpu_audio.so (built by `make -C native`); every entry
point has a pure-numpy fallback in mel.py / timestamps.py, so the native
library is an optional accelerator, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libwtpu_audio.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.wtpu_mel_dims.argtypes = [ctypes.c_int, i32p, i32p]
    lib.wtpu_log_mel.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int,
                                 f32p, ctypes.c_int]
    lib.wtpu_log_mel.restype = ctypes.c_int
    lib.wtpu_signal_energy.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p]
    lib.wtpu_resample_linear.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                         f32p, ctypes.c_int, ctypes.c_int]
    lib.wtpu_resample_linear.restype = ctypes.c_int
    try:  # a stale .so built before the FLAC decoder degrades gracefully
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_int32))
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.wtpu_flac_probe.argtypes = [u8p, ctypes.c_uint64]
        lib.wtpu_flac_probe.restype = ctypes.c_int
        lib.wtpu_flac_decode.argtypes = [u8p, ctypes.c_uint64, i32pp, u64p,
                                         u32p, u32p, u32p, ctypes.c_int]
        lib.wtpu_flac_decode.restype = ctypes.c_int
        lib.wtpu_flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        lib._has_flac = True
    except AttributeError:
        lib._has_flac = False
    try:  # a stale .so built before the MP3 decoder degrades gracefully
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.wtpu_mp3_probe.argtypes = [u8p, ctypes.c_uint64]
        lib.wtpu_mp3_probe.restype = ctypes.c_int
        lib.wtpu_mp3_decode.argtypes = [u8p, ctypes.c_uint64, f32pp, u64p,
                                        u32p, u32p]
        lib.wtpu_mp3_decode.restype = ctypes.c_int
        lib.wtpu_mp3_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib._has_mp3 = True
    except AttributeError:
        lib._has_mp3 = False
    try:  # a stale .so built before the Vorbis decoder degrades gracefully
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.wtpu_vorbis_probe.argtypes = [u8p, ctypes.c_uint64]
        lib.wtpu_vorbis_probe.restype = ctypes.c_int
        lib.wtpu_vorbis_decode.argtypes = [u8p, ctypes.c_uint64, f32pp, u64p,
                                           u32p, u32p]
        lib.wtpu_vorbis_decode.restype = ctypes.c_int
        lib.wtpu_vorbis_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib._has_vorbis = True
    except AttributeError:
        lib._has_vorbis = False
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def log_mel_spectrogram_native(samples: np.ndarray, filters: np.ndarray,
                               n_threads: int = 4):
    """-> ((n_len, n_mel) f32, n_len_org) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    if len(samples) < 201:
        return None  # too short for the reflect pad; numpy path handles it
    filters = np.ascontiguousarray(filters, dtype=np.float32)
    n_len = ctypes.c_int()
    n_len_org = ctypes.c_int()
    lib.wtpu_mel_dims(len(samples), ctypes.byref(n_len),
                      ctypes.byref(n_len_org))
    out = np.empty((n_len.value, filters.shape[0]), dtype=np.float32)
    rc = lib.wtpu_log_mel(_fptr(samples), len(samples), _fptr(filters),
                          filters.shape[0], _fptr(out), n_threads)
    if rc != 0:
        return None
    return out, n_len_org.value


def signal_energy_native(signal: np.ndarray, half_window: int):
    lib = _load()
    if lib is None:
        return None
    signal = np.ascontiguousarray(signal, dtype=np.float32)
    out = np.empty(len(signal), dtype=np.float32)
    lib.wtpu_signal_energy(_fptr(signal), len(signal), half_window, _fptr(out))
    return out


def decode_flac_native(data: bytes, verify_crc: bool = True):
    """Native FLAC decode -> ((n, ch) int32, rate, bits), or None when the
    library is unavailable.  Raises ValueError on malformed streams (same
    contract as audio.flac.decode_flac)."""
    lib = _load()
    if lib is None or not lib._has_flac:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    pcm_ptr = ctypes.POINTER(ctypes.c_int32)()
    frames = ctypes.c_uint64()
    channels = ctypes.c_uint32()
    rate = ctypes.c_uint32()
    bits = ctypes.c_uint32()
    rc = lib.wtpu_flac_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.byref(pcm_ptr), ctypes.byref(frames), ctypes.byref(channels),
        ctypes.byref(rate), ctypes.byref(bits), int(verify_crc))
    if rc != 0:
        raise ValueError(f"FLAC decode failed (native rc={rc})")
    try:
        n = frames.value * channels.value
        pcm = np.ctypeslib.as_array(pcm_ptr, shape=(n,)).reshape(
            frames.value, channels.value).copy()
    finally:
        lib.wtpu_flac_free(pcm_ptr)
    return pcm, rate.value, bits.value


def decode_ogg_vorbis_native(data: bytes):
    """Native Ogg Vorbis decode -> ((n, ch) float32, rate), or None when the
    library is unavailable.  Raises ValueError on malformed streams — exactly
    where audio.vorbis.decode_ogg_vorbis raises (parity pinned in
    tests/test_vorbis_native.py)."""
    lib = _load()
    if lib is None or not lib._has_vorbis:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    pcm_ptr = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_uint64()
    channels = ctypes.c_uint32()
    rate = ctypes.c_uint32()
    rc = lib.wtpu_vorbis_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.byref(pcm_ptr), ctypes.byref(frames), ctypes.byref(channels),
        ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"Ogg Vorbis decode failed (native rc={rc})")
    try:
        n = frames.value * channels.value
        if n == 0:
            pcm = np.zeros((0, max(1, channels.value)), dtype=np.float32)
        else:
            pcm = np.ctypeslib.as_array(pcm_ptr, shape=(n,)).reshape(
                frames.value, channels.value).copy()
    finally:
        lib.wtpu_vorbis_free(pcm_ptr)
    return pcm, rate.value


def decode_mp3_native(data: bytes):
    """Native MPEG audio decode -> ((n, ch) float32 = s16/32768, rate), or
    None when the library is unavailable.  Raises ValueError on streams with
    no decodable frames (same contract as audio.mp3.decode_mp3)."""
    lib = _load()
    if lib is None or not lib._has_mp3:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    pcm_ptr = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_uint64()
    channels = ctypes.c_uint32()
    rate = ctypes.c_uint32()
    rc = lib.wtpu_mp3_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.byref(pcm_ptr), ctypes.byref(frames), ctypes.byref(channels),
        ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"MPEG audio decode failed (native rc={rc})")
    try:
        n = frames.value * channels.value
        pcm = np.ctypeslib.as_array(pcm_ptr, shape=(n,)).reshape(
            frames.value, channels.value).copy()
    finally:
        lib.wtpu_mp3_free(pcm_ptr)
    return pcm, rate.value
