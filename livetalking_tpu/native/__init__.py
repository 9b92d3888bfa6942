"""ctypes binding + lazy build for the native A/V module (avmux.cpp).

Builds ``libltav.so`` with g++ against the system ffmpeg libraries on
first use (cached next to the source). See avmux.cpp for what it replaces
from the reference's native dependency set.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from livetalking_tpu.utils.logger import logger

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "avmux.cpp")
_LIB = os.path.join(_HERE, "libltav.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None

_FFMPEG_LIBS = ["libavformat", "libavcodec", "libavutil", "libswscale", "libswresample"]


def build(force: bool = False) -> str:
    """Compile avmux.cpp -> libltav.so (idempotent)."""
    with _lock:
        if not force and os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
        cflags = subprocess.check_output(
            ["pkg-config", "--cflags"] + _FFMPEG_LIBS, text=True).split()
        ldflags = subprocess.check_output(
            ["pkg-config", "--libs"] + _FFMPEG_LIBS, text=True).split()
        cmd = ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", _SRC,
               "-o", _LIB] + cflags + ldflags
        logger.info("building native avmux: %s", " ".join(cmd))
        subprocess.run(cmd, check=True)
        return _LIB


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    path = build()
    lib = ctypes.CDLL(path)
    lib.ltav_open.restype = ctypes.c_void_p
    lib.ltav_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                              ctypes.c_int, ctypes.c_int, ctypes.c_int,
                              ctypes.c_char_p, ctypes.c_int]
    lib.ltav_write_video.restype = ctypes.c_int
    lib.ltav_write_video.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ltav_write_audio.restype = ctypes.c_int
    lib.ltav_write_audio.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.ltav_close.restype = ctypes.c_int
    lib.ltav_close.argtypes = [ctypes.c_void_p]
    lib.ltav_decode_audio.restype = ctypes.POINTER(ctypes.c_float)
    lib.ltav_decode_audio.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.c_char_p, ctypes.c_int]
    lib.ltav_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.ltav_video_encoder_name.restype = ctypes.c_char_p
    _lib = lib
    return lib


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception as e:  # toolchain or libs missing
        logger.warning("native avmux unavailable: %s", e)
        return False


class AVMuxer:
    """Encode+mux BGR frames and 16 kHz PCM to a file (mp4) or RTMP url."""

    def __init__(self, url: str, width: int, height: int, fps: int = 25,
                 sample_rate: int = 16000, fmt: str = ""):
        if not fmt:
            fmt = "flv" if url.startswith("rtmp") else ""
        lib = get_lib()
        err = ctypes.create_string_buffer(512)
        self._lib = lib
        self._h = lib.ltav_open(url.encode(), fmt.encode(), width, height,
                                fps, sample_rate, err, len(err))
        if not self._h:
            raise RuntimeError(f"ltav_open failed: {err.value.decode()}")
        self.width, self.height = width, height

    def write_video(self, frame_bgr: np.ndarray) -> None:
        assert frame_bgr.shape == (self.height, self.width, 3)
        data = np.ascontiguousarray(frame_bgr, dtype=np.uint8)
        rc = self._lib.ltav_write_video(self._h, data.ctypes.data_as(ctypes.c_char_p))
        if rc < 0:
            raise RuntimeError(f"ltav_write_video rc={rc}")

    def write_audio(self, pcm16: np.ndarray) -> None:
        data = np.ascontiguousarray(pcm16, dtype=np.int16)
        rc = self._lib.ltav_write_audio(self._h, data.ctypes.data_as(ctypes.c_char_p),
                                        data.shape[0])
        if rc < 0:
            raise RuntimeError(f"ltav_write_audio rc={rc}")

    def close(self) -> None:
        if self._h:
            self._lib.ltav_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_audio_bytes(data: bytes, target_sr: int = 16000) -> np.ndarray:
    """Decode any libavformat-probed container to mono f32 @ target_sr."""
    lib = get_lib()
    err = ctypes.create_string_buffer(512)
    n = ctypes.c_int(0)
    ptr = lib.ltav_decode_audio(data, len(data), target_sr, ctypes.byref(n),
                                err, len(err))
    if not ptr:
        raise ValueError(f"decode failed: {err.value.decode()}")
    try:
        return np.ctypeslib.as_array(ptr, shape=(n.value,)).copy()
    finally:
        lib.ltav_free(ptr)


def video_encoder_name() -> str:
    return get_lib().ltav_video_encoder_name().decode()
