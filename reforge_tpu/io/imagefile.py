"""Host image decode/encode.

Primary backend: the native C++ libav extension (native/imageio.cpp, built
to libreforge_io.so and loaded via ctypes) — the analog of the reference's
raw ffmpeg FFI (reference: src/imagefileio.rs): decode any libav-supported
image or video's first frame with Lanczos resize straight into an RGBA8
buffer, and PNG-encode at max compression.  Falls back to PIL when the .so
is absent (e.g. no toolchain), keeping behavior identical.

All APIs traffic in numpy uint8 arrays of shape (H, W, 4), sRGB-encoded;
linearization happens on device (io/srgb.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from ..utils import warnln

_NATIVE_PATH = os.path.join(os.path.dirname(__file__), "libreforge_io.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _native_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_NATIVE_PATH):
        return None
    try:
        lib = ctypes.CDLL(_NATIVE_PATH)
    except OSError as e:
        warnln(f"Failed to load native imageio ({e}); falling back to PIL")
        return None
    lib.rf_decoder_open.restype = ctypes.c_void_p
    lib.rf_decoder_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.rf_decoder_dims.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.rf_decoder_decode.restype = ctypes.c_int
    lib.rf_decoder_decode.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.rf_decoder_close.argtypes = [ctypes.c_void_p]
    lib.rf_decoder_next.restype = ctypes.c_int
    lib.rf_decoder_next.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.rf_decoder_fps.restype = ctypes.c_double
    lib.rf_decoder_fps.argtypes = [ctypes.c_void_p]
    lib.rf_decoder_seek.restype = ctypes.c_int
    lib.rf_decoder_seek.argtypes = [
        ctypes.c_void_p,
        ctypes.c_double,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.rf_decoder_next2.restype = ctypes.c_int
    lib.rf_decoder_next2.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.rf_venc_open.restype = ctypes.c_void_p
    lib.rf_venc_open.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.rf_venc_write.restype = ctypes.c_int
    lib.rf_venc_write.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.rf_venc_close.restype = ctypes.c_int
    lib.rf_venc_close.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.rf_encode.restype = ctypes.c_int
    lib.rf_encode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


class ImageFileError(Exception):
    pass


class ImageFileDecoder:
    """Decode a file's first frame to RGBA8 at a requested size.

    Mirrors the reference ImageFileDecoder (imagefileio.rs:84-184): probe
    on construction (exposing source width/height for aspect-fit dimension
    selection), then decode+Lanczos-resize into an RGBA8 buffer.
    """

    def __init__(self, path: str):
        self.path = path
        self._native = None
        self.width = 0
        self.height = 0
        lib = _native_lib()
        if lib is not None:
            err = ctypes.create_string_buffer(512)
            handle = lib.rf_decoder_open(path.encode(), err, len(err))
            if not handle:
                raise ImageFileError(err.value.decode() or f"Failed to open {path}")
            self._native = ctypes.c_void_p(handle)
            w = ctypes.c_int()
            h = ctypes.c_int()
            lib.rf_decoder_dims(self._native, ctypes.byref(w), ctypes.byref(h))
            self.width, self.height = w.value, h.value
        else:
            from PIL import Image

            try:
                with Image.open(path) as im:
                    self.width, self.height = im.size
            except Exception as e:
                raise ImageFileError(f"Failed to open '{path}': {e}") from e

    def decode(self, width: int, height: int) -> np.ndarray:
        """Return (height, width, 4) uint8 RGBA, Lanczos-resized."""
        lib = _native_lib()
        if self._native is not None and lib is not None:
            out = np.empty((height, width, 4), dtype=np.uint8)
            err = ctypes.create_string_buffer(512)
            rc = lib.rf_decoder_decode(
                self._native,
                out.ctypes.data_as(ctypes.c_char_p),
                width,
                height,
                err,
                len(err),
            )
            if rc != 0:
                raise ImageFileError(err.value.decode() or "decode failed")
            return out
        from PIL import Image

        with Image.open(self.path) as im:
            im = im.convert("RGBA")
            if (width, height) != im.size:
                im = im.resize((width, height), Image.LANCZOS)
            return np.asarray(im, dtype=np.uint8).copy()

    def close(self) -> None:
        lib = _native_lib()
        if self._native is not None and lib is not None:
            lib.rf_decoder_close(self._native)
            self._native = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


VIDEO_EXTENSIONS = (".mp4", ".avi", ".mkv", ".webm", ".mov", ".m4v", ".mpg")


def is_video_path(path: str) -> bool:
    return os.path.splitext(path)[1].lower() in VIDEO_EXTENSIONS


class VideoFrames:
    """Sequential frame iterator over a video (native backend only).

    Goes beyond the reference, which decodes only a video's first frame
    (imagefileio.rs:129-152).
    """

    def __init__(self, decoder: ImageFileDecoder, width: int, height: int,
                 start: float = 0.0, duration: float | None = None):
        if decoder._native is None or _native_lib() is None:
            raise ImageFileError(
                "Video streaming requires the native io backend (make -C native)"
            )
        self._dec = decoder
        self.width = width
        self.height = height
        self.start = max(0.0, float(start))
        self.duration = duration

    @property
    def fps(self) -> float:
        lib = _native_lib()
        fps = lib.rf_decoder_fps(self._dec._native)
        return fps if fps > 0 else 30.0

    def __iter__(self):
        lib = _native_lib()
        err = ctypes.create_string_buffer(512)
        end = None if self.duration is None else self.start + float(self.duration)
        if self.start > 0.0:
            # Keyframe seek, then decode-and-discard up to the exact start.
            if lib.rf_decoder_seek(
                self._dec._native, self.start, err, len(err)
            ) != 0:
                raise ImageFileError(err.value.decode() or "seek failed")
        pts = ctypes.c_double(-1.0)
        eps = 1e-6
        while True:
            out = np.empty((self.height, self.width, 4), dtype=np.uint8)
            rc = lib.rf_decoder_next2(
                self._dec._native,
                out.ctypes.data_as(ctypes.c_char_p),
                self.width,
                self.height,
                ctypes.byref(pts),
                err,
                len(err),
            )
            if rc == 1:
                return
            if rc != 0:
                raise ImageFileError(err.value.decode() or "video decode failed")
            t = pts.value
            if t >= 0.0:
                if t < self.start - eps:
                    continue  # pre-roll frames from the keyframe seek
                if end is not None and t >= end - eps:
                    return
            yield out


class VideoEncoder:
    """Encode RGBA8 frames to a video container (codec from extension)."""

    def __init__(self, path: str, width: int, height: int, fps: float = 30.0):
        lib = _native_lib()
        if lib is None:
            raise ImageFileError(
                "Video encoding requires the native io backend (make -C native)"
            )
        self._lib = lib
        err = ctypes.create_string_buffer(512)
        handle = lib.rf_venc_open(
            path.encode(), width, height, float(fps), err, len(err)
        )
        if not handle:
            raise ImageFileError(err.value.decode() or f"cannot open {path}")
        self._enc = ctypes.c_void_p(handle)
        self.width = width
        self.height = height
        self.frames_written = 0

    def write(self, rgba: np.ndarray) -> None:
        rgba = np.ascontiguousarray(rgba, dtype=np.uint8)
        expected = (self.height, self.width, 4)
        if rgba.shape != expected:
            # The C side assumes stride width*4; a mismatched array would
            # make sws_scale read out of bounds.
            raise ImageFileError(
                f"encoder expects frames of shape {expected}, got {rgba.shape}"
            )
        err = ctypes.create_string_buffer(512)
        rc = self._lib.rf_venc_write(
            self._enc, rgba.ctypes.data_as(ctypes.c_char_p), err, len(err)
        )
        if rc != 0:
            raise ImageFileError(err.value.decode() or "video encode failed")
        self.frames_written += 1

    def close(self) -> None:
        if self._enc is not None:
            err = ctypes.create_string_buffer(512)
            rc = self._lib.rf_venc_close(self._enc, err, len(err))
            self._enc = None
            if rc != 0:
                # A failed flush/trailer write leaves a corrupt file; the
                # caller must not report success.
                raise ImageFileError(
                    err.value.decode() or "video finalize failed"
                )

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None:
            # Don't mask the original exception with a finalize error.
            try:
                self.close()
            except ImageFileError:
                pass
            return False
        self.close()
        return False


def encode(path: str, rgba: np.ndarray) -> None:
    """Write (H, W, 4) uint8 RGBA to an image file (codec by extension).

    PNG output uses max compression for parity with the reference encoder
    (imagefileio.rs:237-241).
    """
    rgba = np.ascontiguousarray(rgba, dtype=np.uint8)
    h, w = rgba.shape[:2]
    ext = os.path.splitext(path)[1].lower()
    lib = _native_lib()
    # The native encoder implements PNG and JPEG; other extensions (.bmp,
    # .webp, .tif, ...) go through PIL so the bytes match the extension.
    if ext not in (".png", ".jpg", ".jpeg", ""):
        lib = None
    if lib is not None:
        err = ctypes.create_string_buffer(512)
        rc = lib.rf_encode(
            path.encode(), rgba.ctypes.data_as(ctypes.c_char_p), w, h, err, len(err)
        )
        if rc != 0:
            raise ImageFileError(err.value.decode() or "encode failed")
        return
    from PIL import Image

    im = Image.fromarray(rgba, "RGBA")
    if ext in (".jpg", ".jpeg"):
        im = im.convert("RGB")
        im.save(path, quality=95)
    else:
        im.save(path, compress_level=9)


def native_backend_available() -> bool:
    return _native_lib() is not None
