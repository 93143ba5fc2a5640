"""Legacy-data interop: decode object_recognition_core cv::Mat attachments.

A reference-era database (trained models + capture observations) stores its
binary attachments in the formats object_recognition_core's
``Document::get_attachment<cv::Mat>`` / ``set_attachment<cv::Mat>`` speak
(consumed at src/detection/DescriptorMatcher.cpp:74-86,
src/detection/ModelReader.cpp:60-61; produced at
src/training/ModelFiller.cpp:23-24).  Core serializes a cv::Mat as an
OpenCV FileStorage YAML document holding a named matrix map (zlib-deflated
on the wire), while capture-era observation imagery travels as PNG; older
exports used a raw ``rows, cols, type, data`` binary header.  This module
sniffs and decodes all of them into numpy arrays, so a reference user's
existing CouchDB/dump can be read without retraining — and
``tools/migrate_db.py`` rewrites such a database into tod_tpu's native
npy-attachment documents in one command.

Nothing here is used on the serving hot path: decoding happens once at
load/migrate time.
"""

from __future__ import annotations

import io
import struct
import zlib
from typing import Dict, Optional

import numpy as np

# cv::Mat depth code -> numpy dtype (modules/core/include/opencv2/core/hal/
# interface.h: CV_8U..CV_64F)
_CV_DEPTH_TO_DTYPE = {
    0: np.uint8, 1: np.int8, 2: np.uint16, 3: np.int16,
    4: np.int32, 5: np.float32, 6: np.float64,
}


class LegacyDecodeError(ValueError):
    """Raised when bytes match none of the known legacy attachment formats."""


def _try_inflate(data: bytes) -> Optional[bytes]:
    """Undo the zlib/gzip deflate core's attachment streams apply (raw
    deflate, zlib-wrapped, and gzip-wrapped all appear in the wild)."""
    for wbits in (zlib.MAX_WBITS, -zlib.MAX_WBITS, zlib.MAX_WBITS | 16):
        try:
            return zlib.decompress(data, wbits)
        except zlib.error:
            continue
    return None


def _decode_filestorage(text: str) -> Dict[str, np.ndarray]:
    """Parse an OpenCV FileStorage YAML/XML document into {name: array}.

    cv2's FileStorage IS the reference serializer (core links OpenCV), so
    round-tripping through it is exact by construction."""
    import cv2

    fs = cv2.FileStorage(text, cv2.FILE_STORAGE_READ | cv2.FILE_STORAGE_MEMORY)
    try:
        if not fs.isOpened():
            raise LegacyDecodeError("FileStorage failed to parse stream")
        root = fs.root()
        out: Dict[str, np.ndarray] = {}
        try:
            keys = list(root.keys())
        except Exception:
            keys = []
        for k in keys:
            node = fs.getNode(k)
            m = node.mat()
            if m is None:
                # scalar nodes (ints/strings) are not matrices; skip
                continue
            out[k] = np.asarray(m)
        if not out:
            raise LegacyDecodeError("FileStorage stream holds no matrices")
        return out
    finally:
        fs.release()


def _decode_raw_header(data: bytes) -> np.ndarray:
    """Raw binary export: int32 rows, int32 cols, int32 type, then the
    contiguous pixel data (mat.step * rows bytes)."""
    if len(data) < 12:
        raise LegacyDecodeError("too short for a raw cv::Mat header")
    rows, cols, mtype = struct.unpack("<iii", data[:12])
    depth, channels = mtype & 7, (mtype >> 3) + 1
    dtype = _CV_DEPTH_TO_DTYPE.get(depth)
    if dtype is None or not (0 < rows < 10 ** 8) or not (0 < cols < 10 ** 8) \
            or not (1 <= channels <= 512):
        raise LegacyDecodeError("implausible raw cv::Mat header")
    need = rows * cols * channels * np.dtype(dtype).itemsize
    if len(data) - 12 < need:
        raise LegacyDecodeError("raw cv::Mat data truncated")
    arr = np.frombuffer(data[12:12 + need], dtype=dtype).reshape(
        rows, cols, channels)
    return arr[..., 0] if channels == 1 else arr


def decode_legacy_mat(data: bytes, prefer: str = "data") -> np.ndarray:
    """Decode one legacy attachment blob into a numpy array.

    Sniffing order: npy (already native), PNG/JPEG imagery, deflated or
    plain FileStorage YAML/XML (core's cv::Mat serialization; the matrix
    map's ``prefer`` key wins, else the single matrix present), raw
    rows/cols/type binary."""
    # already-native npy (idempotent migration)
    if data[:6] == b"\x93NUMPY":
        return np.load(io.BytesIO(data), allow_pickle=False)
    # PNG / JPEG (capture observation imagery; PNG carries u16 depth)
    if data[:8] == b"\x89PNG\r\n\x1a\n" or data[:2] == b"\xff\xd8":
        import cv2

        arr = cv2.imdecode(np.frombuffer(data, np.uint8),
                           cv2.IMREAD_UNCHANGED)
        if arr is None:
            raise LegacyDecodeError("imdecode failed on PNG/JPEG blob")
        if arr.ndim == 3 and arr.shape[2] == 3:
            arr = cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)  # cv2 decodes BGR
        return arr
    candidates = [data]
    inflated = _try_inflate(data)
    if inflated is not None:
        candidates.insert(0, inflated)
    for blob in candidates:
        head = blob[:64].lstrip()
        if head.startswith(b"%YAML") or head.startswith(b"<?xml"):
            mats = _decode_filestorage(blob.decode("utf-8", "replace"))
            if prefer in mats:
                return mats[prefer]
            if len(mats) == 1:
                return next(iter(mats.values()))
            raise LegacyDecodeError(
                f"FileStorage map has keys {sorted(mats)}; none is "
                f"{prefer!r} and the choice is ambiguous")
    for blob in candidates:
        try:
            return _decode_raw_header(blob)
        except LegacyDecodeError:
            continue
    raise LegacyDecodeError("unrecognized legacy attachment format")


def encode_legacy_mat(array: np.ndarray, name: str = "data",
                      compress: bool = True) -> bytes:
    """Produce bytes in core's cv::Mat attachment format (FileStorage YAML
    of a one-entry matrix map, zlib-deflated).  Used by the migration
    round-trip tests — and by anyone writing a model a reference install
    must read back."""
    import cv2

    arr = np.asarray(array)
    if arr.ndim == 1:
        arr = arr[None, :]
    fs = cv2.FileStorage("out.yml", cv2.FILE_STORAGE_WRITE
                         | cv2.FILE_STORAGE_MEMORY)
    fs.write(name, arr)
    text = fs.releaseAndGetString()
    raw = text.encode()
    return zlib.compress(raw) if compress else raw
