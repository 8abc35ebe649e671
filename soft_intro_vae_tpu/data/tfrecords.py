"""TFRecord ingestion: native C++ reader (ctypes) with pure-Python fallback.

The reference's style variant reads per-LOD TFRecord shards through the
DareBlopy C++ package (style_soft_intro_vae/dataloader.py:16,73-102) with
per-rank shard assignment (:53-67). Here the native layer is our own C++
reader (native/tfrecord_reader.cpp — TFRecord framing + CRC32C + a minimal
tf.Example parser), compiled on first use; a pure-Python implementation backs
it up when no compiler is available.

Also provides a writer (Python) so dataset preparation and tests are
self-contained without TensorFlow.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "tfrecord_reader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libtfrecord.so")

_lib = None
_lib_failed = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.tfr_open.restype = ctypes.c_void_p
        lib.tfr_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.tfr_close.argtypes = [ctypes.c_void_p]
        lib.tfr_next.restype = ctypes.c_long
        lib.tfr_next.argtypes = [ctypes.c_void_p]
        lib.tfr_record_data.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.tfr_record_data.argtypes = [ctypes.c_void_p]
        lib.tfr_feature_bytes.restype = ctypes.c_long
        lib.tfr_feature_bytes.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                          ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.tfr_feature_int64s.restype = ctypes.c_int
        lib.tfr_feature_int64s.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                           ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
        _lib = lib
        return lib
    except Exception:
        _lib_failed = True
        return None


# ------------------------------------------------------------ CRC32C (py) --
def _crc32c_py(data: bytes) -> int:
    table = _crc32c_py_table()
    c = 0xFFFFFFFF
    for b in data:
        c = table[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


_CRC_TABLE: Optional[List[int]] = None


def _crc32c_py_table() -> List[int]:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (poly ^ (c >> 1)) if (c & 1) else (c >> 1)
            tbl.append(c)
        _CRC_TABLE = tbl
    return _CRC_TABLE


def masked_crc(data: bytes) -> int:
    crc = _crc32c_py(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------------------ writer --
def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _len_delim(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def make_example(features: Dict[str, object]) -> bytes:
    """Serialize a tf.Example with bytes / int64-list features (no TF)."""
    entries = b""
    for key, val in features.items():
        if isinstance(val, (bytes, bytearray)):
            bl = _len_delim(1, bytes(val))           # BytesList.value
            feat = _len_delim(1, bl)                 # Feature.bytes_list
        else:
            ints = b"".join(_varint(int(v) & 0xFFFFFFFFFFFFFFFF) for v in val)
            il = _len_delim(1, ints)                 # Int64List.value (packed)
            feat = _len_delim(3, il)                 # Feature.int64_list
        entry = _len_delim(1, key.encode()) + _len_delim(2, feat)
        entries += _len_delim(1, entry)              # Features.feature map entry
    return _len_delim(1, entries)                    # Example.features


class TFRecordWriter:
    """Incremental TFRecord writer (context manager) — lets dataset
    preparation stream arbitrarily large folders at constant memory."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "wb")
        self.count = 0

    def write(self, record: bytes):
        header = struct.pack("<Q", len(record))
        self._f.write(header)
        self._f.write(struct.pack("<I", masked_crc(header)))
        self._f.write(record)
        self._f.write(struct.pack("<I", masked_crc(record)))
        self.count += 1

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_tfrecord(path: str, examples: Sequence[bytes]):
    with TFRecordWriter(path) as w:
        for ex in examples:
            w.write(ex)


# ------------------------------------------------------------------ reader --
class TFRecordFile:
    """Iterate (data_bytes, shape) records of one TFRecord shard.

    Uses the native C++ reader when it can be built; otherwise a pure-Python
    parser with identical behavior (CRC validated either way).
    """

    def __init__(self, path: str, check_crc: bool = True):
        self.path = path
        self.check_crc = check_crc

    # raw record iteration -------------------------------------------------
    def records(self) -> Iterator[bytes]:
        lib = _load_native()
        if lib is not None:
            h = lib.tfr_open(self.path.encode(), int(self.check_crc))
            if not h:
                raise FileNotFoundError(self.path)
            try:
                while True:
                    n = lib.tfr_next(h)
                    if n == -1:
                        return
                    if n == -2:
                        raise IOError(f"corrupt TFRecord: {self.path}")
                    ptr = lib.tfr_record_data(h)
                    yield ctypes.string_at(ptr, n)
            finally:
                lib.tfr_close(h)
        else:
            yield from self._records_py()

    def _records_py(self) -> Iterator[bytes]:
        with open(self.path, "rb") as f:
            while True:
                header = f.read(12)
                if len(header) < 12:
                    return
                (length,) = struct.unpack("<Q", header[:8])
                (len_crc,) = struct.unpack("<I", header[8:12])
                if self.check_crc and masked_crc(header[:8]) != len_crc:
                    raise IOError(f"corrupt TFRecord length: {self.path}")
                data = f.read(length)
                (data_crc,) = struct.unpack("<I", f.read(4))
                if self.check_crc and masked_crc(data) != data_crc:
                    raise IOError(f"corrupt TFRecord data: {self.path}")
                yield data

    # parsed examples ------------------------------------------------------
    def examples(self, bytes_key: str = "data", shape_key: str = "shape"
                 ) -> Iterator[Tuple[bytes, Optional[Tuple[int, ...]]]]:
        lib = _load_native()
        if lib is not None:
            h = lib.tfr_open(self.path.encode(), int(self.check_crc))
            if not h:
                raise FileNotFoundError(self.path)
            try:
                out_ptr = ctypes.POINTER(ctypes.c_uint8)()
                ints = (ctypes.c_int64 * 8)()
                while True:
                    n = lib.tfr_next(h)
                    if n == -1:
                        return
                    if n == -2:
                        raise IOError(f"corrupt TFRecord: {self.path}")
                    blen = lib.tfr_feature_bytes(h, bytes_key.encode(), ctypes.byref(out_ptr))
                    data = ctypes.string_at(out_ptr, blen) if blen >= 0 else b""
                    cnt = lib.tfr_feature_int64s(h, shape_key.encode(), ints, 8)
                    shape = tuple(int(ints[i]) for i in range(cnt)) if cnt > 0 else None
                    yield data, shape
            finally:
                lib.tfr_close(h)
        else:
            for rec in self._records_py():
                yield _parse_example_py(rec, bytes_key, shape_key)

    def examples_with_label(self, bytes_key: str = "data", shape_key: str = "shape",
                            label_key: str = "label"
                            ) -> Iterator[Tuple[bytes, Optional[Tuple[int, ...]], Optional[int]]]:
        """Like examples() but also yields the int64 ``label`` field (None
        when absent) — the ImageNet needs_labels layout
        (style_soft_intro_vae/dataloader.py:205-213)."""
        lib = _load_native()
        if lib is not None:
            h = lib.tfr_open(self.path.encode(), int(self.check_crc))
            if not h:
                raise FileNotFoundError(self.path)
            try:
                out_ptr = ctypes.POINTER(ctypes.c_uint8)()
                ints = (ctypes.c_int64 * 8)()
                while True:
                    n = lib.tfr_next(h)
                    if n == -1:
                        return
                    if n == -2:
                        raise IOError(f"corrupt TFRecord: {self.path}")
                    blen = lib.tfr_feature_bytes(h, bytes_key.encode(), ctypes.byref(out_ptr))
                    data = ctypes.string_at(out_ptr, blen) if blen >= 0 else b""
                    cnt = lib.tfr_feature_int64s(h, shape_key.encode(), ints, 8)
                    shape = tuple(int(ints[i]) for i in range(cnt)) if cnt > 0 else None
                    lcnt = lib.tfr_feature_int64s(h, label_key.encode(), ints, 1)
                    label = int(ints[0]) if lcnt > 0 else None
                    yield data, shape, label
            finally:
                lib.tfr_close(h)
        else:
            for rec in self._records_py():
                data, shape, label_tuple = _parse_example_py(
                    rec, bytes_key, shape_key, label_key)
                label = label_tuple[0] if label_tuple else None
                yield data, shape, label


def _read_varint_py(buf: bytes, i: int) -> Tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v, i
        shift += 7


def _fields_py(buf: bytes) -> Iterator[Tuple[int, int, object, int]]:
    """Yield (field, wire_type, value, next_index) over a proto buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint_py(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _read_varint_py(buf, i)
            yield field, wt, v, i
        elif wt == 2:
            ln, i = _read_varint_py(buf, i)
            yield field, wt, buf[i : i + ln], i + ln
            i += ln
        elif wt == 5:
            yield field, wt, buf[i : i + 4], i + 4
            i += 4
        elif wt == 1:
            yield field, wt, buf[i : i + 8], i + 8
            i += 8
        else:
            raise IOError(f"unsupported wire type {wt}")


def _parse_int64_list(feat) -> tuple:
    vals = []
    for f4, wt4, v4, _ in _fields_py(feat):
        if f4 == 3 and wt4 == 2:  # int64_list
            for f5, wt5, v5, _ in _fields_py(v4):
                if f5 == 1 and wt5 == 2:  # packed
                    j = 0
                    while j < len(v5):
                        x, j = _read_varint_py(v5, j)
                        vals.append(x)
                elif f5 == 1 and wt5 == 0:
                    vals.append(v5)
    return tuple(vals)


def _parse_example_py(rec: bytes, bytes_key: str, shape_key: str,
                      label_key: str | None = None):
    """One pass over the proto: (data, shape) or (data, shape, labels) when
    ``label_key`` is given (the examples_with_label path — parsing twice per
    multi-KB record would double host-side decode time)."""
    data, shape, label = b"", None, None
    for f, wt, v, _ in _fields_py(rec):
        if f == 1 and wt == 2:  # features
            for f2, wt2, entry, _ in _fields_py(v):
                if f2 == 1 and wt2 == 2:
                    key, feat = None, None
                    for f3, wt3, v3, _ in _fields_py(entry):
                        if f3 == 1 and wt3 == 2:
                            key = v3.decode()
                        elif f3 == 2 and wt3 == 2:
                            feat = v3
                    if key == bytes_key and feat is not None:
                        for f4, wt4, v4, _ in _fields_py(feat):
                            if f4 == 1 and wt4 == 2:  # bytes_list
                                for f5, wt5, v5, _ in _fields_py(v4):
                                    if f5 == 1 and wt5 == 2:
                                        data = v5
                    elif key == shape_key and feat is not None:
                        shape = _parse_int64_list(feat)
                    elif label_key is not None and key == label_key and feat is not None:
                        label = _parse_int64_list(feat)
    if label_key is not None:
        return data, shape, label
    return data, shape


def shard_paths_for_rank(paths: Sequence[str], rank: int, world_size: int) -> List[str]:
    """Per-rank TFRecord shard assignment (dataloader.py:53-67): requires
    len(paths) % world_size == 0, round-robin by part index."""
    if len(paths) % world_size != 0:
        raise ValueError(f"{len(paths)} shards not divisible by world_size {world_size}")
    return [p for i, p in enumerate(sorted(paths)) if i % world_size == rank]


def load_uint8_images(paths: Sequence[str], channels: int = 3,
                      bytes_key: str = "data", shape_key: str = "shape") -> np.ndarray:
    """Read CHW uint8 image records (the reference's per-LOD layout,
    dataloader.py:92-96) and return NHWC uint8."""
    out = []
    for p in paths:
        for data, shape in TFRecordFile(p).examples(bytes_key, shape_key):
            arr = np.frombuffer(data, np.uint8)
            if shape is not None and len(shape) == 3:
                arr = arr.reshape(shape)            # CHW
            else:
                side = int(round((arr.size / channels) ** 0.5))
                arr = arr.reshape(channels, side, side)
            out.append(arr.transpose(1, 2, 0))      # -> HWC
    return np.stack(out)
