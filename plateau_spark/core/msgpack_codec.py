"""Pure-Python msgpack + zstd codec for reference-interop commit files.

The reference engine stores dataset metadata either as JSON or as a
zstd-compressed msgpack blob under
``<uuid>.by-dataset-metadata.msgpack.zstd``
(/root/reference/plateau/core/naming.py:12-13,
/root/reference/plateau/core/_zmsgpack.py — behavior reference only).
This container ships neither the ``msgpack`` nor the ``zstandard``
package, so interop is built from public specs instead:

- msgpack: implemented directly from the public format spec
  (https://github.com/msgpack/msgpack/blob/master/spec.md). Only the
  types a metadata document uses are supported — nil, bool, int,
  float64, str, bin, array, map — which is the complete set the
  reference's simplejson-equivalent documents can contain.
- zstd: pyarrow's bundled codec does the heavy lifting; pyarrow needs
  the decompressed size up front, which the zstd frame header carries
  (RFC 8878 §3.1.1: Frame_Content_Size is present whenever the writer
  knows the size — the reference compresses whole buffers with
  ``write_content_size=True``, and pyarrow's one-shot compressor also
  embeds it).
"""

from __future__ import annotations

import struct
from typing import Any

import pyarrow as pa

# ---------------------------------------------------------------------------
# msgpack encode
# ---------------------------------------------------------------------------


def packb(obj: Any) -> bytes:
    buf = bytearray()
    _pack(obj, buf)
    return bytes(buf)


def _pack(o: Any, buf: bytearray) -> None:
    if o is None:
        buf.append(0xC0)
    elif o is True:
        buf.append(0xC3)
    elif o is False:
        buf.append(0xC2)
    elif isinstance(o, int):
        _pack_int(o, buf)
    elif isinstance(o, float):
        buf.append(0xCB)
        buf += struct.pack(">d", o)
    elif isinstance(o, str):
        raw = o.encode("utf-8")
        n = len(raw)
        if n < 32:
            buf.append(0xA0 | n)
        elif n < 1 << 8:
            buf += bytes((0xD9, n))
        elif n < 1 << 16:
            buf.append(0xDA)
            buf += struct.pack(">H", n)
        else:
            buf.append(0xDB)
            buf += struct.pack(">I", n)
        buf += raw
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n < 1 << 8:
            buf += bytes((0xC4, n))
        elif n < 1 << 16:
            buf.append(0xC5)
            buf += struct.pack(">H", n)
        else:
            buf.append(0xC6)
            buf += struct.pack(">I", n)
        buf += o
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n < 16:
            buf.append(0x90 | n)
        elif n < 1 << 16:
            buf.append(0xDC)
            buf += struct.pack(">H", n)
        else:
            buf.append(0xDD)
            buf += struct.pack(">I", n)
        for item in o:
            _pack(item, buf)
    elif isinstance(o, dict):
        n = len(o)
        if n < 16:
            buf.append(0x80 | n)
        elif n < 1 << 16:
            buf.append(0xDE)
            buf += struct.pack(">H", n)
        else:
            buf.append(0xDF)
            buf += struct.pack(">I", n)
        for k, v in o.items():
            _pack(k, buf)
            _pack(v, buf)
    else:
        raise TypeError(f"msgpack: unsupported type {type(o).__name__}")


def _pack_int(o: int, buf: bytearray) -> None:
    if 0 <= o < 128:
        buf.append(o)
    elif -32 <= o < 0:
        buf.append(o & 0xFF)
    elif 0 <= o < 1 << 8:
        buf += bytes((0xCC, o))
    elif 0 <= o < 1 << 16:
        buf.append(0xCD)
        buf += struct.pack(">H", o)
    elif 0 <= o < 1 << 32:
        buf.append(0xCE)
        buf += struct.pack(">I", o)
    elif 0 <= o < 1 << 64:
        buf.append(0xCF)
        buf += struct.pack(">Q", o)
    elif -(1 << 7) <= o < 0:
        buf.append(0xD0)
        buf += struct.pack(">b", o)
    elif -(1 << 15) <= o < 0:
        buf.append(0xD1)
        buf += struct.pack(">h", o)
    elif -(1 << 31) <= o < 0:
        buf.append(0xD2)
        buf += struct.pack(">i", o)
    elif -(1 << 63) <= o < 0:
        buf.append(0xD3)
        buf += struct.pack(">q", o)
    else:
        raise OverflowError(f"msgpack: int out of 64-bit range: {o}")


# ---------------------------------------------------------------------------
# msgpack decode
# ---------------------------------------------------------------------------


def unpackb(data: bytes) -> Any:
    obj, pos = _unpack(memoryview(data), 0)
    if pos != len(data):
        raise ValueError(f"msgpack: {len(data) - pos} trailing bytes")
    return obj


def _unpack(mv: memoryview, pos: int):
    b = mv[pos]
    pos += 1
    if b < 0x80:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b < 0x90:  # fixmap
        return _unpack_map(mv, pos, b & 0x0F)
    if 0x90 <= b < 0xA0:  # fixarray
        return _unpack_array(mv, pos, b & 0x0F)
    if 0xA0 <= b < 0xC0:  # fixstr
        n = b & 0x1F
        return str(mv[pos : pos + n], "utf-8"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        n, pos = _read_len(mv, pos, (1, 2, 4)[b - 0xC4])
        return bytes(mv[pos : pos + n]), pos + n
    if b == 0xCA:
        return struct.unpack_from(">f", mv, pos)[0], pos + 4
    if b == 0xCB:
        return struct.unpack_from(">d", mv, pos)[0], pos + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        n = (1, 2, 4, 8)[b - 0xCC]
        return int.from_bytes(mv[pos : pos + n], "big"), pos + n
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        n = (1, 2, 4, 8)[b - 0xD0]
        return int.from_bytes(mv[pos : pos + n], "big", signed=True), pos + n
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        n, pos = _read_len(mv, pos, (1, 2, 4)[b - 0xD9])
        return str(mv[pos : pos + n], "utf-8"), pos + n
    if b in (0xDC, 0xDD):  # array 16/32
        n, pos = _read_len(mv, pos, (2, 4)[b - 0xDC])
        return _unpack_array_n(mv, pos, n)
    if b in (0xDE, 0xDF):  # map 16/32
        n, pos = _read_len(mv, pos, (2, 4)[b - 0xDE])
        return _unpack_map_n(mv, pos, n)
    raise ValueError(f"msgpack: unsupported type byte 0x{b:02x}")


def _read_len(mv: memoryview, pos: int, nbytes: int):
    return int.from_bytes(mv[pos : pos + nbytes], "big"), pos + nbytes


def _unpack_array(mv, pos, n):
    return _unpack_array_n(mv, pos, n)


def _unpack_array_n(mv, pos, n):
    out = []
    for _ in range(n):
        item, pos = _unpack(mv, pos)
        out.append(item)
    return out, pos


def _unpack_map(mv, pos, n):
    return _unpack_map_n(mv, pos, n)


def _unpack_map_n(mv, pos, n):
    out = {}
    for _ in range(n):
        k, pos = _unpack(mv, pos)
        v, pos = _unpack(mv, pos)
        out[k] = v
    return out, pos


# ---------------------------------------------------------------------------
# zstd (pyarrow codec + RFC 8878 frame-header parse for the content size)
# ---------------------------------------------------------------------------

_ZSTD_MAGIC = 0xFD2FB528


def _zstd_content_size(frame: bytes) -> int:
    """Frame_Content_Size from the zstd frame header (RFC 8878 §3.1.1)."""
    if len(frame) < 6 or struct.unpack_from("<I", frame, 0)[0] != _ZSTD_MAGIC:
        raise ValueError("not a zstd frame")
    fhd = frame[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    did_flag = fhd & 0x03
    pos = 5
    if not single_segment:
        pos += 1  # Window_Descriptor
    pos += (0, 1, 2, 4)[did_flag]  # Dictionary_ID
    if fcs_flag == 0:
        if single_segment:
            return frame[pos]
        raise ValueError(
            "zstd frame carries no content size (streaming writer?) — "
            "cannot decompress with pyarrow; re-write the metadata file "
            "with a one-shot compressor"
        )
    if fcs_flag == 1:
        return struct.unpack_from("<H", frame, pos)[0] + 256
    if fcs_flag == 2:
        return struct.unpack_from("<I", frame, pos)[0]
    return struct.unpack_from("<Q", frame, pos)[0]


def pack_zstd(obj: Any) -> bytes:
    """obj → zstd(msgpack(obj)) — the reference's .msgpack.zstd layout."""
    raw = packb(obj)
    return bytes(pa.Codec("zstd").compress(raw, asbytes=True))


def unpack_zstd(data: bytes) -> Any:
    """zstd(msgpack(obj)) → obj."""
    size = _zstd_content_size(data)
    raw = pa.Codec("zstd").decompress(data, size)
    return unpackb(bytes(raw))
