"""Self-contained TensorBoard event-file writer (no tensorboard dependency).

The reference logs per-iteration scalars and eval image panels through
`torch.utils.tensorboard.SummaryWriter` (/root/reference/train_tensoIR.py:153,
328-334; /root/reference/renderer.py:443-452). This image has neither the
tensorboard package nor torchvision, so this module implements the event-file
format directly:

* TFRecord framing: <u64 length LE> <u32 masked-crc32c(length)> <payload>
  <u32 masked-crc32c(payload)>, mask(c) = ((c >> 15) | (c << 17)) + 0xa282ead8.
* Protobuf wire encoding (varints + length-delimited fields) for the
  tensorflow `Event` / `Summary` / `Summary.Image` messages.
* A minimal zlib-based PNG encoder for image summaries.

Files written here load in any standard TensorBoard install; `read_events`
provides a parser for offline inspection (and the round-trip test).
"""
from __future__ import annotations

import os
import socket
import struct
import time
import zlib
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------- crc32c

_CRC32C_POLY = 0x82F63B78
_CRC_TABLE: List[int] = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ _CRC32C_POLY if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------- protobuf encoding

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _tag_varint(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(value)


def _tag_bytes(field: int, value: bytes) -> bytes:
    return _key(field, 2) + _varint(len(value)) + value


def _tag_float(field: int, value: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", value)


def _tag_double(field: int, value: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", value)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder: uint8 [H, W, 3] (RGB) or [H, W] (grayscale)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    h, w, _ = img.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def _summary_value_scalar(tag: str, value: float) -> bytes:
    return _tag_bytes(1, _tag_bytes(1, tag.encode())
                      + _tag_float(2, float(value)))


def _summary_value_image(tag: str, img: np.ndarray) -> bytes:
    img = np.asarray(img)
    h, w = img.shape[:2]
    png = encode_png(img)
    image_msg = (_tag_varint(1, h) + _tag_varint(2, w)
                 + _tag_varint(3, 3) + _tag_bytes(4, png))
    return _tag_bytes(1, _tag_bytes(1, tag.encode()) + _tag_bytes(4, image_msg))


def _event(step: Optional[int] = None, summary: Optional[bytes] = None,
           file_version: Optional[str] = None,
           wall_time: Optional[float] = None) -> bytes:
    msg = _tag_double(1, wall_time if wall_time is not None else time.time())
    if step is not None:
        msg += _tag_varint(2, int(step))
    if file_version is not None:
        msg += _tag_bytes(3, file_version.encode())
    if summary is not None:
        msg += _tag_bytes(5, summary)
    return msg


# --------------------------------------------------------------- writer

class EventWriter:
    """Append-only TensorBoard event file in `log_dir`."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        fname = (f"events.out.tfevents.{int(time.time())}."
                 f"{socket.gethostname()}")
        self._path = os.path.join(log_dir, fname)
        self._f = open(self._path, "ab")
        self._write(_event(file_version="brain.Event:2"))

    @property
    def path(self) -> str:
        return self._path

    def _write(self, payload: bytes) -> None:
        hdr = struct.pack("<Q", len(payload))
        self._f.write(hdr + struct.pack("<I", _masked_crc(hdr))
                      + payload + struct.pack("<I", _masked_crc(payload)))

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._write(_event(step=step,
                           summary=_summary_value_scalar(tag, value)))

    def add_scalars(self, values: Dict[str, float], step: int,
                    prefix: str = "") -> None:
        summary = b"".join(
            _summary_value_scalar(prefix + k, v) for k, v in values.items())
        self._write(_event(step=step, summary=summary))

    def add_image(self, tag: str, img: np.ndarray, step: int) -> None:
        """img: [H, W, 3] float in [0,1] or uint8."""
        self._write(_event(step=step, summary=_summary_value_image(tag, img)))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.flush()
        self._f.close()


# --------------------------------------------------------------- reader

def _decode_fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, raw_value_bytes)."""
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            val = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                val |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield field, wire, _varint(val)
        elif wire == 1:
            yield field, wire, buf[i:i + 8]
            i += 8
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield field, wire, buf[i:i + ln]
            i += ln
        elif wire == 5:
            yield field, wire, buf[i:i + 4]
            i += 4
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")


def _varint_value(raw: bytes) -> int:
    val = 0
    shift = 0
    for b in raw:
        val |= (b & 0x7F) << shift
        shift += 7
    return val


def read_events(path: str, check_crc: bool = True) -> List[Dict]:
    """Parse an event file back into dicts (round-trip test / inspection).

    Returns a list of {step, wall_time, scalars: {tag: val},
    images: {tag: (h, w, png_bytes)}, file_version?}.
    """
    events = []
    with open(path, "rb") as f:
        data = f.read()
    i = 0
    while i < len(data):
        (length,) = struct.unpack_from("<Q", data, i)
        hdr = data[i:i + 8]
        (hdr_crc,) = struct.unpack_from("<I", data, i + 8)
        payload = data[i + 12:i + 12 + length]
        (pay_crc,) = struct.unpack_from("<I", data, i + 12 + length)
        if check_crc:
            assert _masked_crc(hdr) == hdr_crc, "header crc mismatch"
            assert _masked_crc(payload) == pay_crc, "payload crc mismatch"
        i += 12 + length + 4

        ev: Dict = {"scalars": {}, "images": {}}
        for field, wire, raw in _decode_fields(payload):
            if field == 1 and wire == 1:
                ev["wall_time"] = struct.unpack("<d", raw)[0]
            elif field == 2 and wire == 0:
                ev["step"] = _varint_value(raw)
            elif field == 3 and wire == 2:
                ev["file_version"] = raw.decode()
            elif field == 5 and wire == 2:
                for f2, w2, raw2 in _decode_fields(raw):
                    if f2 != 1:
                        continue
                    tag, sval, img = None, None, None
                    for f3, w3, raw3 in _decode_fields(raw2):
                        if f3 == 1 and w3 == 2:
                            tag = raw3.decode()
                        elif f3 == 2 and w3 == 5:
                            sval = struct.unpack("<f", raw3)[0]
                        elif f3 == 4 and w3 == 2:
                            h = w = 0
                            png = b""
                            for f4, w4, raw4 in _decode_fields(raw3):
                                if f4 == 1:
                                    h = _varint_value(raw4)
                                elif f4 == 2:
                                    w = _varint_value(raw4)
                                elif f4 == 4:
                                    png = raw4
                            img = (h, w, png)
                    if tag is not None and sval is not None:
                        ev["scalars"][tag] = sval
                    if tag is not None and img is not None:
                        ev["images"][tag] = img
        events.append(ev)
    return events
