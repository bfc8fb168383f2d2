"""Per-event wire codecs for the message-serde mappers
(SURVEY.md §3.1): avro, protobuf, and Siddhi's binary format, as pure
python over flat records of the seven Siddhi attribute types.

Upstream these are `[ext:map-avro] AvroSourceMapper/AvroSinkMapper`,
`[ext:map-protobuf] ProtobufSourceMapper`, and `[ext:map-binary]
BinarySourceMapper` — all per-message converters applied to transport
payloads (kafka values, tcp frames). On a Spark cluster with the
spark-avro / spark-protobuf packages loaded the JVM expressions
(`from_avro` / `from_protobuf`) replace these codecs one-for-one (the
mapper layer exposes the same declared schema either way); this module
exists so the mappers are genuinely executable — and their wire
formats tested byte-for-byte — without those deploy-time jars.

Encodings implemented:

- **avro binary**: zigzag varints for int/long, little-endian IEEE for
  float/double, 1-byte booleans, varint-length-prefixed UTF-8/bytes —
  a flat non-union record, matching the schema
  ``avro_schema_json`` generates for the declared attributes.
- **protobuf**: field number = attribute position + 1; varint fields
  for int/long/bool (64-bit two's complement for negatives, per proto
  spec), fixed32/fixed64 for float/double, length-delimited for
  string/object. Unknown fields are skipped on decode.
- **siddhi binary**: schema-ordered big-endian fixed-width numerics +
  4-byte-length-prefixed UTF-8 strings (the reference's
  `BinaryEventConverter` layout family).

No Spark imports — executors load this cheaply inside mapInPandas.
"""

from __future__ import annotations

import json
import struct

_I64 = (1 << 64) - 1


# ------------------------------------------------------------------
# varints
# ------------------------------------------------------------------


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


# ------------------------------------------------------------------
# avro
# ------------------------------------------------------------------

_AVRO_TYPES = {
    "string": "string",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "bool": "boolean",
    "object": "bytes",
}


def avro_schema_json(name: str, attributes: list[tuple[str, str]]) -> str:
    """The record schema the JVM swap (`from_avro`) would use for the
    same declared stream."""
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [
                {"name": n, "type": _AVRO_TYPES[t.lower()]} for n, t in attributes
            ],
        }
    )


def avro_encode_record(values, attributes: list[tuple[str, str]]) -> bytes:
    out = bytearray()
    for v, (_n, t) in zip(values, attributes):
        t = t.lower()
        if t in ("int", "long"):
            out += _uvarint(_zigzag(int(v)) & _I64)
        elif t == "float":
            out += struct.pack("<f", float(v))
        elif t == "double":
            out += struct.pack("<d", float(v))
        elif t == "bool":
            out.append(1 if v else 0)
        elif t == "string":
            b = str(v).encode("utf-8")
            out += _uvarint(len(b)) + b
        elif t == "object":
            b = bytes(v)
            out += _uvarint(len(b)) + b
        else:
            raise ValueError(f"avro: unsupported type {t}")
    return bytes(out)


def avro_decode_record(data: bytes, attributes: list[tuple[str, str]]) -> tuple:
    pos = 0
    vals = []
    for _n, t in attributes:
        t = t.lower()
        if t in ("int", "long"):
            u, pos = _read_uvarint(data, pos)
            vals.append(_unzigzag(u))
        elif t == "float":
            (x,) = struct.unpack_from("<f", data, pos)
            vals.append(x)
            pos += 4
        elif t == "double":
            (x,) = struct.unpack_from("<d", data, pos)
            vals.append(x)
            pos += 8
        elif t == "bool":
            vals.append(data[pos] != 0)
            pos += 1
        elif t in ("string", "object"):
            ln, pos = _read_uvarint(data, pos)
            raw = data[pos : pos + ln]
            pos += ln
            vals.append(raw.decode("utf-8") if t == "string" else raw)
        else:
            raise ValueError(f"avro: unsupported type {t}")
    return tuple(vals)


# ------------------------------------------------------------------
# protobuf
# ------------------------------------------------------------------


def proto_encode_record(values, attributes: list[tuple[str, str]]) -> bytes:
    out = bytearray()
    for i, (v, (_n, t)) in enumerate(zip(values, attributes)):
        t = t.lower()
        fnum = i + 1
        if t in ("int", "long", "bool"):
            out += _uvarint(fnum << 3 | 0)
            out += _uvarint(int(v) & _I64)
        elif t == "double":
            out += _uvarint(fnum << 3 | 1)
            out += struct.pack("<d", float(v))
        elif t == "float":
            out += _uvarint(fnum << 3 | 5)
            out += struct.pack("<f", float(v))
        elif t in ("string", "object"):
            b = str(v).encode("utf-8") if t == "string" else bytes(v)
            out += _uvarint(fnum << 3 | 2)
            out += _uvarint(len(b)) + b
        else:
            raise ValueError(f"protobuf: unsupported type {t}")
    return bytes(out)


def proto_decode_record(data: bytes, attributes: list[tuple[str, str]]) -> tuple:
    by_num: dict[int, object] = {}
    pos = 0
    while pos < len(data):
        tag, pos = _read_uvarint(data, pos)
        fnum, wire = tag >> 3, tag & 7
        if wire == 0:
            raw, pos = _read_uvarint(data, pos)
        elif wire == 1:
            raw = struct.unpack_from("<d", data, pos)[0]
            pos += 8
        elif wire == 5:
            raw = struct.unpack_from("<f", data, pos)[0]
            pos += 4
        elif wire == 2:
            ln, pos = _read_uvarint(data, pos)
            raw = data[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"protobuf: unsupported wire type {wire}")
        by_num[fnum] = raw
    vals = []
    for i, (_n, t) in enumerate(attributes):
        t = t.lower()
        raw = by_num.get(i + 1)
        if raw is None:
            # proto3 default for a missing field
            vals.append(
                "" if t == "string" else b"" if t == "object"
                else False if t == "bool" else 0
            )
        elif t in ("int", "long"):
            n = int(raw)
            vals.append(n - (1 << 64) if n >= (1 << 63) else n)
        elif t == "bool":
            vals.append(bool(raw))
        elif t == "string":
            vals.append(bytes(raw).decode("utf-8"))
        elif t == "object":
            vals.append(bytes(raw))
        else:
            vals.append(float(raw))
    return tuple(vals)


# ------------------------------------------------------------------
# siddhi binary
# ------------------------------------------------------------------

_FIXED = {"int": ">i", "long": ">q", "float": ">f", "double": ">d", "bool": ">?"}


def binary_encode_record(values, attributes: list[tuple[str, str]]) -> bytes:
    out = bytearray()
    for v, (_n, t) in zip(values, attributes):
        t = t.lower()
        if t in _FIXED:
            out += struct.pack(_FIXED[t], v if t != "bool" else bool(v))
        elif t in ("string", "object"):
            b = str(v).encode("utf-8") if t == "string" else bytes(v)
            out += struct.pack(">I", len(b)) + b
        else:
            raise ValueError(f"binary: unsupported type {t}")
    return bytes(out)


def binary_decode_record(data: bytes, attributes: list[tuple[str, str]]) -> tuple:
    pos = 0
    vals = []
    for _n, t in attributes:
        t = t.lower()
        if t in _FIXED:
            fmt = _FIXED[t]
            (v,) = struct.unpack_from(fmt, data, pos)
            pos += struct.calcsize(fmt)
            vals.append(v)
        elif t in ("string", "object"):
            (ln,) = struct.unpack_from(">I", data, pos)
            pos += 4
            raw = data[pos : pos + ln]
            pos += ln
            vals.append(raw.decode("utf-8") if t == "string" else raw)
        else:
            raise ValueError(f"binary: unsupported type {t}")
    return tuple(vals)


DECODERS = {
    "avro": avro_decode_record,
    "protobuf": proto_decode_record,
    "binary": binary_decode_record,
}
ENCODERS = {
    "avro": avro_encode_record,
    "protobuf": proto_encode_record,
    "binary": binary_encode_record,
}
