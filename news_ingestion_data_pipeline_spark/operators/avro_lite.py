"""Minimal clean-room Avro Object Container File codec.

Implements exactly the subset of the public Avro 1.x specification
(https://avro.apache.org/docs/current/specification/) that Iceberg
metadata needs: the container framing (magic ``Obj\\x01``, file-metadata
map carrying ``avro.schema``/``avro.codec``, sync-marker-delimited data
blocks) and the binary encoding of records, strings, bytes, int/long
(zigzag varint), boolean, float/double, null, arrays, maps and unions.
Codecs ``null`` and ``deflate`` (raw RFC-1951 block bodies, per the
spec's "required codecs") — Spark/Flink/Trino write Iceberg metadata
deflate-compressed by default, so foreign-written tables parse too.

No Avro library is used or required; the generic reader walks the
writer schema embedded in the file header, so it reads any container
file within the supported type subset, not just ones this module wrote.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    u = 0
    while True:
        (b,) = buf.read(1)
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _write_bytes(v: bytes) -> bytes:
    return _zigzag_encode(len(v)) + v


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _zigzag_decode(buf)
    return buf.read(n)


# ---------------------------------------------------------------------------
# schema-driven value codec
# ---------------------------------------------------------------------------


def _encode(schema, value) -> bytes:
    if isinstance(schema, str):
        kind = schema
    elif isinstance(schema, list):  # union: emit branch index + value
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if value is None and bt == "null":
                return _zigzag_encode(i)
            if value is not None and bt != "null":
                return _zigzag_encode(i) + _encode(branch, value)
        raise ValueError(f"no union branch for {value!r} in {schema}")
    else:
        kind = schema["type"]

    if kind == "null":
        return b""
    if kind == "boolean":
        return b"\x01" if value else b"\x00"
    if kind in ("int", "long"):
        return _zigzag_encode(int(value))
    if kind == "float":
        return struct.pack("<f", value)
    if kind == "double":
        return struct.pack("<d", value)
    if kind == "string":
        return _write_bytes(value.encode("utf-8"))
    if kind == "bytes":
        return _write_bytes(value)
    if kind == "record":
        out = b""
        for f in schema["fields"]:
            out += _encode(f["type"], value[f["name"]])
        return out
    if kind == "array":
        out = b""
        items = list(value)
        if items:
            out += _zigzag_encode(len(items))
            for it in items:
                out += _encode(schema["items"], it)
        return out + _zigzag_encode(0)
    if kind == "map":
        out = b""
        if value:
            out += _zigzag_encode(len(value))
            for k, v in value.items():
                out += _write_bytes(k.encode("utf-8"))
                out += _encode(schema["values"], v)
        return out + _zigzag_encode(0)
    raise ValueError(f"unsupported avro type {kind!r}")


def _decode(schema, buf: io.BytesIO):
    if isinstance(schema, str):
        kind = schema
    elif isinstance(schema, list):
        idx = _zigzag_decode(buf)
        return _decode(schema[idx], buf)
    else:
        kind = schema["type"]

    if kind == "null":
        return None
    if kind == "boolean":
        return buf.read(1) == b"\x01"
    if kind in ("int", "long"):
        return _zigzag_decode(buf)
    if kind == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if kind == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if kind == "string":
        return _read_bytes(buf).decode("utf-8")
    if kind == "bytes":
        return _read_bytes(buf)
    if kind == "record":
        return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
    if kind == "array":
        out = []
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec-legal form)
                _zigzag_decode(buf)
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], buf))
    if kind == "map":
        out = {}
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:
                _zigzag_decode(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf)
    raise ValueError(f"unsupported avro type {kind!r}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def write_container(
    path: str, schema: dict, records: list[dict], codec: str = "null"
) -> None:
    """Write records as one Avro Object Container File (codec ``null``
    or ``deflate``)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = os.urandom(16)
    body = b"".join(_encode(schema, r) for r in records)
    if codec == "deflate":
        # spec: deflate block bodies are raw RFC-1951 (no zlib header)
        z = zlib.compressobj(wbits=-15)
        body = z.compress(body) + z.flush()
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("ascii"),
        }
        fh.write(
            _encode(
                {"type": "map", "values": "bytes"},
                meta,
            )
        )
        fh.write(sync)
        if records:
            fh.write(_zigzag_encode(len(records)))
            fh.write(_zigzag_encode(len(body)))
            fh.write(body)
            fh.write(sync)


def read_container(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro container file -> (writer schema, records)."""
    with open(path, "rb") as fh:
        raw = fh.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"not an Avro container file: {path}")
    meta = _decode({"type": "map", "values": "bytes"}, buf)
    codec = meta.get("avro.codec", b"null") or b"null"
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = buf.read(16)
    records: list[dict] = []
    while buf.tell() < len(raw):
        n = _zigzag_decode(buf)
        size = _zigzag_decode(buf)
        body = buf.read(size)
        if codec == b"deflate":
            body = zlib.decompress(body, -15)  # raw RFC-1951 per spec
        bbuf = io.BytesIO(body)
        for _ in range(n):
            records.append(_decode(schema, bbuf))
        block_sync = buf.read(16)
        if block_sync != sync:
            raise ValueError(f"sync marker mismatch in {path}")
    return schema, records
