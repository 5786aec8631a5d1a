"""Pure-stdlib Avro Object Container File codec (reader + writer).

Closes the format-coverage gap the round-9 review carried ("no Avro
ingestion — the distribution ships avro core jars but not spark-avro;
installs are out of contract"): the Avro 1.x binary encoding and
container layout are a public Apache specification and, for the
primitive types a tabular estate actually lands in Avro (long, double,
string, and nullable unions of them), the codec is small enough to
implement exactly from the spec with nothing beyond ``struct``,
``json`` and ``zlib``:

* **Binary encoding** — int/long: ZIGZAG VARINT (little-endian 7-bit
  groups, high bit = continuation); double: 8-byte little-endian IEEE
  754; string/bytes: varint byte-length prefix + payload; union:
  varint branch index + the branch's encoding; null: zero bytes.
* **Container layout** — magic ``Obj\\x01``; a file-metadata map
  (``avro.schema`` = the JSON schema, ``avro.codec``); a 16-byte sync
  marker; then data blocks, each ``(record count, byte size,
  [compressed] payload, sync marker)``. ``null`` and ``deflate``
  codecs are implemented (deflate = RFC 1951 raw deflate, zlib with
  wbits=-15 per the spec); ``snappy`` is rejected loudly (no runtime
  here).

Scale design: blocks are the SPLIT UNIT. ``block_index`` walks a
file's block headers (seek + two varints per block — metadata-bytes
I/O, records are never decoded) and returns (offset, n_records,
payload_size) per block, which is exactly what a distributed scan
schedules on — see ``sources/avro_source.py``, which maps one Spark
InputPartition to a run of blocks so scan parallelism = block count,
the same property that makes parquet row groups and ORC stripes
splittable. At estate scale a deployment would deploy the spark-avro
module; this connector is the in-contract path and carries the same
split semantics.

Supported schema subset (checked loudly): a top-level ``record`` whose
fields are ``long``, ``int`` (decoded as Python int either way),
``double``, ``string``, ``boolean``, or a 2-branch nullable union
``["null", <one of those>]``. Anything else raises at plan time — a
silent partial decode is worse than no reader.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator

MAGIC = b"Obj\x01"
_PRIMITIVES = {"long", "int", "double", "string", "boolean"}


# ---------------------------------------------------------------------------
# primitive binary encoding (Avro spec §Binary Encoding)
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1) | 1
    # the arithmetic form above is branch-duplicated for clarity; both
    # branches equal the spec's (n << 1) ^ (n >> 63) on 64-bit ints
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_value(v, typ) -> bytes:
    if isinstance(typ, list):  # nullable union ["null", X]
        if v is None:
            return _zigzag_encode(typ.index("null"))
        other = typ[1] if typ[0] == "null" else typ[0]
        return _zigzag_encode(typ.index(other)) + _encode_value(v, other)
    if typ in ("long", "int"):
        v = int(v)
        bits = 63 if typ == "long" else 31
        if not -(1 << bits) <= v < (1 << bits):
            # an unbounded Python int zigzag-encodes to an 11+-byte
            # varint this reader happily round-trips but spec-conformant
            # readers (spark-avro, fastavro) reject — fail at write time
            # instead of shipping nonconformant files (r10 ADVICE)
            raise ValueError(
                f"value {v} out of range for Avro {typ!r} "
                f"([-2^{bits}, 2^{bits}) two's complement)"
            )
        return _zigzag_encode(v)
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    raise ValueError(f"unsupported Avro type {typ!r}")


def _decode_value(buf: memoryview, pos: int, typ):
    if isinstance(typ, list):
        branch, pos = _zigzag_decode(buf, pos)
        # Python's negative indexing would silently decode the WRONG
        # branch on a corrupt index; out-of-range crashes with a bare
        # IndexError — both become the pointed error
        if not 0 <= branch < len(typ):
            raise ValueError(
                f"Avro union branch {branch} out of range "
                f"(union has {len(typ)} branches)"
            )
        t = typ[branch]
        if t == "null":
            return None, pos
        return _decode_value(buf, pos, t)
    if typ in ("long", "int"):
        return _zigzag_decode(buf, pos)
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "string":
        n, pos = _zigzag_decode(buf, pos)
        # a negative length would silently yield an empty slice and
        # move pos backward (r11 ADVICE) — corrupt data, fail loudly
        if n < 0:
            raise ValueError(f"negative Avro string length {n}")
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    raise ValueError(f"unsupported Avro type {typ!r}")


def _skip_value(buf: memoryview, pos: int, typ) -> int:
    """Advance past one encoded value WITHOUT materializing it — the
    projection fast path for columns the caller did not request (a row
    format cannot prune I/O, but it CAN skip the per-value work:
    strings seek past their length prefix instead of paying the UTF-8
    decode, doubles/booleans are fixed-width hops). Used by the
    ``columns`` option on the pyavro source."""
    if isinstance(typ, list):
        branch, pos = _zigzag_decode(buf, pos)
        if not 0 <= branch < len(typ):
            raise ValueError(
                f"Avro union branch {branch} out of range "
                f"(union has {len(typ)} branches)"
            )
        t = typ[branch]
        return pos if t == "null" else _skip_value(buf, pos, t)
    if typ in ("long", "int"):
        while buf[pos] & 0x80:
            pos += 1
        return pos + 1
    if typ == "double":
        return pos + 8
    if typ == "string":
        n, pos = _zigzag_decode(buf, pos)
        if n < 0:
            raise ValueError(f"negative Avro string length {n}")
        return pos + n
    if typ == "boolean":
        return pos + 1
    raise ValueError(f"unsupported Avro type {typ!r}")


def _field_types(schema: dict) -> list[tuple[str, object]]:
    """Validate the schema against the supported subset and return the
    ordered (name, type) list."""
    if schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    out = []
    for f in schema["fields"]:
        t = f["type"]
        ok = (isinstance(t, str) and t in _PRIMITIVES) or (
            isinstance(t, list)
            and len(t) == 2
            and "null" in t
            and next(x for x in t if x != "null") in _PRIMITIVES
        )
        if not ok:
            raise ValueError(
                f"field {f['name']!r}: unsupported Avro type {t!r} "
                f"(supported: {sorted(_PRIMITIVES)} and nullable unions of them)"
            )
        out.append((f["name"], t))
    return out


# ---------------------------------------------------------------------------
# container writer
# ---------------------------------------------------------------------------


def write_avro(
    rows: list[dict],
    schema: dict,
    path: str,
    *,
    codec: str = "null",
    block_records: int = 1000,
    extra_meta: dict[str, bytes] | None = None,
) -> None:
    """Write an Avro object container file. The sync marker is derived
    deterministically from (schema, path) so fixture bytes are
    reproducible run-to-run (the repo's fixture discipline).
    ``extra_meta`` adds application metadata pairs (the spec reserves
    only the ``avro.`` prefix) — also how the reader's oversized-header
    path is exercised in tests."""
    import hashlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r} (null/deflate)")
    for k in extra_meta or {}:
        if k.startswith("avro."):
            raise ValueError(
                f"extra_meta key {k!r} uses the reserved 'avro.' prefix"
            )
    fields = _field_types(schema)
    sync = hashlib.md5(
        (json.dumps(schema, sort_keys=True) + "|" + path).encode()
    ).digest()
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
        **(extra_meta or {}),
    }
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        fh.write(_zigzag_encode(len(meta)))
        for k, v in sorted(meta.items()):
            kk = k.encode()
            fh.write(_zigzag_encode(len(kk)) + kk)
            fh.write(_zigzag_encode(len(v)) + v)
        fh.write(_zigzag_encode(0))  # end of metadata map
        fh.write(sync)
        for start in range(0, len(rows), block_records):
            chunk = rows[start : start + block_records]
            body = b"".join(
                b"".join(_encode_value(r[name], t) for name, t in fields)
                for r in chunk
            )
            if codec == "deflate":
                co = zlib.compressobj(9, zlib.DEFLATED, -15)
                body = co.compress(body) + co.flush()
            fh.write(_zigzag_encode(len(chunk)))
            fh.write(_zigzag_encode(len(body)))
            fh.write(body)
            fh.write(sync)


# ---------------------------------------------------------------------------
# container reader
# ---------------------------------------------------------------------------


class _TruncatedHeader(Exception):
    """Internal: the metadata map runs past the bytes read so far —
    read_header's incremental loop reads more (or raises pointedly at
    end of file)."""


def _header_varint(mv: memoryview, pos: int) -> tuple[int, int]:
    try:
        return _zigzag_decode(mv, pos)
    except IndexError:
        raise _TruncatedHeader from None


def _parse_meta_map(mv: memoryview) -> tuple[dict[str, bytes], int]:
    """Parse the file-metadata map from offset 0 of ``mv`` → (meta,
    end_pos). Raises _TruncatedHeader when the map needs bytes beyond
    the view (over-long memoryview slices DON'T raise — they silently
    truncate — so the bounds are checked explicitly)."""
    meta: dict[str, bytes] = {}
    pos = 0
    while True:
        n, pos = _header_varint(mv, pos)
        if n == 0:
            return meta, pos
        # the count CAN be negative in the spec (block-size form) —
        # reject it loudly rather than mis-parse (never produced by
        # mainstream writers for the header map)
        if n < 0:
            raise ValueError("negative-count metadata blocks unsupported")
        for _ in range(n):
            kl, pos = _header_varint(mv, pos)
            # negative lengths pass the upper-bound check (pos + kl <
            # pos) and would walk POS BACKWARD — a corrupt or hostile
            # header could cycle the parse loop forever (r11 ADVICE);
            # mirror the negative-count rejection above
            if kl < 0:
                raise ValueError(f"negative metadata key length {kl}")
            if pos + kl > len(mv):
                raise _TruncatedHeader
            k = bytes(mv[pos : pos + kl]).decode()
            pos += kl
            vl, pos = _header_varint(mv, pos)
            if vl < 0:
                raise ValueError(f"negative metadata value length {vl}")
            if pos + vl > len(mv):
                raise _TruncatedHeader
            meta[k] = bytes(mv[pos : pos + vl])
            pos += vl


def read_header(fh: io.BufferedReader) -> tuple[dict, str, bytes, int]:
    """Parse the container header → (schema, codec, sync, data_start).

    The metadata map is read INCREMENTALLY (64 KiB chunks) until its
    zero-count terminator: a wide schema or a foreign writer's extra
    metadata keys can exceed any fixed guess, and the old fixed 64 KiB
    read surfaced that as an IndexError inside the varint decoder — or
    worse, a silently truncated value slice (r10 ADVICE). A map that
    runs past end-of-file now raises a pointed ValueError instead."""
    head = fh.read(4)
    if head != MAGIC:
        raise ValueError(
            f"not an Avro object container file (magic {head!r} != 'Obj\\x01')"
        )
    buf = b""
    while True:
        chunk = fh.read(1 << 16)
        buf += chunk
        try:
            meta, pos = _parse_meta_map(memoryview(buf))
            break
        except _TruncatedHeader:
            if not chunk:
                raise ValueError(
                    "truncated Avro header: metadata map runs past "
                    "end of file"
                ) from None
    if pos + 16 > len(buf):  # sync marker may straddle the last chunk
        buf += fh.read(pos + 16 - len(buf))
        if pos + 16 > len(buf):
            raise ValueError("truncated Avro header: missing sync marker")
    sync = bytes(buf[pos : pos + 16])
    data_start = 4 + pos + 16
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r} (null/deflate)")
    return schema, codec, sync, data_start


def header_of(path: str) -> tuple[dict, str, bytes, int]:
    """One metadata-only header read of ``path`` — what schema
    discovery needs. (block_index walks EVERY block header; doing that
    three times per load for schema alone was the r10 ADVICE 3×
    metadata-I/O finding.)"""
    with open(path, "rb") as fh:
        return read_header(fh)


def block_index(path: str) -> tuple[dict, str, bytes, list[tuple[int, int, int]]]:
    """Walk the block headers only (two varints + a seek per block —
    no record decode): returns (schema, codec, sync, blocks) with
    blocks = [(file_offset_of_block, n_records, payload_bytes), ...].
    This is the planning-time scan a distributed reader schedules
    partitions from."""
    blocks: list[tuple[int, int, int]] = []
    with open(path, "rb") as fh:
        schema, codec, sync, pos = read_header(fh)
        fh.seek(0, 2)
        end = fh.tell()
        fh.seek(pos)
        while pos < end:
            head = fh.read(20)  # two varints fit comfortably in 20 bytes
            if not head:
                break
            mv = memoryview(head)
            n, p = _zigzag_decode(mv, 0)
            size, p = _zigzag_decode(mv, p)
            # a negative size makes `pos + p + size + 16` a no-op (or
            # backward walk) — the block walk would loop forever on a
            # corrupt container; negative counts are the same class
            # (the _parse_meta_map negative-length rule)
            if n < 0 or size < 0:
                raise ValueError(
                    f"negative Avro block header at offset {pos} "
                    f"(count={n}, size={size})"
                )
            blocks.append((pos, n, size))
            pos = pos + p + size + 16  # payload + sync marker
            fh.seek(pos)
    return schema, codec, sync, blocks


def read_block(
    path: str,
    offset: int,
    fields: list[tuple[str, object]],
    codec: str,
    sync: bytes,
    keep: list[bool] | None = None,
) -> Iterator[tuple]:
    """Decode one block's records as tuples in field order. The trailing
    sync marker is VERIFIED — a torn or mis-offset block fails loudly
    instead of yielding shifted garbage. ``keep`` (parallel to
    ``fields``) selects which columns are materialized; unselected ones
    are length-seeked past (:func:`_skip_value`) and omitted from the
    yielded tuples."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        head = memoryview(fh.read(20))
        n, p = _zigzag_decode(head, 0)
        size, p = _zigzag_decode(head, p)
        # range(n) over a corrupt negative count would yield ZERO rows
        # silently — data loss with no error (block_index has the same
        # guard for its seek arithmetic)
        if n < 0 or size < 0:
            raise ValueError(
                f"negative Avro block header at offset {offset} "
                f"(count={n}, size={size})"
            )
        fh.seek(offset + p)
        body = fh.read(size)
        marker = fh.read(16)
    if marker != sync:
        raise ValueError(f"sync marker mismatch at block offset {offset}")
    if codec == "deflate":
        body = zlib.decompress(body, -15)
    mv = memoryview(body)
    pos = 0
    for _ in range(n):
        row = []
        for i, (_, t) in enumerate(fields):
            if keep is None or keep[i]:
                v, pos = _decode_value(mv, pos, t)
                row.append(v)
            else:
                pos = _skip_value(mv, pos, t)
        yield tuple(row)


def avro_schema_to_ddl(schema: dict, columns: list[str] | None = None) -> str:
    """Map the supported Avro subset to a Spark DDL schema string.
    ``columns`` restricts the output to those field names (FILE field
    order is preserved, matching the keep-masked tuples read_block
    yields); unknown names raise."""
    ddl = {"long": "bigint", "int": "bigint", "double": "double",
           "string": "string", "boolean": "boolean"}

    def one(t) -> str:
        if isinstance(t, list):
            return one(next(x for x in t if x != "null"))
        return ddl[t]

    fields = _field_types(schema)
    if columns is not None:
        names = {n for n, _ in fields}
        unknown = sorted(set(columns) - names)
        if unknown:
            raise ValueError(
                f"columns {unknown} not in Avro schema "
                f"(has {sorted(names)})"
            )
        fields = [(n, t) for n, t in fields if n in set(columns)]
    return ", ".join(f"{n} {one(t)}" for n, t in fields)
