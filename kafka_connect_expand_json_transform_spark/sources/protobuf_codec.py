"""Pure-stdlib Protocol Buffers wire-format codec — [EXT] the jar-free
twin of ``sources/protobuf.py``'s capability gate, mirroring what
``sources/avro_codec.py`` does for Avro.

The reference ecosystem's third converter (after JsonConverter and
AvroConverter) is Confluent's ProtobufConverter — it sits exactly where
ExpandJson runs in a Connect worker (reference readme.md:16).  Spark's
``from_protobuf``/``to_protobuf`` need the external spark-protobuf jar,
absent from this container, so this module implements the PUBLIC protobuf
"Encoding" specification (protobuf.dev/programming-guides/encoding/)
directly on the stdlib:

* base-128 varints; ZigZag for ``sint32``/``sint64``; two's-complement
  64-bit varints for negative ``int32``/``int64`` (the spec's 10-byte rule);
* the four live wire types — VARINT(0), I64(1), LEN(2), I32(5) — with
  unknown-field skipping on decode (forward compatibility, same contract
  protobuf runtimes give);
* proto3 presence semantics: zero-valued implicit-presence scalars are
  omitted on encode and default-filled on decode, while ``optional``
  (explicit-presence) fields emit set-to-default values and decode absent
  as None; repeated scalars are PACKED by default (and the decoder accepts
  both packed and unpacked encodings, per spec);
* nested messages, enums (ints on the wire), ``string``/``bytes``,
  fixed32/64 + float/double (IEEE little-endian);
* a proto3 ``.proto`` text subset parser (message/enum/nested/repeated/
  optional/comments/reserved) so descriptors come from the same artifact a
  real deployment registers — no generated Python classes needed;
* the Confluent Schema Registry protobuf framing: magic byte 0x00, 4-byte
  big-endian schema id, then the message-indexes array as ZigZag varints
  with the single-byte 0x00 optimization for the first-message case
  (docs.confluent.io "Wire format").

Scale notes: this codec is the per-batch inner loop of Arrow-batched
``mapInPandas`` UDFs (sources/protobuf.py) — one Python call per Arrow
batch, allocation-light per row, no driver involvement.  At 100 TB the
honest fast path is the spark-protobuf jar (JVM, codegen); this twin keeps
the format testable and correct here, with byte-identical wire output.
"""

from __future__ import annotations

import re
import struct

WIRETYPE_VARINT = 0
WIRETYPE_I64 = 1
WIRETYPE_LEN = 2
WIRETYPE_I32 = 5

_SCALAR_WIRETYPE = {
    "int32": WIRETYPE_VARINT, "int64": WIRETYPE_VARINT,
    "uint32": WIRETYPE_VARINT, "uint64": WIRETYPE_VARINT,
    "sint32": WIRETYPE_VARINT, "sint64": WIRETYPE_VARINT,
    "bool": WIRETYPE_VARINT, "enum": WIRETYPE_VARINT,
    "fixed64": WIRETYPE_I64, "sfixed64": WIRETYPE_I64, "double": WIRETYPE_I64,
    "fixed32": WIRETYPE_I32, "sfixed32": WIRETYPE_I32, "float": WIRETYPE_I32,
    "string": WIRETYPE_LEN, "bytes": WIRETYPE_LEN,
}
_PACKABLE = {
    "int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool",
    "enum", "fixed64", "sfixed64", "double", "fixed32", "sfixed32", "float",
}


# --- varint primitives (spec: base-128, little-endian groups) ---------------


def write_uvarint(buf: bytearray, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else (n << 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


class Reader:
    def __init__(self, data: bytes | memoryview):
        self.data = memoryview(data)
        self.pos = 0

    def at_end(self) -> bool:
        return self.pos >= len(self.data)

    def read_uvarint(self) -> int:
        u = shift = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("truncated varint")
            b = self.data[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                return u
            shift += 7
            if shift > 63:
                raise ValueError("varint exceeds 10 bytes")

    def read_len(self) -> memoryview:
        n = self.read_uvarint()
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("truncated LEN payload")
        self.pos += n
        return out

    def read_fixed(self, n: int) -> bytes:
        out = bytes(self.data[self.pos : self.pos + n])
        if len(out) != n:
            raise ValueError("truncated fixed field")
        self.pos += n
        return out

    def skip(self, wire_type: int) -> None:
        """Skip one unknown field per its wire type (spec forward-compat)."""
        if wire_type == WIRETYPE_VARINT:
            self.read_uvarint()
        elif wire_type == WIRETYPE_I64:
            self.read_fixed(8)
        elif wire_type == WIRETYPE_LEN:
            self.read_len()
        elif wire_type == WIRETYPE_I32:
            self.read_fixed(4)
        else:
            raise ValueError(f"unknown wire type {wire_type}")


# --- scalar encode/decode ----------------------------------------------------


def _encode_scalar(buf: bytearray, ftype: str, value) -> None:
    if ftype in ("int32", "int64", "uint32", "uint64", "enum"):
        # negative int32/int64/enum: 64-bit two's complement varint (spec);
        # int() coercion accepts numpy scalars from pandas batches
        write_uvarint(buf, int(value) & 0xFFFFFFFFFFFFFFFF)
    elif ftype in ("sint32", "sint64"):
        write_uvarint(buf, _zigzag(int(value)))
    elif ftype == "bool":
        buf.append(1 if value else 0)
    elif ftype == "fixed64":
        buf += struct.pack("<Q", value)
    elif ftype == "sfixed64":
        buf += struct.pack("<q", value)
    elif ftype == "double":
        buf += struct.pack("<d", value)
    elif ftype == "fixed32":
        buf += struct.pack("<I", value)
    elif ftype == "sfixed32":
        buf += struct.pack("<i", value)
    elif ftype == "float":
        buf += struct.pack("<f", value)
    elif ftype == "string":
        b = value.encode("utf-8")
        write_uvarint(buf, len(b))
        buf += b
    elif ftype == "bytes":
        b = bytes(value)
        write_uvarint(buf, len(b))
        buf += b
    else:
        raise ValueError(f"not a scalar type: {ftype}")


def _decode_scalar(reader: Reader, ftype: str):
    if ftype in ("uint32", "uint64", "enum"):
        return reader.read_uvarint()
    if ftype in ("int32", "int64"):
        u = reader.read_uvarint()
        return u - 0x10000000000000000 if u >= 0x8000000000000000 else u
    if ftype in ("sint32", "sint64"):
        return _unzigzag(reader.read_uvarint())
    if ftype == "bool":
        return reader.read_uvarint() != 0
    if ftype == "fixed64":
        return struct.unpack("<Q", reader.read_fixed(8))[0]
    if ftype == "sfixed64":
        return struct.unpack("<q", reader.read_fixed(8))[0]
    if ftype == "double":
        return struct.unpack("<d", reader.read_fixed(8))[0]
    if ftype == "fixed32":
        return struct.unpack("<I", reader.read_fixed(4))[0]
    if ftype == "sfixed32":
        return struct.unpack("<i", reader.read_fixed(4))[0]
    if ftype == "float":
        return struct.unpack("<f", reader.read_fixed(4))[0]
    if ftype == "string":
        return str(reader.read_len(), "utf-8")
    if ftype == "bytes":
        return bytes(reader.read_len())
    raise ValueError(f"not a scalar type: {ftype}")


def _entry_name(field_name: str) -> str:
    """The spec's implicit map entry message name: field name to
    CamelCase + 'Entry' (``foo_bar`` -> ``FooBarEntry``)."""
    return "".join(p.capitalize() for p in field_name.split("_")) + "Entry"


def _default(ftype: str):
    if ftype in ("string",):
        return ""
    if ftype == "bytes":
        return b""
    if ftype == "bool":
        return False
    if ftype in ("float", "double"):
        return 0.0
    if ftype == "message":
        return None
    return 0


# --- message encode/decode ----------------------------------------------------


def encode_message(desc: dict, value: dict, types: dict) -> bytes:
    """Encode ``value`` (a plain dict) per message descriptor ``desc``.
    proto3 semantics: zero-valued singular scalars are NOT emitted; repeated
    scalars are packed; None/absent message fields are not emitted."""
    buf = bytearray()
    for field in desc["fields"]:
        name, ftype, num = field["name"], field["type"], field["number"]
        v = value.get(name)
        if field.get("map"):
            if not v:
                continue
            entry = types[field["type_name"]]
            for mk in sorted(v):  # key-sorted: deterministic wire bytes
                sub = encode_message(entry, {"key": mk, "value": v[mk]}, types)
                write_uvarint(buf, (num << 3) | WIRETYPE_LEN)
                write_uvarint(buf, len(sub))
                buf += sub
            continue
        if field.get("repeated"):
            if v is None or len(v) == 0:  # len(): numpy arrays lack truthiness
                continue
            if ftype in _PACKABLE and ftype not in ("string", "bytes"):
                payload = bytearray()
                for item in v:
                    _encode_scalar(payload, ftype, item)
                write_uvarint(buf, (num << 3) | WIRETYPE_LEN)
                write_uvarint(buf, len(payload))
                buf += payload
            else:
                for item in v:
                    if ftype == "message":
                        sub = encode_message(types[field["type_name"]], item, types)
                        write_uvarint(buf, (num << 3) | WIRETYPE_LEN)
                        write_uvarint(buf, len(sub))
                        buf += sub
                    else:
                        write_uvarint(buf, (num << 3) | _SCALAR_WIRETYPE[ftype])
                        _encode_scalar(buf, ftype, item)
            continue
        if ftype == "message":
            if v is None:
                continue
            sub = encode_message(types[field["type_name"]], v, types)
            write_uvarint(buf, (num << 3) | WIRETYPE_LEN)
            write_uvarint(buf, len(sub))
            buf += sub
            continue
        if v is None:
            continue
        if v == _default(ftype) and not field.get("optional"):
            continue  # proto3 implicit presence: defaults are absence
        # explicit-presence (optional) fields emit set-to-default values
        write_uvarint(buf, (num << 3) | _SCALAR_WIRETYPE[ftype])
        _encode_scalar(buf, ftype, v)
    return bytes(buf)


def decode_message(data: bytes | memoryview, desc: dict, types: dict) -> dict:
    """Decode wire bytes into a plain dict per ``desc``.  Missing singular
    scalars come back as proto3 defaults, missing repeated as [], missing
    messages as None; unknown field numbers are skipped by wire type."""
    by_num = {f["number"]: f for f in desc["fields"]}
    out: dict = {}
    r = Reader(data)
    while not r.at_end():
        tag = r.read_uvarint()
        num, wt = tag >> 3, tag & 7
        field = by_num.get(num)
        if field is None:
            r.skip(wt)
            continue
        name, ftype = field["name"], field["type"]
        if field.get("map"):
            entry = decode_message(r.read_len(), types[field["type_name"]], types)
            out.setdefault(name, {})[entry["key"]] = entry["value"]
        elif field.get("repeated"):
            acc = out.setdefault(name, [])
            if ftype == "message":
                acc.append(decode_message(r.read_len(), types[field["type_name"]], types))
            elif wt == WIRETYPE_LEN and ftype not in ("string", "bytes"):
                sub = Reader(r.read_len())  # packed run
                while not sub.at_end():
                    acc.append(_decode_scalar(sub, ftype))
            else:
                acc.append(_decode_scalar(r, ftype))
        elif ftype == "message":
            out[name] = decode_message(r.read_len(), types[field["type_name"]], types)
        else:
            out[name] = _decode_scalar(r, ftype)  # last-one-wins per spec
    for f in desc["fields"]:
        if f["name"] not in out:
            if f.get("map"):
                out[f["name"]] = {}
            elif f.get("repeated"):
                out[f["name"]] = []
            elif f.get("optional"):
                out[f["name"]] = None  # explicit presence: absent != default
            else:
                out[f["name"]] = _default(f["type"])
    return out


# --- proto3 text subset parser -------------------------------------------------

_TOKEN = re.compile(
    r"//[^\n]*|/\*.*?\*/"               # comments
    r'|"(?:[^"\\]|\\.)*"'               # string literal
    r"|[A-Za-z_][A-Za-z0-9_.]*"         # ident (dotted)
    r"|-?\d+"                           # int
    r"|[{}=;\[\]<>,]",                  # punctuation
    re.S,
)

_SCALARS = set(_SCALAR_WIRETYPE) - {"enum"}


def parse_proto(text: str) -> dict:
    """Parse a proto3 ``.proto`` subset into ``{fully.qualified.Name:
    descriptor}``.  Supported: ``syntax``/``package``/``option`` headers,
    nested ``message``/``enum``, ``repeated``/``optional`` labels,
    ``map<K,V>`` (desugared to the spec's implicit repeated ``*Entry``
    message; decoded to a Python dict, encoded key-sorted for
    deterministic bytes), ``oneof`` (members become singular fields of the
    parent — wire-identical per spec; last-one-wins on decode),
    ``reserved``, comments.  Unsupported (raises): ``extend``,
    ``service``, proto2 ``required``/``group``."""
    toks = [t for t in _TOKEN.findall(text) if not t.startswith(("//", "/*"))]
    pos = 0
    types: dict[str, dict] = {}
    package = ""

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expected=None):
        nonlocal pos
        t = toks[pos]
        if expected is not None and t != expected:
            raise ValueError(f"expected {expected!r}, got {t!r}")
        pos += 1
        return t

    def skip_statement():
        nonlocal pos
        while peek() not in (";", None):
            pos += 1
        if peek() == ";":
            take()

    def parse_enum(scope: str):
        name = take()
        fq = f"{scope}.{name}" if scope else name
        values: dict[str, int] = {}
        take("{")
        while peek() != "}":
            if peek() in ("option", "reserved"):
                skip_statement()
                continue
            vname = take()
            take("=")
            values[vname] = int(take())
            if peek() == "[":  # enum value options
                while take() != "]":
                    pass
            take(";")
        take("}")
        types[fq] = {"kind": "enum", "name": fq, "values": values}

    def parse_message(scope: str):
        name = take()
        fq = f"{scope}.{name}" if scope else name
        fields: list[dict] = []
        types[fq] = {"kind": "message", "name": fq, "fields": fields}
        take("{")
        while peek() != "}":
            t = peek()
            if t == "message":
                take()
                parse_message(fq)
                continue
            if t == "enum":
                take()
                parse_enum(fq)
                continue
            if t in ("option", "reserved"):
                skip_statement()
                continue
            if t == "oneof":
                # wire-identical to singular member fields (spec: "oneof
                # fields are like regular fields except ...") — flatten
                take()
                take()  # oneof name (no descriptor-level meaning here)
                take("{")
                while peek() != "}":
                    if peek() == "option":
                        skip_statement()
                        continue
                    oftype = take()
                    ofname = take()
                    take("=")
                    ofnum = int(take())
                    if peek() == "[":
                        while take() != "]":
                            pass
                    take(";")
                    fields.append(
                        {"name": ofname, "number": ofnum, "repeated": False,
                         "type": oftype if oftype in _SCALARS else None,
                         "type_ref": None if oftype in _SCALARS else oftype,
                         "scope": fq}
                    )
                take("}")
                continue
            if t == "map":
                # map<K,V> name = N; == repeated message NameEntry
                # {K key = 1; V value = 2;} (spec "Maps" backward compat)
                take()
                take("<")
                ktype = take()
                take(",")
                vtype = take()
                take(">")
                mname = take()
                take("=")
                mnum = int(take())
                take(";")
                if ktype not in _SCALARS or ktype in ("float", "double", "bytes"):
                    raise ValueError(f"invalid map key type {ktype!r}")
                entry_fq = f"{fq}.{_entry_name(mname)}"
                types[entry_fq] = {
                    "kind": "message",
                    "name": entry_fq,
                    "fields": [
                        {"name": "key", "number": 1, "repeated": False,
                         "type": ktype, "type_ref": None, "scope": fq},
                        {"name": "value", "number": 2, "repeated": False,
                         "type": vtype if vtype in _SCALARS else None,
                         "type_ref": None if vtype in _SCALARS else vtype,
                         "scope": fq},
                    ],
                }
                fields.append(
                    {"name": mname, "number": mnum, "repeated": True,
                     "map": True, "type": None, "type_ref": _entry_name(mname),
                     "scope": fq}
                )
                continue
            if t in ("extend", "group", "required", "service"):
                raise ValueError(f"proto construct not supported by this subset: {t}")
            repeated = optional = False
            if t in ("repeated", "optional"):
                repeated = t == "repeated"
                # proto3 'optional' = explicit presence: an absent field is
                # distinguishable from one set to its default, so the
                # encoder must emit set-to-default values and the decoder
                # must report absence as None (not default-fill)
                optional = t == "optional"
                take()
            ftype = take()
            fname = take()
            take("=")
            fnum = int(take())
            if peek() == "[":  # field options, e.g. [packed = true]
                while take() != "]":
                    pass
            take(";")
            fields.append(
                {"name": fname, "number": fnum, "repeated": repeated,
                 "optional": optional,
                 "type": ftype if ftype in _SCALARS else None,
                 "type_ref": None if ftype in _SCALARS else ftype,
                 "scope": fq}
            )
        take("}")

    while peek() is not None:
        t = peek()
        if t == "syntax":
            take()
            take("=")
            syntax = take().strip('"')
            take(";")
            if syntax != "proto3":
                raise ValueError(f"only proto3 is supported, got {syntax!r}")
        elif t == "package":
            take()
            package = take()
            take(";")
        elif t in ("option", "import"):
            skip_statement()
        elif t == "message":
            take()
            parse_message(package)
        elif t == "enum":
            take()
            parse_enum(package)
        else:
            raise ValueError(f"unexpected top-level token {t!r}")

    # resolve type references: innermost enclosing scope outward (spec's
    # C++-style name resolution), then the package root
    def resolve(ref: str, scope: str) -> str:
        parts = scope.split(".") if scope else []
        for i in range(len(parts), -1, -1):
            cand = ".".join(parts[:i] + [ref])
            if cand in types:
                return cand
        if ref in types:
            return ref
        raise ValueError(f"unresolved type {ref!r} referenced from {scope!r}")

    for desc in list(types.values()):
        if desc["kind"] != "message":
            continue
        for f in desc["fields"]:
            if f["type_ref"] is None:
                continue
            fq = resolve(f["type_ref"], f.pop("scope"))
            target = types[fq]
            if target["kind"] == "enum":
                f["type"] = "enum"
                f["enum_type"] = fq
            else:
                f["type"] = "message"
                f["type_name"] = fq
        for f in desc["fields"]:
            f.pop("type_ref", None)
            f.pop("scope", None)
    return types


# --- Confluent Schema Registry protobuf framing --------------------------------
# docs.confluent.io "Wire format": magic 0x00, 4-byte BE schema id, then the
# message-indexes array (ZigZag varints: count, then each index), with the
# common first-message case [0] optimized to the single byte 0x00.


def frame_confluent_protobuf(schema_id: int, indexes: list[int], payload: bytes) -> bytes:
    head = bytearray(b"\x00" + struct.pack(">I", schema_id))
    if indexes == [0]:
        head.append(0)
    else:
        write_uvarint(head, _zigzag(len(indexes)))
        for i in indexes:
            write_uvarint(head, _zigzag(i))
    return bytes(head) + payload


def unframe_confluent_protobuf(wire: bytes) -> tuple[int, list[int], memoryview]:
    """Return (schema_id, message_indexes, payload_view); validates magic."""
    if not wire or wire[0] != 0:
        raise ValueError(f"bad magic byte {wire[:1]!r} (want 0x00)")
    sid = struct.unpack(">I", wire[1:5])[0]
    r = Reader(wire)
    r.pos = 5
    n = _unzigzag(r.read_uvarint())
    indexes = [0] if n == 0 else [_unzigzag(r.read_uvarint()) for _ in range(n)]
    return sid, indexes, r.data[r.pos :]


def message_by_indexes(types: dict, proto_order: list[str], indexes: list[int]) -> dict:
    """Resolve Confluent message indexes (path through top-level then nested
    message declaration order) to a descriptor.  ``proto_order`` is the
    declaration order of TOP-LEVEL messages in the schema."""
    cur = types[proto_order[indexes[0]]]
    for idx in indexes[1:]:
        nested = [t for t in types.values()
                  if t["kind"] == "message" and t["name"].startswith(cur["name"] + ".")
                  and "." not in t["name"][len(cur["name"]) + 1 :]]
        cur = nested[idx]
    return cur


def top_level_messages(text: str, types: dict) -> list[str]:
    """Top-level message names in declaration order (for index resolution)."""
    pkg = ""
    m = re.search(r"^\s*package\s+([A-Za-z0-9_.]+)\s*;", text, re.M)
    if m:
        pkg = m.group(1) + "."
    names = []
    depth = 0
    for line in text.splitlines():
        stripped = line.split("//")[0]
        if depth == 0:
            mm = re.match(r"\s*message\s+([A-Za-z_][A-Za-z0-9_]*)", stripped)
            if mm:
                names.append(pkg + mm.group(1))
        depth += stripped.count("{") - stripped.count("}")
    return [n for n in names if n in types]
