"""The standard Kafka Connect Single Message Transform set, re-expressed as
config-driven DataFrame transforms — the SMTs real deployments CHAIN with
the reference's ExpandJson (readme.md:38-42 shows exactly such a
``transforms=...`` chain).  A user migrating a connector config keeps the
property names and aliases verbatim and gets a Spark plan back.

Implemented (public semantics per the Kafka Connect documentation —
``org.apache.kafka.connect.transforms.*``):

  * ``ExtractField$Key/$Value`` — replace the side with one field
  * ``HoistField$Key/$Value`` — wrap the side in a single-field struct
  * ``Flatten$Value`` — nested structs to delimited top-level fields
  * ``Cast$Value`` — per-field (``a:int32,b:string``) or whole-value casts
  * ``ReplaceField$Value`` — include/exclude/rename fields
  * ``MaskField$Value`` — zero-value (or literal replacement) masking
  * ``InsertField$Value`` — static / topic / partition / offset / timestamp
  * ``TimestampConverter$Value`` — unix ms <-> Timestamp <-> formatted string
  * ``TimestampRouter`` — topic := ``${topic}``/``${timestamp}`` format
  * ``HeaderFrom$Key/$Value`` — copy/move record fields into headers
  * ``RegexRouter`` — topic rewrite (Java regex, $1 group refs, full-match)
  * ``ValueToKey`` — key := struct of named value fields
  * ``Filter`` + predicates ``TopicNameMatches`` / ``RecordIsTombstone`` /
    ``HasHeaderKey`` (with ``negate``)
  * ``ExtractNewRecordState`` — Debezium's unwrap SMT (the change-event
    envelope -> row state; tombstone/delete handling, ``add.fields``)
  * ``EventRouter`` — Debezium's outbox-pattern router (outbox change
    events -> domain events: routed topic, aggregate key, payload value,
    additional header/envelope placements, append-only contract)

plus the reference's own ``ExpandJson$Key/$Value`` (dispatched to
``sources.kafka.from_connect_config``).  Records are the Kafka-wire shape
used throughout this repo: columns ``key``, ``value``, ``topic``,
``partition``, ``offset``, ``timestamp`` (and optionally ``headers`` as
``map<string,string>``); sides may be structs (schema'd) or atomic
(schemaless).

Everything is a narrow projection — the whole chain compiles to one
whole-stage-codegen Project (plus a Filter for the Filter SMT), so a
50-SMT connector config costs the same scan it did with 1.  Connect
per-record semantics (struct rebuild per transform) become plan-time
column rewrites; behavior parity is what's tested, not mechanism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CONNECT_TO_SPARK_TYPE = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float32": "float",
    "float64": "double",
    "boolean": "boolean",
    "string": "string",
    "bytes": "binary",
}


def _side_of(type_name: str) -> str:
    return "key" if type_name.strip().endswith("$Key") else "value"


def _zero_value(dt: T.DataType) -> Column:
    """Connect MaskField's 'zero value' per type."""
    if isinstance(dt, T.StringType):
        return F.lit("")
    if isinstance(dt, T.BooleanType):
        return F.lit(False)
    if isinstance(dt, (T.BinaryType,)):
        return F.lit(b"")
    return F.lit(0).cast(dt)


def _flatten_fields(dt: T.StructType, prefix: str, delim: str, src: Column):
    out = []
    for f in dt.fields:
        name = f"{prefix}{delim}{f.name}" if prefix else f.name
        child = src.getField(f.name)
        if isinstance(f.dataType, T.StructType):
            out.extend(_flatten_fields(f.dataType, name, delim, child))
        else:
            out.append(child.alias(name))
    return out


def _require_struct(df: DataFrame, side: str, smt: str) -> T.StructType:
    dt = df.schema[side].dataType
    if not isinstance(dt, T.StructType):
        raise ValueError(
            f"{smt} requires a schema'd (struct) record {side}; got "
            f"{dt.simpleString()} — Connect raises DataException here"
        )
    return dt


def _apply_one(df: DataFrame, type_name: str, cfg: dict, predicate=None) -> DataFrame:
    smt = type_name.rsplit(".", 1)[-1]  # class name (with $Key/$Value)
    base = smt.split("$", 1)[0]
    side = _side_of(smt)

    def guarded(col_expr: Column, orig: Column) -> Column:
        """Apply the SMT only to records matching its predicate (Connect's
        per-transform ``predicate`` property); others pass through."""
        if predicate is None:
            return col_expr
        return F.when(predicate(df), col_expr).otherwise(orig)

    if base == "ExpandJson":
        from kafka_connect_expand_json_transform_spark.sources.kafka import (
            from_connect_config,
        )

        if predicate is not None:
            # Gating ExpandJson per record is unrepresentable in one typed
            # column (matching rows become a struct, others keep the raw
            # string) — fail at plan time, the config-validation contract.
            raise ValueError(
                f"{smt}: per-transform 'predicate' is not supported on "
                "ExpandJson — a gated expansion would mix expanded-struct "
                "and raw rows in one column; route with Filter/split_dlq "
                "upstream instead"
            )
        return from_connect_config({"type": type_name, **cfg})(df)

    if base == "ExtractField":
        field = cfg["field"]
        _require_struct(df, side, smt)
        return df.withColumn(side, guarded(F.col(f"{side}.{field}"), F.col(side)))

    if base == "HoistField":
        field = cfg["field"]
        return df.withColumn(
            side, guarded(F.struct(F.col(side).alias(field)), F.col(side))
        )

    if base == "Flatten":
        delim = cfg.get("delimiter", ".")
        dt = _require_struct(df, side, smt)
        flat = F.struct(*_flatten_fields(dt, "", delim, F.col(side)))
        return df.withColumn(side, guarded(flat, F.col(side)))

    if base == "Cast":
        spec = cfg["spec"]
        if ":" not in spec:  # whole-value cast (schemaless side)
            target = _CONNECT_TO_SPARK_TYPE[spec.strip()]
            return df.withColumn(
                side, guarded(F.col(side).cast(target), F.col(side))
            )
        col = F.col(side)
        for part in spec.split(","):
            fname, _, ftype = part.strip().partition(":")
            col = col.withField(
                fname,
                F.col(f"{side}.{fname}").cast(_CONNECT_TO_SPARK_TYPE[ftype]),
            )
        return df.withColumn(side, guarded(col, F.col(side)))

    if base == "ReplaceField":
        dt = _require_struct(df, side, smt)
        exclude = {s.strip() for s in cfg.get("exclude", "").split(",") if s.strip()}
        include_raw = [s.strip() for s in cfg.get("include", "").split(",") if s.strip()]
        renames = dict(
            p.strip().split(":", 1)
            for p in cfg.get("renames", "").split(",")
            if ":" in p
        )
        names = include_raw or [f.name for f in dt.fields if f.name not in exclude]
        rebuilt = F.struct(
            *[
                F.col(f"{side}.{n}").alias(renames.get(n, n))
                for n in names
            ]
        )
        return df.withColumn(side, guarded(rebuilt, F.col(side)))

    if base == "MaskField":
        dt = _require_struct(df, side, smt)
        fields = {s.strip() for s in cfg["fields"].split(",") if s.strip()}
        replacement = cfg.get("replacement")
        col = F.col(side)
        for f in dt.fields:
            if f.name not in fields:
                continue
            masked = (
                F.lit(replacement).cast(f.dataType)
                if replacement is not None
                else _zero_value(f.dataType)
            )
            col = col.withField(f.name, masked)
        return df.withColumn(side, guarded(col, F.col(side)))

    if base == "InsertField":
        _require_struct(df, side, smt)
        col = F.col(side)

        def clean(key: str) -> str | None:
            v = cfg.get(key)
            return v.rstrip("!?") if v else None  # '!'=required '?'=optional

        if clean("static.field"):
            col = col.withField(clean("static.field"), F.lit(cfg["static.value"]))
        if clean("topic.field"):
            col = col.withField(clean("topic.field"), F.col("topic"))
        if clean("partition.field"):
            col = col.withField(clean("partition.field"), F.col("partition"))
        if clean("offset.field"):
            col = col.withField(clean("offset.field"), F.col("offset"))
        if clean("timestamp.field"):
            col = col.withField(clean("timestamp.field"), F.col("timestamp"))
        return df.withColumn(side, guarded(col, F.col(side)))

    if base == "TimestampConverter":
        target = cfg["target.type"]
        fmt = cfg.get("format")
        field = cfg.get("field")
        src = F.col(f"{side}.{field}") if field else F.col(side)
        src_dt = (
            df.schema[side].dataType[field].dataType
            if field
            else df.schema[side].dataType
        )
        # normalize source to a TIMESTAMP first (Connect does the same hop)
        if isinstance(src_dt, (T.LongType, T.IntegerType)):
            ts = F.timestamp_millis(src.cast("bigint"))
        elif isinstance(src_dt, T.StringType):
            ts = F.to_timestamp(src, fmt) if fmt else F.to_timestamp(src)
        else:
            ts = src.cast("timestamp")
        if target == "unix":
            # epoch ms, FLOOR-rounded like Connect's Date.getTime() (pre-1970
            # values round down, not toward zero).  (um - pmod(um,1000)) is an
            # exact multiple of 1000 in bigint, so the division is exact —
            # no lossy double intermediate, no truncation-toward-zero.
            um = F.unix_micros(ts)
            out_col = ((um - F.pmod(um, F.lit(1000))) / F.lit(1000)).cast("bigint")
        elif target == "string":
            out_col = F.date_format(ts, fmt or "yyyy-MM-dd HH:mm:ss")
        elif target == "Date":
            out_col = ts.cast("date")
        else:  # Timestamp / Time
            out_col = ts
        if field:
            return df.withColumn(
                side,
                guarded(F.col(side).withField(field, out_col), F.col(side)),
            )
        return df.withColumn(side, guarded(out_col, F.col(side)))

    if base == "RegexRouter":
        # Connect's RegexRouter rewrites only when the pattern matches the
        # ENTIRE topic (Pattern.matches, then replaceFirst); a partial
        # match is a no-op.  Anchor both the gate and the rewrite.
        anchored = f"^(?:{cfg['regex']})$"
        routed = F.when(
            F.col("topic").rlike(anchored),
            F.regexp_replace(F.col("topic"), anchored, cfg["replacement"]),
        ).otherwise(F.col("topic"))
        return df.withColumn("topic", guarded(routed, F.col("topic")))

    if base == "TimestampRouter":
        # Connect's TimestampRouter: topic := topic.format with ${topic} and
        # ${timestamp} (record timestamp through SimpleDateFormat).  Java
        # SimpleDateFormat patterns used here (yyyyMMdd etc.) are the same
        # tokens Spark's date_format accepts.
        fmt = cfg.get("topic.format", "${topic}-${timestamp}")
        ts_fmt = cfg.get("timestamp.format", "yyyyMMdd")
        ts_dt = df.schema["timestamp"].dataType
        ts_col = (
            F.timestamp_millis(F.col("timestamp").cast("bigint"))
            if isinstance(ts_dt, (T.LongType, T.IntegerType))
            else F.col("timestamp")
        )  # Kafka record timestamps are epoch ms
        stamped = F.date_format(ts_col, ts_fmt)
        parts: list[Column] = []
        rest = fmt
        while rest:
            i_t, i_s = rest.find("${topic}"), rest.find("${timestamp}")
            nxt = min(x for x in (i_t, i_s, len(rest)) if x >= 0)
            if nxt > 0:
                parts.append(F.lit(rest[:nxt]))
                rest = rest[nxt:]
                continue
            if rest.startswith("${topic}"):
                parts.append(F.col("topic"))
                rest = rest[len("${topic}") :]
            else:
                parts.append(stamped)
                rest = rest[len("${timestamp}") :]
        routed = F.concat(*parts) if parts else F.lit("")
        return df.withColumn("topic", guarded(routed, F.col("topic")))

    if base == "HeaderFrom":
        # Connect's HeaderFrom$Key/$Value: copy or move record fields into
        # headers (operation=copy|move); moved fields leave the side struct.
        dt = _require_struct(df, side, smt)
        fields = [s.strip() for s in cfg["fields"].split(",") if s.strip()]
        headers = [s.strip() for s in cfg["headers"].split(",") if s.strip()]
        if len(fields) != len(headers):
            raise ValueError(
                f"{smt}: 'fields' and 'headers' must be the same length "
                "(Connect validates this at startup)"
            )
        operation = cfg.get("operation", "copy")
        base_hdr = (
            F.coalesce(
                F.col("headers"),
                F.map_from_arrays(
                    F.array().cast("array<string>"), F.array().cast("array<string>")
                ),
            )
            if "headers" in df.columns
            else F.map_from_arrays(
                F.array().cast("array<string>"), F.array().cast("array<string>")
            )
        )
        pairs = []
        for fname, hname in zip(fields, headers):
            pairs.extend(
                [F.lit(hname), F.col(f"{side}.{fname}").cast("string")]
            )
        stripped = F.map_filter(base_hdr, lambda k, v: ~k.isin(headers))
        new_hdr = F.map_concat(stripped, F.create_map(*pairs))
        out = df.withColumn(
            "headers", guarded(new_hdr, base_hdr) if "headers" in df.columns else new_hdr
        )
        if operation == "move":
            keep = [f.name for f in dt.fields if f.name not in set(fields)]
            rebuilt = F.struct(*[F.col(f"{side}.{n}").alias(n) for n in keep])
            out = out.withColumn(side, guarded(rebuilt, F.col(side)))
        return out

    if base == "ValueToKey":
        fields = [s.strip() for s in cfg["fields"].split(",") if s.strip()]
        _require_struct(df, "value", smt)
        key = F.struct(*[F.col(f"value.{f}").alias(f) for f in fields])
        return df.withColumn("key", guarded(key, F.col("key")))

    if base == "SetSchemaMetadata":
        # Connect sets the record schema's name/version; Spark's analogue
        # is column metadata (same channel the ExpandJson schema-name
        # prefix rides, schema_inference.py) — predicate gating n/a for
        # metadata (plan-time property, not a row value)
        meta = {}
        if cfg.get("schema.name"):
            meta["connect.schema.name"] = cfg["schema.name"]
        if cfg.get("schema.version"):
            meta["connect.schema.version"] = int(cfg["schema.version"])
        return df.withMetadata(side, meta)

    if base == "InsertHeader":
        hdr = F.coalesce(
            F.col("headers"),
            F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>")),
        )
        added = F.map_concat(
            F.map_filter(hdr, lambda k, v: k != F.lit(cfg["header"])),
            F.create_map(F.lit(cfg["header"]), F.lit(cfg["value.literal"])),
        )
        return df.withColumn("headers", guarded(added, F.col("headers")))

    if base == "DropHeaders":
        names = [s.strip() for s in cfg["headers"].split(",") if s.strip()]
        dropped = F.map_filter(
            F.col("headers"), lambda k, v: ~k.isin(*names)
        )
        return df.withColumn("headers", guarded(dropped, F.col("headers")))

    if base == "Filter":
        if predicate is None:
            raise ValueError("Filter SMT requires a predicate")
        return df.where(~predicate(df))

    if base == "ExtractNewRecordState":
        # Debezium's unwrap SMT (io.debezium.transforms.ExtractNewRecordState,
        # public Debezium 2.x docs) — THE transform real CDC deployments
        # chain in front of ExpandJson-style SMTs: collapse the change-event
        # envelope {before, after, source, op, ts_ms} to the row state.
        #   drop.tombstones (true): remove null-value tombstone records
        #   delete.handling.mode: drop (default) — remove op='d' records;
        #     rewrite — keep them, take state from `before`, add a string
        #     __deleted true/false field; none — keep them with null value
        #   add.fields: comma list of envelope/source paths copied into the
        #     flattened value as __<path with . -> _> (alias via `path:name`)
        if predicate is not None:
            # type-changing like ExpandJson: a gated unwrap would mix
            # envelope and row-state structs in one column — config error
            raise ValueError(
                f"{smt}: per-transform 'predicate' is not supported on "
                "ExtractNewRecordState — the unwrap changes the value type; "
                "route with Filter/split_dlq upstream instead"
            )
        dt = _require_struct(df, "value", smt)
        names = {f.name for f in dt.fields}
        for req in ("after", "op"):
            if req not in names:
                raise ValueError(
                    f"{smt}: value is not a Debezium envelope (missing "
                    f"'{req}' field); got {dt.simpleString()}"
                )
        after_t = dt["after"].dataType
        if not isinstance(after_t, T.StructType):
            raise ValueError(f"{smt}: envelope 'after' must be a struct")
        mode = cfg.get("delete.handling.mode", "drop")
        if mode not in ("drop", "rewrite", "none"):
            raise ValueError(f"{smt}: unknown delete.handling.mode {mode!r}")
        if str(cfg.get("drop.tombstones", "true")).lower() == "true":
            df = df.where(F.col("value").isNotNull())
        if mode == "drop":
            df = df.where(
                F.col("value").isNull() | (F.col("value.op") != F.lit("d"))
            )
        v = F.col("value")
        is_delete = v.getField("op") == F.lit("d")
        if mode == "rewrite" and "before" in names:
            state = F.when(is_delete, v.getField("before")).otherwise(
                v.getField("after")
            )
        else:
            state = v.getField("after")
        cols = [state.getField(f.name).alias(f.name) for f in after_t.fields]
        for spec in str(cfg.get("add.fields", "")).split(","):
            spec = spec.strip()
            if not spec:
                continue
            path, _, alias = spec.partition(":")
            name = alias.strip() or "__" + path.replace(".", "_")
            add = v
            for part in path.split("."):
                add = add.getField(part)
            cols.append(add.alias(name))
        if mode == "rewrite":
            cols.append(
                F.when(is_delete, F.lit("true"))
                .otherwise(F.lit("false"))
                .alias("__deleted")
            )
        new_value = F.struct(*cols)
        if mode == "none":
            new_value = F.when(~is_delete, new_value)
        new_value = F.when(v.isNull(), F.lit(None)).otherwise(new_value)
        return df.withColumn("value", new_value)

    if base == "EventRouter":
        # Debezium's outbox-pattern router (io.debezium.transforms.outbox.
        # EventRouter, public docs "Outbox Event Router"): change events
        # from an insert-only OUTBOX table become domain events —
        #   topic := route.topic.replacement with ${routedByValue} =
        #     after.<route.by.field>   (defaults: outbox.event.<aggregatetype>)
        #   key   := after.<table.field.event.key>      (default aggregateid)
        #   value := after.<table.field.event.payload>  (default payload)
        # table.fields.additional.placement copies outbox columns into
        # headers ("f:header[:alias]") or into the value envelope
        # ("f:envelope[:alias]" — the value becomes {payload, ...extras}).
        # Only create/snapshot-read events route; deletes/tombstones (the
        # commit-log janitor's rows) are dropped, updates are refused —
        # an outbox table is append-only by contract.
        if predicate is not None:
            raise ValueError(
                f"{smt}: per-transform 'predicate' is not supported on "
                "EventRouter — the routing changes key/value/topic types; "
                "route with Filter/split_dlq upstream instead"
            )
        dt = _require_struct(df, "value", smt)
        names = {f.name for f in dt.fields}
        for req in ("after", "op"):
            if req not in names:
                raise ValueError(
                    f"{smt}: value is not a Debezium envelope (missing "
                    f"'{req}'); route the raw outbox table through "
                    "from_debezium first"
                )
        after_t = dt["after"].dataType
        if not isinstance(after_t, T.StructType):
            raise ValueError(f"{smt}: envelope 'after' must be a struct")
        route_by = cfg.get("route.by.field", "aggregatetype")
        topic_tpl = cfg.get("route.topic.replacement", "outbox.event.${routedByValue}")
        key_field = cfg.get("table.field.event.key", "aggregateid")
        payload_field = cfg.get("table.field.event.payload", "payload")
        after_names = {f.name for f in after_t.fields}
        for f_ in (route_by, key_field, payload_field):
            if f_ not in after_names:
                raise ValueError(
                    f"{smt}: outbox column {f_!r} missing from the after "
                    f"state {after_t.simpleString()}"
                )
        # append-only contract (Debezium table.op.invalid.behavior): the
        # default skips invalid ops like the real SMT's "warn"; "error"/
        # "fatal" inject a row-level raise_error so the contract also
        # holds on streams (no driver-side probe action)
        behavior = cfg.get("table.op.invalid.behavior", "warn")
        is_invalid = F.col("value").isNotNull() & ~F.col("value.op").isin(
            "c", "r", "d"
        )
        if behavior in ("error", "fatal"):
            df = df.withColumn(
                "value",
                F.when(
                    is_invalid,
                    F.raise_error(
                        F.concat(
                            F.lit(f"{smt}: outbox table must be append-only; got op="),
                            F.col("value.op"),
                        )
                    ).cast(dt),
                ).otherwise(F.col("value")),
            )
        elif behavior != "warn":
            raise ValueError(f"{smt}: unknown table.op.invalid.behavior {behavior!r}")
        routed = df.where(
            F.col("value").isNotNull() & F.col("value.op").isin("c", "r")
        )
        after = F.col("value.after")
        pre, _, post = topic_tpl.partition("${routedByValue}")
        topic = F.concat(F.lit(pre), after.getField(route_by).cast("string"),
                         F.lit(post))
        value_cols = []
        hdr_pairs = []
        for spec in str(cfg.get("table.fields.additional.placement", "")).split(","):
            spec = spec.strip()
            if not spec:
                continue
            parts = spec.split(":")
            fname, place = parts[0], parts[1]
            alias = parts[2] if len(parts) > 2 else fname
            if fname not in after_names:
                raise ValueError(f"{smt}: additional field {fname!r} not in after")
            if place == "header":
                hdr_pairs.append((alias, after.getField(fname).cast("string")))
            elif place == "envelope":
                value_cols.append(after.getField(fname).alias(alias))
            else:
                raise ValueError(f"{smt}: unknown placement {place!r}")
        payload = after.getField(payload_field)
        new_value = (
            F.struct(payload.alias(payload_field), *value_cols)
            if value_cols
            else payload
        )
        out = routed
        if hdr_pairs:
            # headers first: their exprs read value.after, which the value
            # rewrite below replaces
            new_hdrs = F.map_from_arrays(
                F.array(*[F.lit(hk) for hk, _ in hdr_pairs]),
                F.array(*[c for _, c in hdr_pairs]),
            )
            if "headers" in df.columns:
                hdr = F.coalesce(
                    F.col("headers"),
                    F.map_from_arrays(
                        F.array().cast("array<string>"),
                        F.array().cast("array<string>"),
                    ),
                )
                ks = [hk for hk, _ in hdr_pairs]
                new_hdrs = F.map_concat(
                    F.map_filter(hdr, lambda hk, _v: ~hk.isin(*ks)), new_hdrs
                )
            out = out.withColumn("headers", new_hdrs)
        return (
            out.withColumn("topic", topic)
            .withColumn("key", after.getField(key_field).cast("string"))
            .withColumn("value", new_value)
        )

    raise ValueError(f"unsupported SMT type {type_name!r}")


def _build_predicate(type_name: str, cfg: dict, negate: bool):
    base = type_name.rsplit(".", 1)[-1]

    def pred(df: DataFrame) -> Column:
        if base == "TopicNameMatches":
            # Java Pattern.matches == full match
            c = F.col("topic").rlike(f"^(?:{cfg['pattern']})$")
        elif base == "RecordIsTombstone":
            c = F.col("value").isNull()
        elif base == "HasHeaderKey":
            c = F.map_contains_key(F.col("headers"), F.lit(cfg["name"]))
        else:
            raise ValueError(f"unsupported predicate type {type_name!r}")
        return ~c if negate else c

    return pred


def split_dlq(
    df: DataFrame,
    ok: Column,
    dlq_topic: str,
    stage: str = "transform",
    context_headers: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Kafka Connect's dead-letter-queue error handling
    (``errors.tolerance=all`` + ``errors.deadletterqueue.topic.name`` +
    ``...context.headers.enable``), re-expressed for a DataFrame pipeline:
    rows failing ``ok`` are ROUTED, not dropped and not fatal — the DLQ
    frame keeps the ORIGINAL record re-topiced to ``dlq_topic``, with
    Connect's ``__connect.errors.*`` context headers (original topic /
    partition / offset and the failing stage) merged into ``headers`` so
    an operator can replay after a fix.  Returns ``(good, dlq)``.

    At 100 TB this is the poison-pill contract: one bad record costs one
    row in a side output, never a dead executor or a dead job — and
    unlike PERMISSIVE-null it keeps the EVIDENCE.  Both frames come from
    one filter each over the same scan (Catalyst reuses the upstream
    plan; persist upstream if it is expensive and both sides are
    consumed)."""
    good = df.where(ok)
    bad = df.where(~F.coalesce(ok, F.lit(False)))
    ctx = {
        "__connect.errors.topic": F.col("topic"),
        "__connect.errors.stage": F.lit(stage),
    }
    if "partition" in df.columns:
        ctx["__connect.errors.partition"] = F.col("partition").cast("string")
    if "offset" in df.columns:
        ctx["__connect.errors.offset"] = F.col("offset").cast("string")
    dlq = bad
    if context_headers:
        # headers FIRST (they must capture the ORIGINAL topic), then route
        pairs = []
        for k, v in ctx.items():
            pairs.extend([F.lit(k), v.cast("string")])
        ctx_map = F.create_map(*pairs)
        if "headers" in df.columns:
            base = F.coalesce(
                F.col("headers"),
                F.map_from_arrays(
                    F.array().cast("array<string>"), F.array().cast("array<string>")
                ),
            )
            dlq = dlq.withColumn("headers", F.map_concat(base, ctx_map))
        else:
            dlq = dlq.withColumn("headers", ctx_map)
    dlq = dlq.withColumn("topic", F.lit(dlq_topic))
    return good, dlq


def connect_transform_chain(config: dict):
    """Parse a FULL Kafka Connect connector config's transform surface —
    ``transforms=a,b,c`` + ``transforms.<alias>.<prop>`` +
    ``predicates=p`` + ``predicates.<alias>.<prop>`` — and return a
    DataFrame transform applying the chain in declaration order, exactly
    as the Connect runtime would.  Per-transform ``predicate`` /
    ``negate`` properties gate individual SMTs.  Unrecognized SMT or
    predicate classes raise at PLAN time (the config-validation contract;
    Connect fails at startup too)."""
    aliases = [a.strip() for a in str(config.get("transforms", "")).split(",") if a.strip()]
    pred_aliases = [
        a.strip() for a in str(config.get("predicates", "")).split(",") if a.strip()
    ]
    preds = {}
    for pa in pred_aliases:
        pcfg = {
            k[len(f"predicates.{pa}.") :]: v
            for k, v in config.items()
            if k.startswith(f"predicates.{pa}.")
        }
        ptype = pcfg.pop("type")
        preds[pa] = (ptype, pcfg)

    steps = []
    for a in aliases:
        prefix = f"transforms.{a}."
        cfg = {k[len(prefix):]: v for k, v in config.items() if k.startswith(prefix)}
        type_name = cfg.pop("type")
        pred = None
        pname = cfg.pop("predicate", None)
        negate = str(cfg.pop("negate", "false")).lower() == "true"
        if pname is not None:
            ptype, pcfg = preds[pname]
            pred = _build_predicate(ptype, pcfg, negate)
        steps.append((type_name, cfg, pred))

    def apply(df: DataFrame) -> DataFrame:
        for type_name, cfg, pred in steps:
            df = _apply_one(df, type_name, cfg, pred)
        return df

    return apply
