"""Sources, sinks, and format mappers (SURVEY.md §3.1).

The reference's connector SPI — `[core] stream/input/source/Source.java`,
`stream/output/sink/Sink.java`, with format mappers
`stream/input/source/SourceMapper.java` / `stream/output/sink/SinkMapper.java`
— is annotation-driven: `@source(type='file', file.uri='…',
@map(type='json', @attributes(id='$.event.id', …)))`. The file
connector is `[ext:io-file] io.siddhi.extension.io.file.source.FileSource`;
the json/csv serdes are `[ext:map-json]
io.siddhi.extension.map.json.sourcemapper.JsonSourceMapper` (with
JSONPath `@attributes` projection) and `[ext:map-csv] CSVSourceMapper`.

Spark mapping: the declared stream schema becomes an explicit
`StructType` handed to `spark.read` (schema is NEVER inferred — Siddhi
schemas are fixed and declared, §2.2); `@attributes` JSONPath
projection becomes `get_json_object` over a raw text scan; sinks are
`DataFrameWriter` calls. Parquet is an engine-native addition (the
reference has no columnar mapper — that is the point of moving to
Spark). Streaming twins use `readStream` with the same schema, the
native directory source.

At 100 TB the scan layer is where scale is won or lost: an explicit
schema means parquet column pruning works, a declared format means no
sampling pass over the data, and directory sources parallelize per
file split with no driver-side work.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Siddhi's seven attribute types (`[qapi] definition/Attribute.java`)
_SIDDHI_TO_SPARK = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bool": T.BooleanType(),
    "object": T.BinaryType(),
}


def siddhi_schema(attributes: list[tuple[str, str]]) -> T.StructType:
    """Declared Siddhi schema → explicit Spark StructType."""
    return T.StructType(
        [T.StructField(n, _SIDDHI_TO_SPARK[t.lower()], True) for n, t in attributes]
    )


@dataclass
class Ann:
    """A parsed `@name(key='v', key2='v2', @nested(...))` annotation."""

    name: str
    options: dict[str, str] = field(default_factory=dict)
    children: list["Ann"] = field(default_factory=list)

    def child(self, name: str) -> "Ann | None":
        for c in self.children:
            if c.name.lower() == name.lower():
                return c
        return None


def parse_annotation(text: str) -> Ann:
    """Parse one annotation string (as stored on `StreamDef.annotations`)."""
    text = text.strip()
    m = re.match(r"@([\w.:]+)\s*(\()?", text)
    if not m:
        raise ValueError(f"bad annotation: {text!r}")
    ann = Ann(name=m.group(1))
    if not m.group(2):
        return ann
    body = text[m.end() : text.rfind(")")]
    for part in _split_args(body):
        part = part.strip()
        if not part:
            continue
        if part.startswith("@"):
            ann.children.append(parse_annotation(part))
        else:
            k, _, v = part.partition("=")
            ann.options[k.strip()] = v.strip().strip("'\"")
    return ann


def _split_args(s: str) -> list[str]:
    out, depth, in_str, buf = [], 0, None, []
    for ch in s:
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in "'\"":
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    out.append("".join(buf))
    return out


def _find_ann(stream_def, name: str) -> Ann | None:
    for raw in stream_def.annotations:
        ann = parse_annotation(raw)
        if ann.name.lower() == name.lower():
            return ann
    return None


def _uri_to_path(ann: Ann) -> str:
    uri = (
        ann.options.get("file.uri")
        or ann.options.get("dir.uri")
        or ann.options.get("uri")
    )
    if uri is None:
        raise ValueError(f"@{ann.name} needs file.uri or dir.uri")
    return re.sub(r"^file:(//)?", "", uri)


def load_file_source(spark: SparkSession, stream_def) -> DataFrame | None:
    """Build the batch DataFrame for a stream declared with
    `@source(type='file', …, @map(type=…))`; None when the stream has
    no file source (caller falls back to an explicitly-passed frame).
    """
    src = _find_ann(stream_def, "source")
    if src is None or src.options.get("type", "").lower() != "file":
        return None
    path = _uri_to_path(src)
    return _read_mapped(spark.read, src, stream_def, path)


def stream_file_source(spark: SparkSession, stream_def) -> DataFrame | None:
    """Streaming twin: the native directory source (`readStream`) with
    the same declared schema — `FileSource`'s tail/dir-watch modes map
    to Spark's file-discovery micro-batching."""
    src = _find_ann(stream_def, "source")
    if src is None or src.options.get("type", "").lower() != "file":
        return None
    path = _uri_to_path(src)
    return _read_mapped(spark.readStream, src, stream_def, path)


def _read_mapped(reader, src: Ann, stream_def, path: str) -> DataFrame:
    mp = src.child("map") or Ann(name="map", options={"type": "json"})
    fmt = mp.options.get("type", "json").lower()
    schema = siddhi_schema(stream_def.attributes)
    if fmt == "json":
        attrs = mp.child("attributes")
        if attrs is not None:
            # `@attributes(a='$.x.y', …)` JSONPath projection
            # (`JsonSourceMapper`): raw text scan + get_json_object
            raw = reader.schema(T.StructType([T.StructField("value", T.StringType())])).text(path)
            cols = []
            for (name, styp) in stream_def.attributes:
                jpath = attrs.options.get(name, f"$.{name}")
                cols.append(
                    F.get_json_object(F.col("value"), jpath)
                    .cast(_SIDDHI_TO_SPARK[styp.lower()])
                    .alias(name)
                )
            return raw.select(*cols)
        return reader.schema(schema).json(path)
    if fmt == "csv":
        opts = {
            "sep": mp.options.get("delimiter", ","),
            "header": mp.options.get("header", "false"),
        }
        return reader.schema(schema).options(**opts).csv(path)
    if fmt == "parquet":
        # engine-native columnar path; declared schema enforced by select
        df = reader.schema(schema).parquet(path)
        return df.select(*[c for c, _t in stream_def.attributes])
    if fmt == "text":
        # `[ext:map-text] TextSourceMapper` regex mode: one attribute
        # per `regex.<attr>='pattern'` option, group 1 extracted per
        # line; a missing `regex.<attr>` grabs the whole line
        raw = reader.schema(
            T.StructType([T.StructField("value", T.StringType())])
        ).text(path)
        cols = []
        for name, styp in stream_def.attributes:
            pat = mp.options.get(f"regex.{name}")
            col = (
                F.regexp_extract(F.col("value"), pat, 1)
                if pat
                else F.col("value")
            )
            cols.append(col.cast(_SIDDHI_TO_SPARK[styp.lower()]).alias(name))
        return raw.select(*cols)
    if fmt in ("xml", "keyvalue"):
        # one serialized event per line; same serde as the message path
        raw = reader.schema(
            T.StructType([T.StructField("value", T.StringType())])
        ).text(path)
        return map_message_value(raw, mp, stream_def)
    raise ValueError(
        f"unsupported @map type {fmt!r} "
        "(json|csv|parquet|text|xml|keyvalue)"
    )


def write_file_sink(df: DataFrame, stream_def) -> str | None:
    """Write a query output declared with `@sink(type='file', …,
    @map(type=…))`; returns the path written, None when the stream has
    no file sink. Batch fixed point of the continuous sink: one
    overwrite per run (`[ext:io-file] FileSink` appends per event)."""
    sink = _find_ann(stream_def, "sink")
    if sink is None or sink.options.get("type", "").lower() != "file":
        return None
    path = _uri_to_path(sink)
    mp = sink.child("map") or Ann(name="map", options={"type": "json"})
    fmt = mp.options.get("type", "json").lower()
    if fmt not in ("json", "csv", "parquet"):
        raise ValueError(f"unsupported @sink @map type {fmt!r}")
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", mp.options.get("header", "false"))
    getattr(writer, fmt)(path)
    return path


# ---------------------------------------------------------------------------
# kafka connector (`[ext:io-kafka] io.siddhi.extension.io.kafka.source.
# KafkaSource` / `sink.KafkaSink`) → Spark's native kafka integration.
# The option mapping and value serde are engine logic (pure, testable
# without a broker); the transport itself is `format("kafka")`, which
# needs the spark-sql-kafka package on the classpath at deploy time.
# ---------------------------------------------------------------------------

def kafka_options(src: Ann) -> dict[str, str]:
    """Siddhi kafka annotation options → Spark kafka reader options.

    `@source(type='kafka', bootstrap.servers='…', topic.list='t1,t2',
    group.id='g', …)` — `KafkaSource` option names on the left."""
    opts: dict[str, str] = {}
    servers = src.options.get("bootstrap.servers") or src.options.get(
        "bootstrap.server.list"
    )
    if not servers:
        raise ValueError("@source(type='kafka') needs bootstrap.servers")
    opts["kafka.bootstrap.servers"] = servers
    topics = src.options.get("topic.list") or src.options.get("topic")
    if not topics:
        raise ValueError("@source(type='kafka') needs topic.list")
    opts["subscribe"] = topics
    if "group.id" in src.options:
        opts["kafka.group.id"] = src.options["group.id"]
    opts["startingOffsets"] = src.options.get("starting.offsets", "earliest")
    return opts


_PANDAS_DTYPES = {
    "int": "int32",
    "long": "int64",
    "float": "float32",
    "double": "float64",
    "bool": "bool",
    "string": "object",
    "object": "object",
}


def map_message_value(raw: DataFrame, src_or_map: Ann, stream_def) -> DataFrame:
    """Wire rows (`value` string-or-binary column) → the declared
    stream schema via the `@map` serde. This is the full SourceMapper
    family over message transports:

    - json (`JsonSourceMapper`, JSONPath `@attributes`), csv
      (`CSVSourceMapper`), xml (`[ext:map-xml] XmlSourceMapper`,
      xpath `@attributes`, `enclosing.element`), keyvalue
      (`[ext:map-keyvalue] KeyValueSourceMapper`) — all pure Catalyst
      (`from_json`/`from_csv`/`xpath_string`/`str_to_map`);
    - avro / protobuf / binary — per-event wire codecs
      (``wire_codecs``) run Arrow-batched in `mapInPandas`. On a
      cluster with spark-avro / spark-protobuf loaded, swap in
      `from_avro(value, wire_codecs.avro_schema_json(...))` /
      `from_protobuf` — same declared schema either way.
    """
    mp = (
        src_or_map
        if src_or_map.name.lower() == "map"
        else src_or_map.child("map")
    ) or Ann(name="map", options={"type": "json"})
    fmt = mp.options.get("type", "json").lower()
    schema = siddhi_schema(stream_def.attributes)
    val = F.col("value").cast("string")
    if fmt == "json":
        attrs = mp.child("attributes")
        if attrs is not None:
            cols = [
                F.get_json_object(val, attrs.options.get(n, f"$.{n}"))
                .cast(_SIDDHI_TO_SPARK[t.lower()])
                .alias(n)
                for n, t in stream_def.attributes
            ]
            return raw.select(*cols)
        return raw.select(F.from_json(val, schema).alias("v")).select("v.*")
    if fmt == "csv":
        sep = mp.options.get("delimiter", ",")
        return raw.select(
            F.from_csv(val, schema.simpleString(), {"sep": sep}).alias("v")
        ).select("v.*")
    if fmt == "xml":
        # `<event><a>1</a>…</event>` per message; `@attributes` holds
        # custom xpaths; `enclosing.element` overrides the root tag
        enc = mp.options.get("enclosing.element", "event").strip("/")
        attrs = mp.child("attributes")
        cols = []
        for n, t in stream_def.attributes:
            xp = (
                attrs.options.get(n, f"/{enc}/{n}/text()")
                if attrs is not None
                else f"/{enc}/{n}/text()"
            )
            cols.append(
                F.xpath_string(val, F.lit(xp))
                .cast(_SIDDHI_TO_SPARK[t.lower()])
                .alias(n)
            )
        return raw.select(*cols)
    if fmt == "keyvalue":
        # `a:1,b:text` messages; `@attributes` remaps attribute → key
        pair_sep = mp.options.get("delimiter", ",")
        kv_sep = mp.options.get("kv.separator", ":")
        attrs = mp.child("attributes")
        m = F.str_to_map(val, F.lit(pair_sep), F.lit(kv_sep))
        cols = []
        for n, t in stream_def.attributes:
            key = attrs.options.get(n, n) if attrs is not None else n
            cols.append(
                m.getItem(key).cast(_SIDDHI_TO_SPARK[t.lower()]).alias(n)
            )
        return raw.select(*cols)
    if fmt in ("avro", "protobuf", "binary"):
        from collections.abc import Iterator

        import pandas as pd

        from .wire_codecs import DECODERS

        decoder = DECODERS[fmt]
        attributes = list(stream_def.attributes)
        names = [n for n, _t in attributes]
        dtypes = {n: _PANDAS_DTYPES[t.lower()] for n, t in attributes}

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = [decoder(bytes(v), attributes) for v in pdf["value"]]
                out = pd.DataFrame(rows, columns=names)
                yield out.astype(dtypes) if len(out) else pd.DataFrame(
                    {n: pd.Series(dtype=dtypes[n]) for n in names}
                )

        return raw.select("value").mapInPandas(run, schema)
    raise ValueError(
        f"unsupported message @map type {fmt!r} "
        "(json|csv|xml|keyvalue|avro|protobuf|binary)"
    )


def encode_message_value(df: DataFrame, fmt: str, stream_def) -> DataFrame:
    """SinkMapper twin: declared-schema rows → one binary `value`
    column (`AvroSinkMapper`/`ProtobufSinkMapper`/`BinarySinkMapper`).
    Arrow-batched; the JVM swap is `to_avro(struct(*))` /
    `to_protobuf`."""
    from collections.abc import Iterator

    import pandas as pd

    from .wire_codecs import ENCODERS

    encoder = ENCODERS[fmt]
    attributes = list(stream_def.attributes)
    names = [n for n, _t in attributes]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = [
                encoder(tuple(row), attributes)
                for row in zip(*[pdf[n] for n in names])
            ] if len(pdf) else []
            yield pd.DataFrame({"value": pd.Series(vals, dtype="object")})

    return df.select(*names).mapInPandas(
        run, T.StructType([T.StructField("value", T.BinaryType())])
    )


def parse_kafka_value(raw: DataFrame, src: Ann, stream_def) -> DataFrame:
    """Kafka wire rows (`value` binary, plus key/topic/partition/offset/
    timestamp) → the declared stream schema via the `@map` serde —
    the shared ``map_message_value`` dispatch, so every message mapper
    (json/csv/xml/keyvalue/avro/protobuf/binary) works over kafka.
    Testable on any DataFrame with a kafka-shaped schema."""
    return map_message_value(raw, src, stream_def)


def kafka_sink_options(sink: Ann) -> dict[str, str]:
    """`@sink(type='kafka', bootstrap.servers='…', topic='t')`
    (`[ext:io-kafka] KafkaSink`) → Spark kafka writer options."""
    opts: dict[str, str] = {}
    servers = sink.options.get("bootstrap.servers") or sink.options.get(
        "bootstrap.server.list"
    )
    if not servers:
        raise ValueError("@sink(type='kafka') needs bootstrap.servers")
    opts["kafka.bootstrap.servers"] = servers
    topic = sink.options.get("topic") or sink.options.get("topic.list")
    if not topic:
        raise ValueError("@sink(type='kafka') needs topic")
    opts["topic"] = topic.split(",")[0]
    return opts


def format_sink_value(df: DataFrame, sink_or_map: Ann, stream_def) -> DataFrame:
    """SinkMapper dispatch for message transports: declared-schema rows
    → one `value` column ready for `format("kafka")` (or any byte
    sink). json/csv/keyvalue serialize in Catalyst (`to_json`,
    `concat_ws`); avro/protobuf/binary use the wire codecs
    (``encode_message_value``). Optionally adds a `key` column from
    the `key` option (the kafka partitioning key — keep it the stream's
    partition attribute so per-key ordering survives the transport)."""
    mp = (
        sink_or_map
        if sink_or_map.name.lower() == "map"
        else sink_or_map.child("map")
    ) or Ann(name="map", options={"type": "json"})
    fmt = mp.options.get("type", "json").lower()
    names = [n for n, _t in stream_def.attributes]
    key_attr = (
        sink_or_map.options.get("key")
        if sink_or_map.name.lower() != "map"
        else None
    )
    value_expr = None
    if fmt == "json":
        value_expr = F.to_json(F.struct(*[F.col(n) for n in names]))
    elif fmt == "csv":
        sep = mp.options.get("delimiter", ",")
        value_expr = F.concat_ws(sep, *[F.col(n).cast("string") for n in names])
    elif fmt == "keyvalue":
        pair_sep = mp.options.get("delimiter", ",")
        kv_sep = mp.options.get("kv.separator", ":")
        parts = [
            F.concat(F.lit(n), F.lit(kv_sep), F.col(n).cast("string"))
            for n in names
        ]
        value_expr = F.concat_ws(pair_sep, *parts)
    elif fmt in ("avro", "protobuf", "binary"):
        if key_attr:
            raise ValueError(
                "key= with a wire-codec sink mapper: route the key "
                "through the codec payload, or use the JVM "
                "to_avro/to_protobuf swap which composes with key "
                "columns"
            )
        return encode_message_value(df, fmt, stream_def)
    else:
        raise ValueError(
            f"unsupported sink @map type {fmt!r} "
            "(json|csv|keyvalue|avro|protobuf|binary)"
        )
    cols = [value_expr.alias("value")]
    if key_attr:
        cols.insert(0, F.col(key_attr).cast("string").alias("key"))
    return df.select(*cols)


def stream_http_source(spark: SparkSession, stream_def) -> DataFrame | None:
    """`@source(type='http', receiver.url='http://host:port/path',
    @map(type='json'))` (`[ext:io-http] HttpSource`) — the operator's
    flagship ingest (its example apps receive JSON over HTTP).

    Spark analog: the socket test transport. `HttpSource`'s engine-side
    role is "receive a payload string, hand it to the source mapper" —
    identical here: the engine connects to the url's host:port and maps
    each line-delimited payload through the same `@map` serde
    (``map_message_value``). In production HTTP termination lives at a
    gateway (the operator fronts it with a k8s Service/Ingress) that
    forwards payloads to a durable transport; point `receiver.url` at
    that forwarder. `basic.auth.*` options are accepted and ignored —
    auth belongs to the gateway."""
    src = _find_ann(stream_def, "source")
    if src is None or src.options.get("type", "").lower() != "http":
        return None
    url = src.options.get("receiver.url") or src.options.get("url")
    if not url:
        raise ValueError("@source(type='http') needs receiver.url")
    m = re.match(r"https?://([^:/]+)(?::(\d+))?", url)
    if not m:
        raise ValueError(f"bad receiver.url {url!r}")
    host = m.group(1)
    port = int(m.group(2) or 8080)
    if host == "0.0.0.0":  # listen-anywhere url → local test transport
        host = "localhost"
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return map_message_value(raw, src, stream_def)


def stream_kafka_source(spark: SparkSession, stream_def) -> DataFrame | None:
    """`readStream.format('kafka')` with the mapped options + serde.
    Raises with deploy guidance when the kafka package is absent (it is
    a deploy-time artifact, not an engine dependency)."""
    src = _find_ann(stream_def, "source")
    if src is None or src.options.get("type", "").lower() != "kafka":
        return None
    reader = spark.readStream.format("kafka").options(**kafka_options(src))
    try:
        raw = reader.load()
    except Exception as exc:  # pragma: no cover - classpath-dependent
        raise RuntimeError(
            "kafka source needs the spark-sql-kafka package on the "
            "classpath (spark-submit --packages org.apache.spark:"
            f"spark-sql-kafka-0-10_2.13:{spark.version})"
        ) from exc
    return parse_kafka_value(raw, src, stream_def)


# ---------------------------------------------------------------------------
# `@OnError(action='STREAM')` — the reference routes events that fail
# source mapping to a `!StreamName` fault stream
# (`[core] stream/StreamJunction.java`). For json file sources the
# fixed point is PERMISSIVE parsing with a corrupt-record column:
# clean rows feed S, unparseable lines feed !S (raw line + error tag).
# ---------------------------------------------------------------------------

def has_on_error_stream(stream_def) -> bool:
    ann = _find_ann(stream_def, "OnError")
    return ann is not None and ann.options.get("action", "").upper() == "STREAM"


def load_file_source_with_faults(
    spark: SparkSession, stream_def
) -> tuple[DataFrame, DataFrame] | None:
    """(clean, faults) for a json file source under
    `@OnError(action='STREAM')`; faults carry `(raw string,
    error string)`. None when not applicable (no file json source)."""
    src = _find_ann(stream_def, "source")
    if src is None or src.options.get("type", "").lower() != "file":
        return None
    mp = src.child("map")
    if mp is not None and mp.options.get("type", "json").lower() != "json":
        return None
    path = _uri_to_path(src)
    schema = siddhi_schema(stream_def.attributes).add("_corrupt", T.StringType())
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
        .cache()
    )
    clean = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    faults = df.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw"),
        F.lit("source-mapper: malformed json").alias("error"),
    )
    return clean, faults


# ---------------------------------------------------------------------------
# Custom-source plugin SPI — the `Source` extension point (`[core]
# stream/input/source/Source.java` + `@Extension` registration;
# SURVEY.md §3.11 "custom source/sink SPI"). A plugin is a function
# (spark, stream_def, ann) -> DataFrame registered under a transport
# type; `run_app` routes any `@source(type='X', ...)` whose type is
# neither a built-in transport nor handled by a passed frame to this
# registry, so user transports load exactly like `type='file'`.
# (Sink-side: `streaming.sinks` foreachBatch targets are already plain
# functions — the registry completes the symmetric source side.)
# ---------------------------------------------------------------------------
SOURCE_PLUGINS: dict[str, object] = {}


def register_source(type_name: str):
    """Register a custom `@source(type='<type_name>')` loader. The
    decorated function receives (spark, stream_def, ann) — the parsed
    annotation gives it its options — and returns a DataFrame matching
    the stream's declared schema."""

    def deco(fn):
        SOURCE_PLUGINS[type_name.lower()] = fn
        return fn

    return deco


def load_plugin_source(spark: SparkSession, stream_def) -> DataFrame | None:
    """Dispatch a declared stream to a registered custom source; None
    when the stream has no @source or its type has no plugin."""
    src = _find_ann(stream_def, "source")
    if src is None:
        return None
    fn = SOURCE_PLUGINS.get(src.options.get("type", "").lower())
    if fn is None:
        return None
    return fn(spark, stream_def, src)


@register_source("inline")
def inline_source(spark: SparkSession, stream_def, ann: Ann) -> DataFrame:
    """Worked SPI example — an inline test-data transport (the
    reference ships exactly this shape as its unit-test `InMemory`
    source): `@source(type='inline', data='a,b,c;d,e,f')` carries
    semicolon-separated records of comma-separated fields, parsed
    against the declared schema. Rows build driver-side (the payload
    is annotation-sized by construction) and parallelize normally."""
    data = ann.options.get("data", "")
    schema = siddhi_schema(stream_def.attributes)
    rows = []
    for rec in filter(None, (r.strip() for r in data.split(";"))):
        vals = [v.strip() for v in rec.split(",")]
        rows.append(
            tuple(
                None if v == "" else v
                for v in vals
            )
        )
    raw = spark.createDataFrame(
        rows, T.StructType([T.StructField(f.name, T.StringType()) for f in schema])
    )
    return raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema]
    )


def http_sink_foreach_batch(stream_def, url: str | None = None):
    """`@sink(type='http', publisher.url=…, @map(type=…))`
    (`[ext:io-http] HttpSink`) — the outbound half of the http pair:
    serialize each event through the declared `@map` serde and POST it
    to the publisher url. Returns a foreachBatch target.

    Scale shape: serialization happens in Catalyst
    (``format_sink_value`` — to_json/concat_ws/wire codecs), and the
    POSTs run per PARTITION on the executors (one connection per
    partition per batch, newline-delimited payloads) — nothing
    collects to the driver at any batch size. The reference posts one
    request per event; batching per partition is the documented
    difference (its http sink offers `chunked` batching too).
    `basic.auth.*`/header options are accepted and ignored — auth
    belongs at the gateway, as on the source side."""
    sink = _find_ann(stream_def, "sink")
    if sink is None or sink.options.get("type", "").lower() != "http":
        return None
    target = url or sink.options.get("publisher.url") or sink.options.get("url")
    if not target:
        raise ValueError("@sink(type='http') needs publisher.url")

    def _post(batch: DataFrame, epoch_id: int) -> None:
        vals = format_sink_value(batch, sink, stream_def).select("value")

        def _send(rows) -> None:
            import urllib.request

            payload = "\n".join(r.value for r in rows)
            if not payload:
                return
            req = urllib.request.Request(
                target,
                data=payload.encode("utf-8"),
                headers={"Content-Type": "application/octet-stream"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=30) as resp:
                resp.read()

        vals.foreachPartition(_send)

    return _post
