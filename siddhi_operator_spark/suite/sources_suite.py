"""Suite: the §3.1 source/mapper connector layer, driver-proven.

Each entry stages the events fixture into the transport's wire format
(a /tmp directory of CSV lines, or a kafka-shaped binary-value frame),
then makes the ENGINE read it back through the annotation path —
``@source(type=…, @map(type=…))`` → ``_read_mapped`` /
``parse_kafka_value`` — and aggregates. The oracle runs the same
aggregate on the parquet table, so a serde bug anywhere in the
source→mapper→schema chain flips the value hash.

Upstream surfaces proven here: `[ext:io-file] FileSource`/`FileSink`,
`[ext:io-http] HttpSource` (real socket), `[ext:io-kafka]
KafkaSource`'s value decode, `[ext:io-cdc] CDCSource` (Debezium
envelopes + change-log fold), the `@map` families json (JSONPath
`@attributes`)/csv/xml/keyvalue, the avro/protobuf/siddhi-binary wire
codecs (sink→source byte roundtrips), and `@OnError(action='STREAM')`
fault routing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..fpround import r4
from .registry import register


# Hard bound on driver-resident payloads for the socket-backed http
# entry (sf0.01 has 150 signup rows; sf0.1 ~1.5k; anything past this is
# a misconfigured gate, not a workload).
_HTTP_MAX_PAYLOADS = 10_000


def _stage_dir(sf: str, kind: str) -> str:
    return f"/tmp/spark_graft_src_{kind}_{os.path.basename(os.path.normpath(sf))}"


@register(
    "source_file_csv_mapper",
    oracle="""
    SELECT event_type,
           count(*)                        AS n,
           round(1e-9 + sum(value), 4)     AS sum_value,
           CAST(min(epoch_ms(ts)) AS BIGINT) AS first_ms
    FROM events
    GROUP BY event_type
    """,
    tags=("source", "mapper", "csv"),
)
def source_file_csv_mapper(spark: SparkSession, sf: str) -> DataFrame:
    """`@source(type='file', @map(type='csv'))` end-to-end
    (`[ext:io-file] FileSource` + `[ext:map-csv] CSVSourceMapper`):
    the events fixture is staged as pipe-delimited CSV, then the
    engine reads it back through the annotation path — declared
    siddhi types drive the CSV parse — and aggregates per event
    type. The oracle aggregates the parquet directly, so a mapper
    type-coercion bug (long ts read as string, double truncated)
    breaks the hash, not just the row count."""
    from ..sources import load_file_source
    from ..siddhiql.model import StreamDef

    stage = _stage_dir(sf, "csv")
    (
        load(spark, sf, "events")
        .select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "user_id",
            "event_type",
            "value",
        )
        .write.mode("overwrite")
        .option("sep", "|")
        .csv(stage)
    )
    stream = StreamDef(
        name="CsvEvents",
        attributes=[
            ("event_id", "long"),
            ("ts_ms", "long"),
            ("user_id", "long"),
            ("event_type", "string"),
            ("value", "double"),
        ],
        annotations=[
            f"@source(type='file', dir.uri='file:{stage}', "
            "@map(type='csv', delimiter='|'))"
        ],
    )
    df = load_file_source(spark, stream)
    if df is None:  # contract check — must survive python -O
        raise RuntimeError("load_file_source returned None")
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        r4(F.sum("value"), 4).alias("sum_value"),
        F.min("ts_ms").alias("first_ms"),
    )


@register(
    "source_kafka_json_value",
    oracle="""
    SELECT user_id,
           count(*)                    AS n,
           round(1e-9 + sum(value), 4) AS sum_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
    tags=("source", "mapper", "kafka", "json"),
)
def source_kafka_json_value(spark: SparkSession, sf: str) -> DataFrame:
    """Kafka value decode end-to-end (`[ext:io-kafka] KafkaSource` +
    `[ext:map-json] JsonSourceMapper` JSONPath `@attributes`): events
    are re-shaped into kafka wire rows — binary `value` holding a
    NESTED json envelope `{"meta": …, "payload": …}`, plus
    key/topic/partition/offset/timestamp columns exactly as Spark's
    kafka reader yields them — then `parse_kafka_value` projects the
    declared schema back out via `$.payload.…`/`$.meta.…` JSONPaths.
    Pure Catalyst (`get_json_object`); no broker needed, which is
    precisely why the decode is engine logic and the transport is
    `format("kafka")` config."""
    from ..sources import parse_annotation, parse_kafka_value
    from ..siddhiql.model import StreamDef

    ev = load(spark, sf, "events").filter(F.col("event_type") == "purchase")
    wire = ev.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(
                F.struct(F.col("user_id").alias("uid")).alias("meta"),
                F.struct(
                    F.col("event_id").alias("id"), F.col("value").alias("amount")
                ).alias("payload"),
            )
        )
        .cast("binary")
        .alias("value"),
        F.lit("events").alias("topic"),
        (F.col("event_id") % 8).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
    )
    src = parse_annotation(
        "@source(type='kafka', bootstrap.servers='demo:9092', "
        "topic.list='events', "
        "@map(type='json', @attributes(user_id='$.meta.uid', "
        "event_id='$.payload.id', value='$.payload.amount')))"
    )
    stream = StreamDef(
        name="KafkaEvents",
        attributes=[
            ("user_id", "long"),
            ("event_id", "long"),
            ("value", "double"),
        ],
        annotations=[],
    )
    decoded = parse_kafka_value(wire, src, stream)
    return decoded.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        r4(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "source_cdc_debezium",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, value,
             CASE WHEN event_type = 'error' THEN 'delete' ELSE 'update' END AS op,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id, round(1e-9 + value, 4) AS value
    FROM ranked WHERE rn = 1 AND op != 'delete'
    """,
    tags=("source", "cdc", "debezium"),
)
def source_cdc_debezium(spark: SparkSession, sf: str) -> DataFrame:
    """Inbound CDC end-to-end (`[ext:io-cdc] CDCSource` via Debezium
    envelopes): the events fixture is re-shaped into a Debezium change
    log — errors become deletes (`op:'d'`, `before` only), everything
    else upserts (`op:'u'`, `after`) — staged as JSON lines, then the
    engine ingests it back (`parse_debezium`) and folds the log into
    the current table state (`apply_cdc`: one keyed max_by, no global
    sort). The oracle derives the same final state relationally:
    latest change per user wins, deleted users absent."""
    from ..fpround import r4 as _r4
    from ..siddhiql.model import StreamDef
    from ..sources.cdc_source import apply_cdc, parse_debezium

    stage = _stage_dir(sf, "cdc")
    ev = load(spark, sf, "events")
    row = F.struct(
        F.col("user_id"), F.col("event_id"), F.col("value")
    )
    is_del = F.col("event_type") == "error"
    envelope = F.to_json(
        F.struct(
            F.struct(
                F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"),
                F.when(is_del, row).alias("before"),
                F.when(~is_del, row).alias("after"),
                F.unix_millis("ts").alias("ts_ms"),
            ).alias("payload")
        )
    )
    ev.select(envelope.alias("value")).write.mode("overwrite").text(stage)

    raw = spark.read.text(stage).withColumnRenamed("value", "value")
    stream = StreamDef(
        name="UserRows",
        attributes=[
            ("user_id", "long"),
            ("event_id", "long"),
            ("value", "double"),
        ],
        annotations=[],
    )
    changes = parse_debezium(raw, stream)
    state = apply_cdc(changes, keys=["user_id"], order_cols=("ts_ms", "event_id"))
    return state.select("user_id", "event_id", _r4("value", 4).alias("value"))


@register(
    "source_file_xml_mapper",
    oracle="""
    SELECT event_id, user_id, round(1e-9 + value, 4) AS value
    FROM events
    WHERE event_type = 'click'
    """,
    tags=("source", "mapper", "xml"),
)
def source_file_xml_mapper(spark: SparkSession, sf: str) -> DataFrame:
    """`@map(type='xml')` over the file transport (`[ext:map-xml]
    XmlSourceMapper`): one `<event>…</event>` element per line, xpath
    projection per declared attribute (Catalyst `xpath_string`)."""
    from ..siddhiql.model import StreamDef
    from ..sources import _read_mapped, parse_annotation

    stage = _stage_dir(sf, "xml")
    ev = load(spark, sf, "events").filter(F.col("event_type") == "click")
    xml = F.concat(
        F.lit("<event><event_id>"), F.col("event_id").cast("string"),
        F.lit("</event_id><user_id>"), F.col("user_id").cast("string"),
        F.lit("</user_id><value>"), F.col("value").cast("string"),
        F.lit("</value></event>"),
    )
    ev.select(xml.alias("value")).write.mode("overwrite").text(stage)
    src = parse_annotation(
        f"@source(type='file', dir.uri='file:{stage}', @map(type='xml'))"
    )
    stream = StreamDef(
        name="XmlEvents",
        attributes=[
            ("event_id", "long"),
            ("user_id", "long"),
            ("value", "double"),
        ],
        annotations=[],
    )
    df = _read_mapped(spark.read, src, stream, stage)
    from ..fpround import r4 as _r4

    return df.select("event_id", "user_id", _r4("value", 4).alias("value"))


@register(
    "source_file_keyvalue_mapper",
    oracle="""
    SELECT user_id, count(*) AS n, round(1e-9 + max(value), 4) AS max_value
    FROM events
    WHERE event_type = 'view'
    GROUP BY user_id
    """,
    tags=("source", "mapper", "keyvalue"),
)
def source_file_keyvalue_mapper(spark: SparkSession, sf: str) -> DataFrame:
    """`@map(type='keyvalue')` over the file transport
    (`[ext:map-keyvalue] KeyValueSourceMapper`): `k:v,k:v` messages,
    `@attributes` remapping attribute → wire key (`str_to_map`)."""
    from ..siddhiql.model import StreamDef
    from ..sources import _read_mapped, parse_annotation

    stage = _stage_dir(sf, "kv")
    ev = load(spark, sf, "events").filter(F.col("event_type") == "view")
    kv = F.concat(
        F.lit("u:"), F.col("user_id").cast("string"),
        F.lit(",v:"), F.col("value").cast("string"),
    )
    ev.select(kv.alias("value")).write.mode("overwrite").text(stage)
    src = parse_annotation(
        f"@source(type='file', dir.uri='file:{stage}', "
        "@map(type='keyvalue', @attributes(user_id='u', value='v')))"
    )
    stream = StreamDef(
        name="KvEvents",
        attributes=[("user_id", "long"), ("value", "double")],
        annotations=[],
    )
    df = _read_mapped(spark.read, src, stream, stage)
    from ..fpround import r4 as _r4

    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        _r4(F.max("value"), 4).alias("max_value"),
    )


@register(
    "source_avro_wire_roundtrip",
    oracle="""
    SELECT user_id,
           count(*)                    AS n,
           round(1e-9 + sum(value), 4) AS sum_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
    tags=("source", "mapper", "avro", "wire"),
)
def source_avro_wire_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Avro wire serde round trip (`[ext:map-avro] AvroSinkMapper` →
    `AvroSourceMapper`): purchase events encode to avro binary records
    through the SINK mapper (`encode_message_value`, Arrow-batched
    pure-python codec), stage as a binary column, then decode back
    through the SOURCE mapper (`map_message_value`) and aggregate.
    A byte-level asymmetry anywhere in the zigzag/varint/IEEE layout
    breaks the value hash. On a cluster with spark-avro the same
    mapper seam swaps to `to_avro`/`from_avro`."""
    return _wire_roundtrip(spark, sf, "avro")


@register(
    "source_onerror_fault_split",
    oracle="""
    SELECT 'clean' AS lane, count(*) AS n
    FROM events WHERE event_type != 'error'
    UNION ALL
    SELECT 'fault', count(*) FROM events WHERE event_type = 'error'
    """,
    tags=("source", "onerror", "fault"),
)
def source_onerror_fault_split(spark: SparkSession, sf: str) -> DataFrame:
    """`@OnError(action='STREAM')` fault routing (`[core]
    StreamJunction` fault propagation): the staged change log holds
    valid JSON for non-error events and MALFORMED lines for error
    events; the fault-splitting reader must route every malformed line
    to the `!stream` lane and every clean line to the stream — the
    oracle pins both lane counts from the relational side."""
    from ..siddhiql.model import StreamDef
    from ..sources import load_file_source_with_faults

    stage = _stage_dir(sf, "onerror")
    ev = load(spark, sf, "events")
    is_err = F.col("event_type") == "error"
    line = F.when(
        is_err,
        # malformed on purpose: unclosed brace
        F.concat(F.lit('{"event_id": '), F.col("event_id").cast("string")),
    ).otherwise(
        F.to_json(F.struct("event_id", "user_id", "value"))
    )
    ev.select(line.alias("value")).write.mode("overwrite").text(stage)

    stream = StreamDef(
        name="ErrEvents",
        attributes=[
            ("event_id", "long"),
            ("user_id", "long"),
            ("value", "double"),
        ],
        annotations=[
            f"@source(type='file', dir.uri='file:{stage}', @map(type='json'))",
            "@OnError(action='STREAM')",
        ],
    )
    pair = load_file_source_with_faults(spark, stream)
    if pair is None:  # contract check — must survive python -O
        raise RuntimeError("load_file_source_with_faults returned None")
    clean, faults = pair
    return clean.select(F.lit("clean").alias("lane")).union(
        faults.select(F.lit("fault").alias("lane"))
    ).groupBy("lane").agg(F.count(F.lit(1)).alias("n"))


def _wire_roundtrip(spark: SparkSession, sf: str, fmt: str) -> DataFrame:
    """Shared body for the avro/protobuf/binary wire serde rows."""
    from ..siddhiql.model import StreamDef
    from ..sources import (
        encode_message_value,
        map_message_value,
        parse_annotation,
    )

    stage = _stage_dir(sf, fmt)
    stream = StreamDef(
        name=f"{fmt.title()}Events",
        attributes=[
            ("user_id", "long"),
            ("event_id", "long"),
            ("value", "double"),
        ],
        annotations=[],
    )
    ev = load(spark, sf, "events").filter(F.col("event_type") == "purchase")
    wire = encode_message_value(
        ev.select("user_id", "event_id", "value"), fmt, stream
    )
    wire.write.mode("overwrite").parquet(stage)
    raw = spark.read.parquet(stage)
    decoded = map_message_value(raw, parse_annotation(f"@map(type='{fmt}')"), stream)
    return decoded.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        r4(F.sum("value"), 4).alias("sum_value"),
    )


_WIRE_ORACLE = """
    SELECT user_id,
           count(*)                    AS n,
           round(1e-9 + sum(value), 4) AS sum_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """


@register(
    "source_protobuf_wire_roundtrip",
    oracle=_WIRE_ORACLE,
    tags=("source", "mapper", "protobuf", "wire"),
)
def source_protobuf_wire_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Protobuf wire serde round trip (`[ext:map-protobuf]
    ProtobufSinkMapper` → `ProtobufSourceMapper`): varint/fixed64
    field encoding, field number = attribute position + 1; the JVM
    swap is `to_protobuf`/`from_protobuf`."""
    return _wire_roundtrip(spark, sf, "protobuf")


@register(
    "source_binary_wire_roundtrip",
    oracle=_WIRE_ORACLE,
    tags=("source", "mapper", "binary", "wire"),
)
def source_binary_wire_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Siddhi binary wire serde round trip (`[ext:map-binary]`,
    `BinaryEventConverter` layout family): schema-ordered big-endian
    fixed-width numerics + length-prefixed UTF-8."""
    return _wire_roundtrip(spark, sf, "binary")


@register(
    "source_http_json_stream",
    oracle="""
    SELECT user_id, count(*) AS n, round(1e-9 + sum(value), 4) AS sum_value
    FROM events
    WHERE event_type = 'signup'
    GROUP BY user_id
    """,
    tags=("source", "http", "streaming"),
)
def source_http_json_stream(spark: SparkSession, sf: str) -> DataFrame:
    """`@source(type='http', receiver.url=…, @map(type='json'))`
    (`[ext:io-http] HttpSource`) end-to-end over a REAL socket: a
    local server serves the signup events as JSON-line payloads, the
    engine's http transport streams + maps them, and the aggregate
    must match the relational oracle. Completion is deterministic:
    the payload count is known up front, so the reader drains until
    exactly that many rows arrived (bounded by a deadline)."""
    import json as _json
    import socket
    import threading
    import time
    import uuid

    from ..siddhiql.model import StreamDef
    from ..sources import stream_http_source

    src = (
        load(spark, sf, "events")
        .filter(F.col("event_type") == "signup")
        .select("event_id", "user_id", "value")
    )
    # This is the one registry entry whose cost is driver-resident (the
    # payloads feed a real socket server on the driver thread). That is
    # the correct test transport at oracle scale (sf0.01 = 150 rows),
    # but at a large sf it would hang the gate — so bound it loudly
    # instead of collecting unboundedly.
    n_src = src.count()
    if n_src > _HTTP_MAX_PAYLOADS:
        raise ValueError(
            f"source_http_json_stream is a socket-transport conformance "
            f"entry, bounded to {_HTTP_MAX_PAYLOADS} driver-resident "
            f"payloads; got {n_src} signup rows at sf dir {sf!r}. Run it "
            f"against sf0.01 or smaller."
        )
    ev = src.collect()
    payloads = [
        _json.dumps(
            {"event_id": r.event_id, "user_id": r.user_id, "value": r.value}
        )
        for r in ev
    ]

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("localhost", 0))
    port = server.getsockname()[1]
    server.listen(1)

    def serve() -> None:
        try:
            conn, _ = server.accept()
            with conn:
                conn.sendall(("\n".join(payloads) + "\n").encode())
                time.sleep(60)  # hold the transport open while Spark drains
        except OSError:
            pass

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    stream = StreamDef(
        name="HttpEvents",
        attributes=[
            ("event_id", "long"),
            ("user_id", "long"),
            ("value", "double"),
        ],
        annotations=[
            f"@source(type='http', receiver.url='http://localhost:{port}/e', "
            "@map(type='json'))"
        ],
    )
    s = stream_http_source(spark, stream)
    if s is None:  # contract check — must survive python -O
        raise RuntimeError("stream_http_source returned None")
    name = f"http_{uuid.uuid4().hex[:8]}"
    q = (
        s.writeStream.format("memory").queryName(name).outputMode("append").start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.table(name).count() >= len(payloads):
                break
            time.sleep(0.5)
    finally:
        q.stop()
        server.close()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r4(F.sum("value"), 4).alias("sum_value"),
        )
    )


@register(
    "sink_file_csv_roundtrip",
    oracle="""
    SELECT event_type,
           count(*)                    AS n,
           round(1e-9 + sum(value), 4) AS sum_value
    FROM events
    WHERE value > 250
    GROUP BY event_type
    """,
    tags=("sink", "mapper", "csv"),
)
def sink_file_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """`@sink(type='file', @map(type='csv'))` (`[ext:io-file] FileSink`
    + `[ext:map-csv] CSVSinkMapper`): a front-end app filters events
    and writes its output stream through the annotated sink; the row
    is the re-READ of what the sink serialized, aggregated — so a
    sink-mapper truncation or quoting bug flips the hash."""
    from ..siddhiql.model import StreamDef
    from ..sources import load_file_source, write_file_sink

    stage = _stage_dir(sf, "sinkcsv")
    out_def = StreamDef(
        name="BigEvents",
        attributes=[
            ("event_id", "long"),
            ("event_type", "string"),
            ("value", "double"),
        ],
        annotations=[
            f"@sink(type='file', dir.uri='file:{stage}', "
            "@map(type='csv', header='true'))"
        ],
    )
    filtered = (
        load(spark, sf, "events")
        .filter(F.col("value") > 250)
        .select("event_id", "event_type", "value")
    )
    path = write_file_sink(filtered, out_def)
    if path != stage:  # gate contract — must survive python -O
        raise RuntimeError(f"file sink wrote {path}, expected {stage}")

    reread_def = StreamDef(
        name="BigEventsIn",
        attributes=out_def.attributes,
        annotations=[
            f"@source(type='file', dir.uri='file:{stage}', "
            "@map(type='csv', header='true'))"
        ],
    )
    back = load_file_source(spark, reread_def)
    if back is None:  # contract check — must survive python -O
        raise RuntimeError("load_file_source returned None")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        r4(F.sum("value"), 4).alias("sum_value"),
    )


def capture_http_server():
    """Start a local HTTP server that accumulates POSTed
    newline-delimited payloads — the shared test transport for the
    http SINK side (suite row + tests use the same harness; the
    handler appends under a lock because ThreadingHTTPServer serves
    concurrent partition POSTs). Returns (server, port, received) —
    caller must ``server.shutdown(); server.server_close()``."""
    import http.server
    import threading

    received: list[str] = []
    lock = threading.Lock()

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 — BaseHTTPRequestHandler API
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode("utf-8")
            with lock:
                received.extend(ln for ln in body.split("\n") if ln.strip())
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):  # silence
            pass

    srv = http.server.ThreadingHTTPServer(("localhost", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1], received


@register(
    "sink_http_json_roundtrip",
    oracle="""
    SELECT event_id, user_id, round(1e-9 + value, 4) AS value
    FROM events
    WHERE event_type = 'purchase' AND value > 200
    """,
    tags=("sink", "http", "streaming"),
)
def sink_http_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """`@sink(type='http', publisher.url=…, @map(type='json'))`
    (`[ext:io-http] HttpSink`) end-to-end over a REAL socket — the
    outbound twin of `source_http_json_stream`: a local HTTP server
    accumulates POSTed newline-delimited JSON payloads, the engine's
    http sink serializes the filtered stream through the json serde
    and posts per partition (executor-side, no driver collect), and
    the payloads parsed back must equal the relational oracle."""
    import json as _json

    from ..siddhiql.model import StreamDef
    from ..sources import http_sink_foreach_batch

    srv, port, received = capture_http_server()
    try:
        sdef = StreamDef(
            name="BigBuys",
            attributes=[
                ("event_id", "long"),
                ("user_id", "long"),
                ("value", "double"),
            ],
            annotations=[
                f"@sink(type='http', publisher.url='http://localhost:{port}/events', "
                "@map(type='json'))"
            ],
        )
        post = http_sink_foreach_batch(sdef)
        src = (
            load(spark, sf, "events")
            .filter((F.col("event_type") == "purchase") & (F.col("value") > 200))
            .select("event_id", "user_id", "value")
        )
        # batch fixed point of the continuous sink: one epoch
        post(src, 0)
    finally:
        srv.shutdown()
        srv.server_close()
    rows = [_json.loads(ln) for ln in received]
    out = spark.createDataFrame(
        [(r["event_id"], r["user_id"], r["value"]) for r in rows],
        "event_id long, user_id long, value double",
    )
    return out.select("event_id", "user_id", r4(F.col("value"), 4).alias("value"))
