"""Source/sink/mapper layer (SURVEY.md §3.1): annotation-driven file
sources with json/csv/parquet `@map` serdes, JSONPath `@attributes`
projection, and file sinks — the engine analogs of
`[ext:io-file] FileSource`, `[ext:map-json] JsonSourceMapper`,
`[ext:map-csv] CSVSourceMapper`."""

from __future__ import annotations

import json
import os

import pytest

from siddhi_operator_spark.siddhiql import run_app
from siddhi_operator_spark.sources import parse_annotation, siddhi_schema


def test_parse_annotation_nested():
    ann = parse_annotation(
        "@source(type='file', file.uri='file:/tmp/x.json', "
        "@map(type='json', @attributes(id='$.event.id', v='$.val')))"
    )
    assert ann.name == "source"
    assert ann.options["type"] == "file"
    assert ann.options["file.uri"] == "file:/tmp/x.json"
    mp = ann.child("map")
    assert mp.options["type"] == "json"
    assert mp.child("attributes").options == {"id": "$.event.id", "v": "$.val"}


def test_siddhi_schema_types():
    sch = siddhi_schema(
        [("a", "string"), ("b", "int"), ("c", "long"), ("d", "float"),
         ("e", "double"), ("f", "bool"), ("g", "object")]
    )
    assert [f.dataType.simpleString() for f in sch.fields] == [
        "string", "int", "bigint", "float", "double", "boolean", "binary"
    ]


def _write_lines(path: str, lines: list[str]) -> None:
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_json_file_source_auto_loads(spark, tmp_path):
    p = str(tmp_path / "trades.json")
    _write_lines(p, [
        json.dumps({"sym": "A", "price": 10.0, "vol": 5}),
        json.dumps({"sym": "B", "price": 99.5, "vol": 7}),
        json.dumps({"sym": "A", "price": 11.0, "vol": 9}),
    ])
    app = f"""
    @source(type='file', file.uri='file:{p}', @map(type='json'))
    define stream Trades (sym string, price double, vol long);
    from Trades[price > 10.5] select sym, price insert into Big;
    """
    out = run_app(app, spark=spark)["Big"]
    assert sorted(tuple(r) for r in out.collect()) == [("A", 11.0), ("B", 99.5)]


def test_json_attributes_jsonpath(spark, tmp_path):
    p = str(tmp_path / "nested.json")
    _write_lines(p, [
        json.dumps({"event": {"id": 1}, "val": 3.5}),
        json.dumps({"event": {"id": 2}, "val": 4.5}),
    ])
    app = f"""
    @source(type='file', file.uri='file:{p}',
            @map(type='json', @attributes(id='$.event.id', v='$.val')))
    define stream Nested (id long, v double);
    from Nested select id, v insert into Flat;
    """
    out = run_app(app, spark=spark)["Flat"]
    assert sorted(tuple(r) for r in out.collect()) == [(1, 3.5), (2, 4.5)]


def test_csv_file_source_with_header(spark, tmp_path):
    p = str(tmp_path / "rows.csv")
    _write_lines(p, ["sym;price", "A;10.5", "B;20.25"])
    app = f"""
    @source(type='file', file.uri='file:{p}',
            @map(type='csv', delimiter=';', header='true'))
    define stream Rows (sym string, price double);
    from Rows select sym, price insert into Out;
    """
    out = run_app(app, spark=spark)["Out"]
    assert sorted(tuple(r) for r in out.collect()) == [("A", 10.5), ("B", 20.25)]


def test_parquet_source_and_file_sink_roundtrip(spark, tmp_path):
    src = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        [("A", 1.0), ("B", 2.0), ("C", 3.0)], "sym string, price double"
    ).write.parquet(src)
    dst = str(tmp_path / "out.json")
    app = f"""
    @source(type='file', dir.uri='file:{src}', @map(type='parquet'))
    define stream In (sym string, price double);
    @sink(type='file', file.uri='file:{dst}', @map(type='json'))
    define stream Out (sym string, price double);
    from In[price >= 2.0] select sym, price insert into Out;
    """
    outs = run_app(app, spark=spark, write_sinks=True)
    assert sorted(tuple(r) for r in outs["Out"].collect()) == [("B", 2.0), ("C", 3.0)]
    assert os.path.isdir(dst)
    back = spark.read.json(dst)
    assert sorted((r.sym, r.price) for r in back.collect()) == [("B", 2.0), ("C", 3.0)]


def test_explicit_source_overrides_annotation(spark, tmp_path):
    """A frame passed in `sources` wins over the file annotation."""
    p = str(tmp_path / "ignored.json")
    _write_lines(p, [json.dumps({"sym": "X", "price": 1.0})])
    df = spark.createDataFrame([("Y", 5.0)], "sym string, price double")
    app = f"""
    @source(type='file', file.uri='file:{p}', @map(type='json'))
    define stream S (sym string, price double);
    from S select sym, price insert into Out;
    """
    out = run_app(app, {"S": df})["Out"]
    assert [tuple(r) for r in out.collect()] == [("Y", 5.0)]


def test_streaming_file_source(spark, tmp_path):
    """Streaming twin: readStream over a directory with the declared
    schema, micro-batched to a memory sink."""
    from siddhi_operator_spark.siddhiql import parse_app
    from siddhi_operator_spark.sources import stream_file_source

    d = tmp_path / "streamdir"
    d.mkdir()
    _write_lines(str(d / "a.json"), [
        json.dumps({"sym": "A", "price": 10.0}),
        json.dumps({"sym": "B", "price": 20.0}),
    ])
    model = parse_app(f"""
    @source(type='file', dir.uri='file:{d}', @map(type='json'))
    define stream S (sym string, price double);
    from S select sym, price insert into Out;
    """)
    sdf = stream_file_source(spark, model.streams["S"])
    assert sdf.isStreaming
    q = (
        sdf.filter("price > 15")
        .writeStream.format("memory")
        .queryName("t_src_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from t_src_stream").collect()
    finally:
        q.stop()
    assert [(r.sym, r.price) for r in rows] == [("B", 20.0)]


def test_unknown_map_type_raises(spark, tmp_path):
    p = str(tmp_path / "x.bin")
    _write_lines(p, ["x"])
    app = f"""
    @source(type='file', file.uri='file:{p}', @map(type='avro'))
    define stream S (sym string);
    from S select sym insert into Out;
    """
    with pytest.raises(ValueError, match="unsupported @map"):
        run_app(app, spark=spark)


def test_run_app_streaming_filter(spark, tmp_path):
    """Entry point A in streaming mode: file @source → filter query →
    memory sink; result equals the batch fixed point."""
    from siddhi_operator_spark.siddhiql import run_app_streaming

    d = tmp_path / "sdir"
    d.mkdir()
    _write_lines(str(d / "a.json"), [
        json.dumps({"sym": "A", "price": 10.0}),
        json.dumps({"sym": "B", "price": 20.0}),
        json.dumps({"sym": "C", "price": 30.0}),
    ])
    app = f"""
    @source(type='file', dir.uri='file:{d}', @map(type='json'))
    define stream S (sym string, price double);
    from S[price > 15] select sym, price insert into Out;
    """
    outs = run_app_streaming(app, spark=spark)
    q = (
        outs["Out"]
        .writeStream.format("memory")
        .queryName("t_app_stream_f")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from t_app_stream_f").collect()
    finally:
        q.stop()
    assert sorted((r.sym, r.price) for r in rows) == [("B", 20.0), ("C", 30.0)]


def test_run_app_streaming_timebatch_agg(spark, tmp_path):
    """Streaming timeBatch aggregation: watermarked tumbling window,
    complete-mode totals match the batch twin."""
    from siddhi_operator_spark.siddhiql import run_app, run_app_streaming

    d = tmp_path / "aggdir"
    d.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-01-01 00:00:10", "user_id": 1,
         "event_type": "click", "value": 5.0},
        {"event_id": 2, "ts": "2024-01-01 00:00:40", "user_id": 2,
         "event_type": "click", "value": 7.0},
        {"event_id": 3, "ts": "2024-01-01 00:01:10", "user_id": 1,
         "event_type": "view", "value": 11.0},
    ]
    _write_lines(str(d / "a.json"), [json.dumps(r) for r in rows])
    app = f"""
    @source(type='file', dir.uri='file:{d}', @map(type='json'))
    define stream E (event_id long, ts string, user_id long,
                     event_type string, value double);
    from E#window.timeBatch(1 min)
    select event_type, sum(value) as total, count() as n
    group by event_type
    insert into Agg;
    """
    # json maps ts as string (Siddhi has no timestamp type); cast to
    # event time identically in both modes, then compare streaming vs
    # the batch fixed point
    from pyspark.sql import functions as F

    from siddhi_operator_spark.sources import stream_file_source
    from siddhi_operator_spark.siddhiql import parse_app

    def with_ts(df):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))

    model = parse_app(app)
    sdf = with_ts(stream_file_source(spark, model.streams["E"]))
    outs = run_app_streaming(app, sources={"E": sdf})
    q = (
        outs["Agg"]
        .writeStream.format("memory")
        .queryName("t_app_stream_agg")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.event_type, r.total, r.n)
            for r in spark.sql("select * from t_app_stream_agg").collect()
        }
    finally:
        q.stop()
    from siddhi_operator_spark.sources import load_file_source

    bdf = with_ts(load_file_source(spark, model.streams["E"]))
    batch = run_app(app, {"E": bdf})["Agg"]
    want = {(r.event_type, r.total, r.n) for r in batch.collect()}
    assert got == want and ("click", 12.0, 2) in got


def test_kafka_options_mapping():
    """`KafkaSource` annotation options → Spark kafka reader options;
    the transport jar is a deploy artifact, the mapping is engine
    logic."""
    from siddhi_operator_spark.sources import kafka_options

    ann = parse_annotation(
        "@source(type='kafka', bootstrap.servers='h1:9092,h2:9092', "
        "topic.list='orders,fills', group.id='g1', @map(type='json'))"
    )
    opts = kafka_options(ann)
    assert opts == {
        "kafka.bootstrap.servers": "h1:9092,h2:9092",
        "subscribe": "orders,fills",
        "kafka.group.id": "g1",
        "startingOffsets": "earliest",
    }
    with pytest.raises(ValueError, match="bootstrap.servers"):
        kafka_options(parse_annotation("@source(type='kafka', topic.list='t')"))


def test_kafka_value_serde_json_and_csv(spark):
    """The kafka value serde is pure Catalyst — exercised on a
    kafka-shaped static frame (value binary + metadata cols)."""
    from siddhi_operator_spark.siddhiql import parse_app
    from siddhi_operator_spark.sources import parse_kafka_value

    model = parse_app(
        "define stream T (sym string, price double, vol long);"
    )
    sdef = model.streams["T"]
    raw = spark.createDataFrame(
        [(json.dumps({"sym": "A", "price": 1.5, "vol": 3}).encode(), "t", 0, 0)],
        "value binary, topic string, partition int, offset long",
    )
    src = parse_annotation(
        "@source(type='kafka', bootstrap.servers='h', topic.list='t', "
        "@map(type='json'))"
    )
    out = parse_kafka_value(raw, src, sdef)
    assert [tuple(r) for r in out.collect()] == [("A", 1.5, 3)]
    src_csv = parse_annotation(
        "@source(type='kafka', bootstrap.servers='h', topic.list='t', "
        "@map(type='csv', delimiter='|'))"
    )
    raw_csv = spark.createDataFrame(
        [(b"B|2.25|9", "t", 0, 0)],
        "value binary, topic string, partition int, offset long",
    )
    out2 = parse_kafka_value(raw_csv, src_csv, sdef)
    assert [tuple(r) for r in out2.collect()] == [("B", 2.25, 9)]


def test_on_error_fault_stream(spark, tmp_path):
    """`@OnError(action='STREAM')`: malformed json lines route to the
    `!S` fault stream; clean rows flow through S — both queryable from
    the same app (StreamJunction fault propagation)."""
    p = str(tmp_path / "dirty.json")
    _write_lines(p, [
        json.dumps({"sym": "A", "price": 10.0}),
        "{ this is not json",
        json.dumps({"sym": "B", "price": 20.0}),
        "also broken",
    ])
    app = f"""
    @OnError(action='STREAM')
    @source(type='file', file.uri='file:{p}', @map(type='json'))
    define stream S (sym string, price double);
    from S[price > 15] select sym, price insert into Good;
    from !S select raw, error insert into Dead;
    """
    outs = run_app(app, spark=spark)
    assert [tuple(r) for r in outs["Good"].collect()] == [("B", 20.0)]
    dead = outs["Dead"].collect()
    assert len(dead) == 2
    assert {r.raw for r in dead} == {"{ this is not json", "also broken"}
    assert all(r.error == "source-mapper: malformed json" for r in dead)


def test_text_regex_mapper(spark, tmp_path):
    """`@map(type='text', regex.<attr>=…)` — one regex group per
    attribute over raw lines (TextSourceMapper regex mode)."""
    p = str(tmp_path / "log.txt")
    _write_lines(p, [
        "2024-01-01 ERROR code=500 latency=1.25",
        "2024-01-02 WARN code=404 latency=0.75",
    ])
    app = f"""
    @source(type='file', file.uri='file:{p}',
            @map(type='text', regex.level='\\d+-\\d+-\\d+ (\\w+)',
                 regex.code='code=(\\d+)', regex.latency='latency=([0-9.]+)'))
    define stream Logs (level string, code int, latency double);
    from Logs[code >= 500] select level, code, latency insert into Errors;
    """
    out = run_app(app, spark=spark)["Errors"]
    assert [tuple(r) for r in out.collect()] == [("ERROR", 500, 1.25)]


def test_cli_run_batch(spark, tmp_path, capsys):
    """`python -m siddhi_operator_spark run app.siddhi` — the §4.2
    runner deliverable: app file in, printed relational outputs out."""
    from siddhi_operator_spark.__main__ import main

    data = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("A", 1.0), ("B", 25.0)], "sym string, price double"
    ).write.parquet(data)
    app_path = str(tmp_path / "app.siddhi")
    with open(app_path, "w") as f:
        f.write(
            f"""
            @source(type='file', dir.uri='file:{data}', @map(type='parquet'))
            define stream S (sym string, price double);
            from S[price > 10] select sym, price insert into Big;
            """
        )
    rc = main(["run", app_path, "--show", "5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "== Big ==" in out and "B" in out and "25.0" in out


# ---------------------------------------------------------------------------
# wire-format mappers: avro / protobuf / binary / xml / keyvalue
# ---------------------------------------------------------------------------

_WIRE_ATTRS = [
    ("sym", "string"),
    ("price", "double"),
    ("vol", "long"),
    ("hot", "bool"),
    ("ratio", "float"),
    ("n", "int"),
]
_WIRE_ROWS = [
    ("A", 1.5, 3, True, 0.25, 7),
    ("日本", -2.75, -9_000_000_000, False, -1.5, -42),
    ("", 0.0, 0, True, 0.0, 0),
]


def test_wire_codecs_roundtrip_pure():
    from siddhi_operator_spark.sources import wire_codecs as WC

    for fmt in ("avro", "protobuf", "binary"):
        for row in _WIRE_ROWS:
            enc = WC.ENCODERS[fmt](row, _WIRE_ATTRS)
            dec = WC.DECODERS[fmt](enc, _WIRE_ATTRS)
            assert dec[0] == row[0] and dec[2] == row[2] and dec[3] == row[3]
            assert abs(dec[1] - row[1]) < 1e-12
            assert abs(dec[4] - row[4]) < 1e-6
            assert dec[5] == row[5], fmt


def test_avro_schema_json_matches_declared():
    import json as J

    from siddhi_operator_spark.sources.wire_codecs import avro_schema_json

    sch = J.loads(avro_schema_json("T", _WIRE_ATTRS))
    assert sch["type"] == "record"
    assert [f["name"] for f in sch["fields"]] == [n for n, _ in _WIRE_ATTRS]
    assert sch["fields"][1]["type"] == "double"
    assert sch["fields"][3]["type"] == "boolean"


def test_proto_decode_skips_unknown_fields():
    from siddhi_operator_spark.sources import wire_codecs as WC

    attrs = [("a", "long"), ("b", "string")]
    enc = WC.proto_encode_record((5, "x"), attrs)
    # append an unknown field 9 (varint) — decoder must skip it
    extra = enc + WC._uvarint(9 << 3 | 0) + WC._uvarint(123)
    assert WC.proto_decode_record(extra, attrs) == (5, "x")
    # missing field decodes to the proto3 default
    assert WC.proto_decode_record(b"", attrs) == (0, "")


def test_wire_mappers_spark_roundtrip(spark):
    """encode_message_value → map_message_value over a kafka-shaped
    frame reproduces the declared rows for all three wire formats."""
    from siddhi_operator_spark.siddhiql import parse_app
    from siddhi_operator_spark.sources import (
        encode_message_value,
        map_message_value,
    )

    model = parse_app(
        "define stream T (sym string, price double, vol long, hot bool, "
        "ratio float, n int);"
    )
    sdef = model.streams["T"]
    df = spark.createDataFrame(
        _WIRE_ROWS,
        "sym string, price double, vol long, hot boolean, ratio float, n int",
    )
    for fmt in ("avro", "protobuf", "binary"):
        mp = parse_annotation(f"@map(type='{fmt}')")
        wire = encode_message_value(df, fmt, sdef)
        back = map_message_value(wire, mp, sdef)
        got = sorted(tuple(r) for r in back.collect())
        assert got == sorted(_WIRE_ROWS), fmt


def test_xml_mapper(spark):
    from siddhi_operator_spark.siddhiql import parse_app
    from siddhi_operator_spark.sources import map_message_value

    model = parse_app("define stream T (sym string, price double, vol long);")
    sdef = model.streams["T"]
    raw = spark.createDataFrame(
        [
            ("<event><sym>A</sym><price>1.5</price><vol>3</vol></event>",),
            ("<event><sym>B</sym><price>2.5</price><vol>4</vol></event>",),
        ],
        "value string",
    )
    mp = parse_annotation("@map(type='xml')")
    out = map_message_value(raw, mp, sdef)
    assert sorted(tuple(r) for r in out.collect()) == [
        ("A", 1.5, 3),
        ("B", 2.5, 4),
    ]
    # custom enclosing element + xpath @attributes
    raw2 = spark.createDataFrame(
        [("<tick><s>C</s><info><p>9.75</p></info><v>11</v></tick>",)],
        "value string",
    )
    mp2 = parse_annotation(
        "@map(type='xml', enclosing.element='tick', "
        "@attributes(sym='/tick/s/text()', price='/tick/info/p/text()', "
        "vol='/tick/v/text()'))"
    )
    assert [tuple(r) for r in map_message_value(raw2, mp2, sdef).collect()] == [
        ("C", 9.75, 11)
    ]


def test_keyvalue_mapper(spark):
    from siddhi_operator_spark.siddhiql import parse_app
    from siddhi_operator_spark.sources import map_message_value

    model = parse_app("define stream T (sym string, price double, vol long);")
    sdef = model.streams["T"]
    raw = spark.createDataFrame(
        [("sym:A,price:1.5,vol:3",), ("sym:B,price:2.5,vol:4",)],
        "value string",
    )
    mp = parse_annotation("@map(type='keyvalue')")
    assert sorted(tuple(r) for r in map_message_value(raw, mp, sdef).collect()) == [
        ("A", 1.5, 3),
        ("B", 2.5, 4),
    ]
    # remapped keys + custom separators
    raw2 = spark.createDataFrame([("s=C;p=9.75;v=11",)], "value string")
    mp2 = parse_annotation(
        "@map(type='keyvalue', delimiter=';', kv.separator='=', "
        "@attributes(sym='s', price='p', vol='v'))"
    )
    assert [tuple(r) for r in map_message_value(raw2, mp2, sdef).collect()] == [
        ("C", 9.75, 11)
    ]


def test_xml_file_source(spark, tmp_path):
    """`@source(type='file', @map(type='xml'))` — one XML event per
    line through the file connector."""
    from siddhi_operator_spark.siddhiql import run_app

    p = str(tmp_path / "events.xml")
    _write_lines(
        p,
        [
            "<event><sym>A</sym><price>150.0</price></event>",
            "<event><sym>B</sym><price>50.0</price></event>",
        ],
    )
    app = f"""
    @source(type='file', file.uri='file:{p}', @map(type='xml'))
    define stream Q (sym string, price double);
    from Q[price > 100] select sym, price insert into Out;
    """
    out = run_app(app, spark=spark)["Out"]
    assert [tuple(r) for r in out.collect()] == [("A", 150.0)]


def test_http_source_power_surge_end_to_end(spark):
    """The operator's flagship example (PowerSurgeDetection,
    deploy/examples): `@source(type='http')` → json map →
    `[deviceType == 'dryer' and power >= 600]` → alert stream — run
    end-to-end through run_app_streaming with REAL payloads over a
    real socket (the engine's http test transport)."""
    import socket
    import threading
    import time
    import uuid

    from siddhi_operator_spark.siddhiql import run_app_streaming

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("localhost", 0))
    port = server.getsockname()[1]
    server.listen(1)
    payloads = [
        {"deviceType": "dryer", "power": 60},
        {"deviceType": "dryer", "power": 800},
        {"deviceType": "monitor", "power": 900},
        {"deviceType": "dryer", "power": 600},
    ]

    def serve():
        conn, _ = server.accept()
        with conn:
            for pl in payloads:
                conn.sendall((json.dumps(pl) + "\n").encode())
            time.sleep(8)  # keep the transport open while Spark drains

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    app_path = "/root/repo/examples/power_surge_detection.siddhi"
    with open(app_path) as f:
        app = f.read().replace(
            "http://0.0.0.0:8006/example", f"http://localhost:{port}/example"
        )
    outs = run_app_streaming(app, spark=spark)
    assert set(outs) == {"PowerSurgeAlertStream"}
    name = f"ps_{uuid.uuid4().hex[:8]}"
    q = (
        outs["PowerSurgeAlertStream"]
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = sorted(
                (r.deviceType, r.power) for r in spark.sql(
                    f"select * from {name}").collect()
            )
            if len(rows) >= 2:
                break
            time.sleep(0.5)
        assert rows == [("dryer", 600), ("dryer", 800)]
    finally:
        q.stop()
        server.close()


def test_kafka_sink_options_and_value_serde(spark):
    """Sink-side kafka mapping: options + per-format value serde, with
    the source mapper as the round-trip check."""
    from siddhi_operator_spark.siddhiql import parse_app
    from siddhi_operator_spark.sources import (
        format_sink_value,
        kafka_sink_options,
        map_message_value,
    )

    sink = parse_annotation(
        "@sink(type='kafka', bootstrap.servers='h1:9092', topic='out', "
        "key='sym', @map(type='json'))"
    )
    assert kafka_sink_options(sink) == {
        "kafka.bootstrap.servers": "h1:9092",
        "topic": "out",
    }
    with pytest.raises(ValueError, match="bootstrap.servers"):
        kafka_sink_options(parse_annotation("@sink(type='kafka', topic='t')"))

    model = parse_app("define stream T (sym string, price double, vol long);")
    sdef = model.streams["T"]
    df = spark.createDataFrame(
        [("A", 1.5, 3), ("B", 2.25, 9)], "sym string, price double, vol long"
    )
    # json with partition key
    wire = format_sink_value(df, sink, sdef)
    assert wire.columns == ["key", "value"]
    back = map_message_value(
        wire, parse_annotation("@map(type='json')"), sdef
    )
    assert sorted(tuple(r) for r in back.collect()) == [
        ("A", 1.5, 3), ("B", 2.25, 9)
    ]
    # every wire format round-trips through its own source mapper
    for fmt in ("csv", "keyvalue", "avro", "protobuf", "binary"):
        mp = parse_annotation(f"@map(type='{fmt}')")
        wire = format_sink_value(df, mp, sdef)
        back = map_message_value(wire, mp, sdef)
        assert sorted(tuple(r) for r in back.collect()) == [
            ("A", 1.5, 3), ("B", 2.25, 9)
        ], fmt


def test_kafka_contract_end_to_end_via_file_transport(spark, tmp_path):
    """Kafka contract test: producer serde → broker log → consumer
    serde, with a parquet file standing in for the broker (the sandbox
    has no kafka jar; the transport swap is `format("kafka")` with the
    same options — everything else below is exactly the deployed
    code path).

    The on-disk frame uses the EXACT schema Spark's kafka consumer
    yields (key/value binary + topic/partition/offset/timestamp/
    timestampType), so `parse_kafka_value` is exercised against the
    real wire shape for every mapper format."""
    import pyspark.sql.functions as F

    from siddhi_operator_spark.siddhiql import parse_app
    from siddhi_operator_spark.sources import (
        format_sink_value,
        kafka_options,
        kafka_sink_options,
        parse_kafka_value,
    )

    model = parse_app("define stream T (sym string, price double, vol long);")
    sdef = model.streams["T"]
    rows = [("A", 1.5, 3), ("B", 2.25, 9), ("C", -0.5, 0)]
    df = spark.createDataFrame(rows, "sym string, price double, vol long")

    sink = parse_annotation(
        "@sink(type='kafka', bootstrap.servers='h1:9092', topic='t1', "
        "@map(type='json'))"
    )
    assert kafka_sink_options(sink) == {
        "kafka.bootstrap.servers": "h1:9092",
        "topic": "t1",
    }

    for fmt in ("json", "csv", "keyvalue", "avro", "protobuf", "binary"):
        mp = parse_annotation(f"@map(type='{fmt}')")
        wire = format_sink_value(df, mp, sdef)

        # broker-log shape: exactly what readStream.format('kafka')
        # hands the consumer after the jar swap
        log = wire.select(
            F.lit(None).cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit("t1").alias("topic"),
            F.lit(0).alias("partition"),
            F.monotonically_increasing_id().alias("offset"),
            F.current_timestamp().alias("timestamp"),
            F.lit(0).alias("timestampType"),
        )
        path = str(tmp_path / f"broker_{fmt}")
        log.write.mode("overwrite").parquet(path)
        consumed = spark.read.parquet(path)
        assert consumed.schema["value"].dataType.typeName() == "binary"

        src = parse_annotation(
            "@source(type='kafka', bootstrap.servers='h1:9092', "
            f"topic.list='t1', @map(type='{fmt}'))"
        )
        assert kafka_options(src)["subscribe"] == "t1"
        back = parse_kafka_value(consumed, src, sdef)
        assert sorted(tuple(r) for r in back.collect()) == sorted(rows), fmt


def test_debezium_parse_and_apply(spark):
    """Debezium envelope decode + change-log fold: inserts/updates win
    by change order, deletes tombstone the key, `before` serves the
    delete payload, unknown fields are ignored."""
    from siddhi_operator_spark.siddhiql.model import StreamDef
    from siddhi_operator_spark.sources.cdc_source import apply_cdc, parse_debezium

    rows = [
        ('{"payload":{"op":"c","after":{"id":1,"v":10.0},"ts_ms":100}}',),
        ('{"payload":{"op":"u","after":{"id":1,"v":20.0},"ts_ms":200,"source":{"db":"x"}}}',),
        ('{"payload":{"op":"c","after":{"id":2,"v":5.0},"ts_ms":150}}',),
        ('{"payload":{"op":"d","before":{"id":2,"v":5.0},"ts_ms":300}}',),
        ('{"payload":{"op":"r","after":{"id":3,"v":7.5},"ts_ms":50}}',),
    ]
    raw = spark.createDataFrame(rows, "value string")
    stream = StreamDef(
        name="T", attributes=[("id", "long"), ("v", "double")], annotations=[]
    )
    changes = parse_debezium(raw, stream)
    got = {(r.id, r.op): (r.v, r.ts_ms) for r in changes.collect()}
    assert got[(1, "insert")] == (10.0, 100)
    assert got[(1, "update")] == (20.0, 200)
    assert got[(2, "delete")] == (5.0, 300)  # payload from `before`
    assert got[(3, "read")] == (7.5, 50)

    state = {r.id: r.v for r in apply_cdc(changes, keys=["id"]).collect()}
    assert state == {1: 20.0, 3: 7.5}  # key 2 tombstoned, key 1 latest


def test_store_option_translation():
    """@store annotations translate to Spark DataSource format+options
    without any connector present (deploy-time classpath concern)."""
    import pytest as _pytest

    from siddhi_operator_spark.sources import parse_annotation
    from siddhi_operator_spark.sources.stores import store_options

    fmt, opts = store_options(parse_annotation(
        "@store(type='rdbms', jdbc.url='jdbc:postgresql://db:5432/app', "
        "username='u', password='p', table.name='users', "
        "jdbc.driver.name='org.postgresql.Driver', "
        "spark.numPartitions='8', spark.partitionColumn='id')"
    ))
    assert fmt == "jdbc"
    assert opts["url"].startswith("jdbc:postgresql")
    assert opts["dbtable"] == "users" and opts["user"] == "u"
    assert opts["driver"] == "org.postgresql.Driver"
    assert opts["numPartitions"] == "8"  # parallel-read passthrough

    fmt, opts = store_options(parse_annotation(
        "@store(type='mongodb', mongodb.uri='mongodb://m:27017', "
        "collection.name='c', database.name='d')"
    ))
    assert fmt == "mongodb" and opts["collection"] == "c" and opts["database"] == "d"

    fmt, opts = store_options(parse_annotation(
        "@store(type='elasticsearch', hostname='es1', index.name='idx', port='9200')"
    ))
    assert fmt == "org.elasticsearch.spark.sql"
    assert opts["es.nodes"] == "es1" and opts["es.port"] == "9200"

    fmt, opts = store_options(parse_annotation(
        "@store(type='redis', host='r1', port='6379', password='s', "
        "table.name='sessions', key.column='session_id')"
    ))
    assert fmt == "org.apache.spark.sql.redis"
    assert opts["host"] == "r1" and opts["table"] == "sessions"
    assert opts["auth"] == "s" and opts["key.column"] == "session_id"

    with _pytest.raises(ValueError, match="table.name"):
        store_options(parse_annotation("@store(type='redis', host='r')"))
    with _pytest.raises(ValueError, match="jdbc.url"):
        store_options(parse_annotation("@store(type='rdbms', table.name='t')"))


def test_store_parquet_roundtrip(spark, tmp_path):
    """The default parquet store reads/writes through the same @store
    seam the external backends use."""
    from siddhi_operator_spark.siddhiql.model import StreamDef
    from siddhi_operator_spark.sources.stores import load_store, write_store

    path = f"{tmp_path}/users_store"
    stream = StreamDef(
        name="Users",
        attributes=[("user_id", "long"), ("tier", "string")],
        is_table=True,
        annotations=[f"@store(type='parquet', path='{path}')"],
    )
    df = spark.createDataFrame([(1, "gold"), (2, "silver")], "user_id long, tier string")
    assert write_store(df, stream, mode="overwrite")
    back = load_store(spark, stream)
    assert sorted((r.user_id, r.tier) for r in back.collect()) == [
        (1, "gold"), (2, "silver"),
    ]
    no_store = StreamDef(name="T", attributes=[("a", "int")], is_table=True)
    assert load_store(spark, no_store) is None
    assert write_store(df, no_store) is False


def test_debezium_apply_cdc_property(spark):
    """Randomized change logs vs a pure-python fold: apply_cdc's keyed
    max_by must equal replaying the log in (ts_ms, seq) order with
    last-writer-wins and delete tombstones."""
    import random

    from siddhi_operator_spark.sources.cdc_source import apply_cdc

    rng = random.Random(11)
    for trial in range(5):
        n = rng.randint(5, 60)
        rows = []
        for seq in range(n):
            key = rng.randint(1, 8)
            op = rng.choice(["insert", "update", "update", "delete", "read"])
            rows.append((key, float(rng.randint(0, 999)), op, rng.randint(1, 20), seq))
        df = spark.createDataFrame(
            rows, "id long, v double, op string, ts_ms long, seq long"
        )
        got = {
            r.id: r.v
            for r in apply_cdc(df, keys=["id"], order_cols=("ts_ms", "seq")).collect()
        }
        state: dict = {}
        for key, v, op, ts_ms, seq in sorted(rows, key=lambda r: (r[3], r[4])):
            if op == "delete":
                state[key] = None
            else:
                state[key] = v
        expect = {k: v for k, v in state.items() if v is not None}
        assert got == expect, f"trial {trial}"


def test_store_rdbms_embedded_derby_roundtrip(spark, tmp_path):
    """REAL JDBC round trip through the @store(type='rdbms') path —
    Spark ships an embedded Derby (its Hive-metastore dependency), so
    the rdbms store is exercised end-to-end, not just option-
    translated: write_store creates+populates the table over JDBC,
    load_store reads it back, and a QL app joins a stream against the
    store-bound `define table` (the `[ext:store-rdbms] RDBMSTable`
    contract)."""
    from siddhi_operator_spark.sources import parse_annotation
    from siddhi_operator_spark.sources.stores import store_options

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    ann = parse_annotation(
        f"@store(type='rdbms', jdbc.url='{url}', table.name='DIMS', "
        "jdbc.driver.name='org.apache.derby.jdbc.EmbeddedDriver')"
    )
    fmt, opts = store_options(ann)
    dims = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id int, tier string"
    )
    dims.write.format(fmt).options(**opts).mode("overwrite").save()
    back = spark.read.format(fmt).options(**opts).load()
    assert {(r.user_id, r.tier) for r in back.collect()} == {
        (1, "gold"), (2, "silver")
    }

    # QL path: a store-bound `define table` feeds a stream-table join
    from siddhi_operator_spark.siddhiql import parse_app, run_app

    app = parse_app(f"""
    define stream S (user_id int, amount double);
    @store(type='rdbms', jdbc.url='{url}', table.name='DIMS',
           jdbc.driver.name='org.apache.derby.jdbc.EmbeddedDriver')
    define table DIMS (user_id int, tier string);
    @info(name='q')
    from S join DIMS on S.user_id == DIMS.user_id
    select S.user_id as user_id, DIMS.tier as tier, S.amount as amount
    insert into Out;
    """)
    s = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 1.0)], "user_id int, amount double"
    )
    out = run_app(app, {"S": s}, ts_col="", id_col="")["Out"]
    got = {(r.user_id, r.tier, r.amount) for r in out.collect()}
    assert got == {(1, "gold", 10.0), (2, "silver", 5.0)}


def test_cli_run_cr_siddhiprocess(spark, tmp_path, capsys):
    """`run-cr process.yaml` — the operator's ACTUAL user input (a
    `kind: SiddhiProcess` CR) runs directly: every spec.apps[*].script
    executes; configMap refs and wrong kinds fail with clear errors."""
    import pytest as _pytest

    from siddhi_operator_spark.__main__ import main
    from siddhi_operator_spark.siddhiql.cr import load_cr_scripts

    data = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("A", 1.0), ("B", 25.0)], "sym string, price double"
    ).write.parquet(data)
    cr_path = str(tmp_path / "process.yaml")
    with open(cr_path, "w") as f:
        f.write(f"""
apiVersion: siddhi.io/v1alpha2
kind: SiddhiProcess
metadata:
  name: demo-process
spec:
  apps:
    - script: |
        @App:name("CrApp")
        @source(type='file', dir.uri='file:{data}', @map(type='parquet'))
        define stream S (sym string, price double);
        from S[price > 10] select sym, price insert into Big;
  runner: "0.2.2"
""")
    rc = main(["run-cr", cr_path, "--show", "5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "== Big ==" in out and "25.0" in out

    with _pytest.raises(ValueError, match="ConfigMap"):
        load_cr_scripts(
            "kind: SiddhiProcess\nspec:\n  apps:\n    - configMap: cm1\n"
        )
    with _pytest.raises(ValueError, match="expected 'SiddhiProcess'"):
        load_cr_scripts("kind: Deployment\nspec: {}\n")
    # legacy v1alpha1 single-query field
    assert load_cr_scripts(
        "kind: SiddhiProcess\nspec:\n  query: 'define stream X (a int);'\n"
    ) == ["define stream X (a int);"]


def test_cli_ondemand_sql(spark, capsys):
    """`sql` subcommand — §4.3 on-demand store queries as plain SQL
    over the registered state views."""
    from siddhi_operator_spark.__main__ import main

    rc = main([
        "sql",
        "SELECT count(*) AS n FROM events",
        "--sf-dir", "/root/testdata/sf0.001",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "n" in out


def test_http_source_entry_bounded(spark, monkeypatch):
    """The socket-backed http registry entry collects its payloads to
    the driver — correct at oracle scale, a hang at a big sf. The
    explicit bound must fail LOUDLY before any socket work."""
    from siddhi_operator_spark.suite import sources_suite as SS

    monkeypatch.setattr(SS, "_HTTP_MAX_PAYLOADS", 3)
    with pytest.raises(ValueError, match="bounded to 3 driver-resident"):
        SS.source_http_json_stream(spark, "/root/testdata/sf0.001")


def test_http_sink_through_siddhiql(spark, tmp_path):
    """`@sink(type='http', @map(type='json'))` declared on a SiddhiQL
    output stream posts the query result to the publisher url when
    run_app(write_sinks=True) — the outbound twin of the @source http
    path, end-to-end from QL text."""
    import json as _json

    from siddhi_operator_spark.siddhiql import run_app
    from siddhi_operator_spark.suite.sources_suite import capture_http_server

    srv, port, received = capture_http_server()
    try:
        src = spark.createDataFrame(
            [(1, 9.0), (2, 101.5), (3, 250.0)], "event_id long, value double"
        )
        app = f"""
        define stream E (event_id long, value double);
        @sink(type='http', publisher.url='http://localhost:{port}/out',
              @map(type='json'))
        define stream Big (event_id long, value double);
        from E[value > 100] select event_id, value insert into Big;
        """
        run_app(app, {"E": src}, write_sinks=True)
    finally:
        srv.shutdown()
        srv.server_close()
    got = sorted(
        (_json.loads(ln)["event_id"], _json.loads(ln)["value"])
        for ln in received
    )
    assert got == [(2, 101.5), (3, 250.0)]
