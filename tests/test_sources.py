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
