"""External table stores — the `@store` annotation family
(SURVEY.md §2 Table: `[ext:store-rdbms] RDBMSTable`,
`[ext:store-mongodb] MongoDBTable`, `[ext:store-elasticsearch]
ElasticsearchTable`, `[ext:store-redis] RedisTable`).

A `define table` with `@store(type=…)` binds the table to an external
system instead of the engine's own parquet-backed store. The Spark
mapping is option translation, not connector code: every backend Spark
has a DataSource for becomes a `format(...)` + options pair, read and
written through the standard reader/writer so predicate pushdown into
the store (JDBC WHERE clauses, Mongo aggregation pipelines) comes from
the connector, and a `stream join table` still plans as a broadcast
probe when the store-side table is small.

Connector jars are deploy-time classpath items (spark-submit
`--packages`), exactly like kafka — the option translation below is
engine logic and is contract-tested without any driver present; the
parquet backend (the default when `@store` is absent) is fully
functional everywhere.
"""

from __future__ import annotations

from . import Ann, _find_ann

#: store type → Spark DataSource format
_FORMATS = {
    "rdbms": "jdbc",
    "mongodb": "mongodb",
    "elasticsearch": "org.elasticsearch.spark.sql",
    "parquet": "parquet",
}


def store_options(ann: Ann) -> tuple[str, dict[str, str]]:
    """`@store(type=…, …)` → (spark format, reader/writer options).

    Option names on the left are the reference extensions' documented
    ones; values pass through untouched (credentials, URLs).
    """
    typ = ann.options.get("type", "parquet").lower()
    if typ == "rdbms":
        # [ext:store-rdbms] RDBMSTable: jdbc.url / username / password /
        # table.name / jdbc.driver.name
        opts = {"url": _req(ann, "jdbc.url"), "dbtable": _req(ann, "table.name")}
        if "username" in ann.options:
            opts["user"] = ann.options["username"]
        if "password" in ann.options:
            opts["password"] = ann.options["password"]
        if "jdbc.driver.name" in ann.options:
            opts["driver"] = ann.options["jdbc.driver.name"]
        # partitioned parallel read: any pass-through spark.* options
        opts.update(_passthrough(ann))
        return "jdbc", opts
    if typ == "mongodb":
        # [ext:store-mongodb] MongoDBTable: mongodb.uri / collection.name
        opts = {
            "connection.uri": _req(ann, "mongodb.uri"),
            "collection": _req(ann, "collection.name"),
        }
        if "database.name" in ann.options:
            opts["database"] = ann.options["database.name"]
        opts.update(_passthrough(ann))
        return "mongodb", opts
    if typ == "elasticsearch":
        # [ext:store-elasticsearch] ElasticsearchTable: hostname / port /
        # index.name / user / password
        opts = {
            "es.nodes": _req(ann, "hostname"),
            "es.resource": _req(ann, "index.name"),
        }
        if "port" in ann.options:
            opts["es.port"] = ann.options["port"]
        if "username" in ann.options:
            opts["es.net.http.auth.user"] = ann.options["username"]
        if "password" in ann.options:
            opts["es.net.http.auth.pass"] = ann.options["password"]
        opts.update(_passthrough(ann))
        return "org.elasticsearch.spark.sql", opts
    if typ == "parquet":
        return "parquet", {"path": _req(ann, "path")}
    if typ == "redis":
        # [ext:store-redis] RedisTable: host / port / password /
        # table.name — mapped onto the spark-redis connector's option
        # schema ("org.apache.spark.sql.redis": table, host, port,
        # auth, key.column). Connector jar is a deploy-time
        # `--packages com.redislabs:spark-redis_2.13` item, same
        # contract as mongo/ES; hash-key reads push the key lookup to
        # the store.
        opts = {
            "table": _req(ann, "table.name"),
            "host": _req(ann, "host"),
        }
        if "port" in ann.options:
            opts["port"] = ann.options["port"]
        if "password" in ann.options:
            opts["auth"] = ann.options["password"]
        if "key.column" in ann.options:
            opts["key.column"] = ann.options["key.column"]
        opts.update(_passthrough(ann))
        return "org.apache.spark.sql.redis", opts
    raise ValueError(f"unsupported @store type {typ!r}")


def _req(ann: Ann, key: str) -> str:
    v = ann.options.get(key)
    if v is None:
        raise ValueError(f"@store(type='{ann.options.get('type')}') needs {key}")
    return v


def _passthrough(ann: Ann) -> dict[str, str]:
    """`spark.<option>` annotation keys pass straight through to the
    DataSource (e.g. spark.numPartitions, spark.partitionColumn for
    parallel JDBC reads — the 100 TB ingest knobs)."""
    return {
        k[len("spark."):]: v
        for k, v in ann.options.items()
        if k.startswith("spark.")
    }


def load_store(spark, stream_def):
    """Read the `@store`-bound table of a `define table` declaration;
    None when the definition carries no @store annotation (the caller
    falls back to the engine's parquet/in-memory table)."""
    ann = _find_ann(stream_def, "store")
    if ann is None:
        return None
    fmt, opts = store_options(ann)
    return spark.read.format(fmt).options(**opts).load()


def write_store(df, stream_def, mode: str = "append") -> bool:
    """Write rows into the `@store`-bound table; False when no @store
    annotation is present. `mode='append'` is the insert-into path;
    primary-key upserts into JDBC stores need store-side MERGE and stay
    on the engine's `ParquetUpsertTable` (documented substitution)."""
    ann = _find_ann(stream_def, "store")
    if ann is None:
        return False
    fmt, opts = store_options(ann)
    df.write.format(fmt).options(**opts).mode(mode).save()
    return True
