"""Plan-level connector tests (S3/S4/S6): the Kafka and JDBC
reader/writer plans must ASSEMBLE correctly even though this container
ships neither the spark-sql-kafka package nor a JDBC driver jar — the
tests drive each plan to the exact boundary where the missing runtime
dependency (and nothing earlier, like a mis-typed option or schema)
fails. The reference's transport is exactly these two connectors
(``dags/consumer_prices.py:45-52`` Kafka in, ``dags/spark_job_1.py:89-93``
JDBC out)."""

from __future__ import annotations

import os

import pytest

from crypto_data_pipeline_with_kafka_spark.catalog import load_table
from crypto_data_pipeline_with_kafka_spark.sources.kafka_messages import (
    to_kafka_shape,
)
from crypto_data_pipeline_with_kafka_spark.sources.readers import (
    kafka_stream_reader,
)
from crypto_data_pipeline_with_kafka_spark.sources.sinks import (
    jdbc_append_writer,
    kafka_stream_writer,
)

SF = "/root/testdata/sf0.01"


@pytest.mark.skipif(
    bool(os.environ.get("SPARK_KAFKA_PACKAGE")),
    reason="kafka package on classpath — lookup-failure assertion does not apply",
)
def test_kafka_reader_writer_plan(spark, tmp_path):
    """Kafka source/sink plans: options assemble, the key/value
    projection matches the Kafka sink contract, and resolution fails
    ONLY on the missing kafka data source (not on our configuration)."""
    reader = kafka_stream_reader(
        spark, topic="prices", starting_offsets="earliest", max_offsets_per_trigger=500
    )
    with pytest.raises(Exception, match="[Kk]afka"):
        reader.load()  # fails at source lookup — options were accepted

    shaped = to_kafka_shape(
        load_table(spark, SF, "events").select("user_id", "event_type", "value"),
        key_cols=["user_id", "event_type"],
    )
    # the Kafka sink contract: exactly key/value, both string (or binary)
    assert [f.name for f in shaped.schema.fields] == ["key", "value"]
    assert {f.dataType.simpleString() for f in shaped.schema.fields} == {"string"}

    writer = kafka_stream_writer(
        shaped.sparkSession.readStream.format("rate").load().selectExpr(
            "CAST(value AS STRING) AS key", "CAST(value AS STRING) AS value"
        ),
        topic="prices_out",
        checkpoint_location=str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception, match="[Kk]afka"):
        writer.start()


@pytest.mark.skipif(
    bool(os.environ.get("SPARK_JDBC_PACKAGE")),
    reason="jdbc driver on classpath — missing-class assertion does not apply",
)
def test_jdbc_write_options(spark):
    """JDBC append plan: the configured writer mirrors the reference's
    warehouse INSERT (url/dbtable/credentials/driver/append). Executing
    must fail on the missing driver CLASS we configured — proving every
    option reached Spark's JDBC source."""
    df = load_table(spark, SF, "events").limit(5)
    writer = jdbc_append_writer(
        df,
        url="jdbc:mysql://localhost:3306/warehouse",
        table="kline_fact",
        user="u",
        password="p",
        driver="com.mysql.cj.jdbc.Driver",
    )
    with pytest.raises(Exception, match="com.mysql.cj.jdbc.Driver"):
        writer.save()


@pytest.mark.skipif(
    not (os.environ.get("SPARK_KAFKA_PACKAGE") and os.environ.get("SPARK_KAFKA_BOOTSTRAP")),
    reason="live Kafka round-trip needs SPARK_KAFKA_PACKAGE (session "
    "classpath, see session.get_spark) + SPARK_KAFKA_BOOTSTRAP (broker)",
)
def test_kafka_live_roundtrip(spark):
    """The full transport, the moment an environment provides it: the
    keyed-JSON frame from to_kafka_shape is produced to a real topic and
    read back byte-identical — upgrading S3/S4 from plan-level to
    executed with ZERO engine-code changes (only session classpath +
    broker address)."""
    import uuid

    bootstrap = os.environ["SPARK_KAFKA_BOOTSTRAP"]
    topic = f"engine_it_{uuid.uuid4().hex[:8]}"
    shaped = to_kafka_shape(
        load_table(spark, SF, "events").limit(100).select(
            "user_id", "event_type", "value"
        ),
        key_cols=["user_id", "event_type"],
    )
    (
        shaped.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
    )
    assert back.count() == 100
    assert shaped.exceptAll(back).count() == 0
    assert back.exceptAll(shaped).count() == 0


@pytest.mark.skipif(
    not (
        (os.environ.get("SPARK_JDBC_PACKAGE") or os.environ.get("SPARK_JDBC_JARS"))
        and os.environ.get("SPARK_JDBC_URL")
    ),
    reason="live JDBC round-trip needs a driver on the session classpath "
    "(SPARK_JDBC_PACKAGE maven coordinate or SPARK_JDBC_JARS local jar; "
    "conftest auto-wires a cached duckdb_jdbc jar) + SPARK_JDBC_URL",
)
def test_jdbc_live_roundtrip(spark):
    """The reference's warehouse leg, executed for real: the configured
    append writer inserts a multi-partition batch into a real database
    table over JDBC and reads it back row-identical — upgrading S5/S6
    from plan-level to executed. Backend comes from env: MySQL when the
    reference's setup is reachable (SPARK_JDBC_USER / SPARK_JDBC_PASSWORD
    / SPARK_JDBC_DRIVER default to it), else the conftest-auto-wired
    DuckDB database file — either way it is Spark's real JDBC source
    (option surface, INSERT batching, type mapping) under test.

    For DuckDB URLs the table is pre-created with explicit DDL — exactly
    how the reference provisions its warehouse (datawarehouse/*.sql DDL
    scripts, not driver-issued CREATE TABLE)."""
    import uuid

    url = os.environ["SPARK_JDBC_URL"]
    user = os.environ.get("SPARK_JDBC_USER", "root")
    password = os.environ.get("SPARK_JDBC_PASSWORD", "")
    driver = os.environ.get("SPARK_JDBC_DRIVER", "com.mysql.cj.jdbc.Driver")
    table = f"engine_it_{uuid.uuid4().hex[:8]}"
    df = load_table(spark, SF, "events").limit(100).select(
        "event_id", "user_id", "event_type", "value"
    )
    if url.startswith("jdbc:duckdb:"):
        import duckdb

        type_map = {"bigint": "BIGINT", "int": "INTEGER", "double": "DOUBLE",
                    "float": "FLOAT", "string": "VARCHAR",
                    "timestamp": "TIMESTAMP", "boolean": "BOOLEAN"}
        ddl = ", ".join(
            f'"{f.name}" {type_map[f.dataType.simpleString()]}'
            for f in df.schema.fields
        )
        con = duckdb.connect(url[len("jdbc:duckdb:"):])
        con.execute(f'CREATE TABLE "{table}" ({ddl})')
        con.close()
    jdbc_append_writer(
        df, url=url, table=table, user=user, password=password, driver=driver
    ).save()
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .load()
        .select("event_id", "user_id", "event_type", "value")
    )
    assert back.count() == 100
    assert df.exceptAll(back).count() == 0 and back.exceptAll(df).count() == 0


def test_export_training_shards_jsonl_roundtrip(spark, tmp_path):
    """Training export: deterministic md5 shards, JSONL on disk,
    lossless read-back, and growth-stability — re-exporting a grown
    corpus never moves an already-exported doc to another shard."""
    import hashlib
    import json

    from crypto_data_pipeline_with_kafka_spark.catalog import load_table
    from crypto_data_pipeline_with_kafka_spark.sources.sinks import (
        export_training_shards,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "export")
    export_training_shards(docs, out, n_shards=4)

    back = spark.read.json(out)
    assert back.count() == docs.count()
    # shard assignment matches the md5 reference and partition dirs exist
    got = {r.doc_id: r.shard for r in back.collect()}
    for doc_id, shard in got.items():
        exp = int(hashlib.md5(f"export-v1|{doc_id}".encode()).hexdigest()[:4], 16) % 4
        assert shard == exp
    # files are real JSONL: one JSON object per line
    import glob as _glob

    a_file = sorted(_glob.glob(f"{out}/shard=*/part-*"))[0]
    with open(a_file) as fh:
        first = fh.readline()
    assert json.loads(first)["doc_id"] in got
    # growth-stability: exporting half the corpus assigns the same shards
    half = docs.filter("doc_id < 250")
    out2 = str(tmp_path / "export_half")
    export_training_shards(half, out2, n_shards=4)
    half_back = {r.doc_id: r.shard for r in spark.read.json(out2).collect()}
    assert all(got[d] == s for d, s in half_back.items())


def test_export_manifest_roundtrip_and_tamper_detection(spark, tmp_path):
    """write_export_manifest pins per-shard row counts + sorted-key
    digests; verify_export passes on the untouched export (json AND
    parquet) and fails after a shard is tampered with."""
    import shutil as _shutil

    from pyspark.sql import functions as F

    from crypto_data_pipeline_with_kafka_spark.catalog import load_table
    from crypto_data_pipeline_with_kafka_spark.sources.sinks import (
        export_training_shards,
        verify_export,
        write_export_manifest,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for fmt in ("json", "parquet"):
        path = str(tmp_path / f"export_{fmt}")
        export_training_shards(docs, path, n_shards=4, fmt=fmt)
        man = write_export_manifest(spark, path)
        rows = {r["shard"]: r["n_rows"] for r in man.collect()}
        assert sum(rows.values()) == docs.count() and len(rows) == 4
        assert verify_export(spark, path)

    # tamper: drop one shard directory from the json export
    path = str(tmp_path / "export_json")
    _shutil.rmtree(f"{path}/shard=0")
    assert not verify_export(spark, path)

    # tamper the parquet export by appending rows to one shard
    ppath = str(tmp_path / "export_parquet")
    extra = docs.limit(1).withColumn("shard", F.lit(1))
    extra.write.mode("append").partitionBy("shard").parquet(ppath)
    assert not verify_export(spark, ppath)


def test_export_manifest_algo_versioning(spark, tmp_path):
    """A digest-algorithm upgrade must not read as tampering:
    verify_export recomputes with the algorithm the STORED manifest
    declares. Legacy manifests (md5 digests, no digest_algo column —
    the pre-sha2 format) still verify untouched exports; current
    manifests record 'sha2-256'; and the recorded algorithm does not
    weaken tamper detection under either algorithm."""
    from crypto_data_pipeline_with_kafka_spark.catalog import load_table
    from crypto_data_pipeline_with_kafka_spark.sources.sinks import (
        _read_export,
        _shard_digests,
        export_training_shards,
        verify_export,
        write_export_manifest,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "export")
    export_training_shards(docs, path, n_shards=4, fmt="parquet")

    # current manifest records its algorithm
    man = write_export_manifest(spark, path)
    assert {r["digest_algo"] for r in man.collect()} == {"sha2-256"}
    assert verify_export(spark, path)

    # legacy manifests exist in BOTH pre-column eras; the algorithm is
    # inferred from the stored digest length (32 hex = md5, 64 = sha2)
    for era_algo in ("md5", "sha2-256"):
        legacy = _shard_digests(_read_export(spark, path), algo=era_algo).drop(
            "digest_algo"
        )
        legacy.write.mode("overwrite").parquet(f"{path}/_manifest")
        assert verify_export(spark, path), era_algo

    # tampering still detected under the legacy algorithm
    import shutil as _shutil

    _shutil.rmtree(f"{path}/shard=3")
    assert not verify_export(spark, path)
