"""Batch sinks: idempotent append + the empty-result guard.

The reference appends via JDBC after a row-existence anti-join and
guards with ``indicators_df.rdd.isEmpty()`` (``dags/spark_job_1.py:88-93``).
Engine equivalents: Parquet append with the same anti-join dedup (the
streaming twin lives in ``streaming.pipeline.foreach_batch_idempotent_append``),
and ``DataFrame.isEmpty()`` — never ``.rdd`` (which would deserialize
rows to Python objects just to peek)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def non_empty(df: DataFrame) -> bool:
    """P7: empty-result guard (reference uses ``.rdd.isEmpty()``;
    ``DataFrame.isEmpty`` stays JVM-side and stops at the first row)."""
    return not df.isEmpty()


def target_exists(spark: SparkSession, path: str) -> bool:
    """Explicit existence probe for a sink path (any Hadoop-supported
    scheme). Used instead of catch-all ``except`` around the read: a
    transient IO/permission/corrupt-footer error must PROPAGATE, not
    silently disable the idempotence anti-join and append duplicates.

    Classic (py4j) sessions use the Hadoop FileSystem directly. Under
    Spark Connect the py4j internals don't exist, so fall back to a
    schema probe that catches ONLY the path-not-found AnalysisException
    (``PATH_NOT_FOUND`` error class) — anything else still propagates."""
    jvm = getattr(spark, "_jvm", None)
    if jvm is not None:
        hconf = spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(hconf).exists(p)
    from pyspark.errors import AnalysisException

    try:
        spark.read.format("parquet").load(path).schema
        return True
    except AnalysisException as e:
        if analysis_error_matches(e, "PATH_NOT_FOUND"):
            return False
        raise


def analysis_error_matches(e, *classes: str) -> bool:
    """True iff the AnalysisException's error class is one of
    ``classes``. Uses the 4.x ``getCondition`` (falling back to the
    deprecated ``getErrorClass`` spelling); the message-TEXT fallback
    applies ONLY when no error-class accessor exists at all — a
    definitive non-matching class must stay definitive, or a wrapped
    error whose nested message merely mentions the class name (e.g.
    FAILED_READ_FILE wrapping a vanished-file path) would be
    misclassified as the benign case."""
    getter = getattr(e, "getCondition", None) or getattr(
        e, "getErrorClass", None
    )
    klass = getter() if getter is not None else None
    if klass is not None:
        return klass in classes
    text = str(e)
    return any(c in text for c in classes)


def write_idempotent_append(
    df: DataFrame, target_path: str, keys: Sequence[str]
) -> None:
    """S6/S7 + J2: append only rows whose key tuple is not already in
    the target — the set-based version of the reference's per-row
    ``INSERT IGNORE`` (``consumer_prices.py:70-80``) / pre-write
    anti-join (``spark_job_1.py:81-93``). Re-running with the same input
    is a no-op. At scale, time-partition the target and read only the
    affected partitions for the anti-join side (the streaming twin in
    ``streaming.pipeline`` does exactly that)."""
    spark = df.sparkSession
    if target_exists(spark, target_path):
        existing = spark.read.parquet(target_path).select(*keys)
        fresh = df.join(existing, on=list(keys), how="left_anti")
    else:  # first write: nothing to dedup against
        fresh = df
    if non_empty(fresh):
        fresh.write.mode("append").parquet(target_path)


def export_training_shards(
    df: DataFrame,
    target_path: str,
    n_shards: int = 8,
    key_col: str = "doc_id",
    salt: str = "export-v1",
    fmt: str = "json",
) -> None:
    """Training-data export: write the curated frame as ``n_shards``
    deterministic shards under ``target_path/shard=K`` (JSONL by
    default — the interchange format training loaders read — or
    parquet). Shard = md5(salt|key) % n_shards: stable under reruns AND
    corpus growth (a doc never migrates shards, so incremental exports
    only append), and the same assignment every engine can recompute —
    unlike ``repartition(n)``'s round-robin, which reshuffles everything
    on every run.

    One hash-partition exchange on the shard key; each shard lands as
    its own ``shard=K`` directory (partition-discovery readable, and a
    training loader can consume shards independently). At 100 TB raise
    ``n_shards`` to bound per-shard size; skew is impossible by
    construction (md5 is uniform over keys)."""
    if fmt not in ("json", "parquet"):
        raise ValueError(f"unsupported export format: {fmt}")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    out = df.withColumn("shard", shard).repartition(n_shards, "shard")
    writer = out.write.mode("overwrite").partitionBy("shard")
    if fmt == "json":
        writer.json(target_path)
    else:
        writer.parquet(target_path)


def jdbc_append_writer(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "com.mysql.cj.jdbc.Driver",
    batchsize: int = 10_000,
):
    """S6: configured JDBC append writer — the engine-side mirror of the
    reference's warehouse INSERT (``dags/spark_job_1.py:89-93``: jdbc
    url + dbtable + credentials + driver class, mode=append). Returned
    unexecuted so callers (and the plan-level test — no JDBC driver jar
    ships in this container) control when the connection is attempted.
    ``batchsize`` is the rows-per-INSERT batch (the set-based answer to
    the reference's row-at-a-time executemany)."""
    return (
        df.write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
    )


def kafka_stream_writer(
    df: DataFrame,
    topic: str,
    bootstrap_servers: str = "localhost:9092",
    checkpoint_location: str | None = None,
):
    """S3: configured Kafka sink writer for a (key, value) frame shaped
    by ``sources.kafka_messages.to_kafka_shape`` — the engine-side
    mirror of the reference producer's keyed JSON send
    (``dags/producer_prices.py:11-14,63``). Returned unexecuted: the
    spark-sql-kafka package is not in this container, so ``.start()``
    raises at source resolution (asserted by the plan-level test)."""
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )
    if checkpoint_location is not None:
        writer = writer.option("checkpointLocation", checkpoint_location)
    return writer


# Digest algorithms a manifest may carry. New manifests always write
# the first entry; verify_export recomputes with whatever the STORED
# manifest declares, so an algorithm upgrade never turns untouched
# pre-upgrade exports into false tamper alarms (they keep verifying
# under their recorded algorithm until rewritten).
_DIGEST_ALGO_DEFAULT = "sha2-256"
# pre-versioning manifests (no digest_algo column) exist in BOTH
# digest eras (md5 first, later sha2-256); verify_export infers which
# from the stored digest LENGTH — this constant only names the md5 era
_DIGEST_ALGO_LEGACY = "md5"


def _digest_fn(algo: str):
    if algo == "sha2-256":
        return lambda c: F.sha2(c, 256)
    if algo == "md5":
        return F.md5
    raise ValueError(f"unknown manifest digest algorithm: {algo!r}")


def _shard_digests(exp: DataFrame, algo: str = _DIGEST_ALGO_DEFAULT) -> DataFrame:
    """(shard, n_rows, content_hash, digest_algo) over an export read:
    content_hash = digest of the shard's SORTED per-row digests, each
    row digested from its full JSON rendering (name-sorted columns).
    Full-content coverage — an edit to any field changes the digest,
    not just key membership — and order-free without being forgeable
    the way xor/sum row digests are. Default sha2-256 (not md5) because
    the manifest's tamper-detection claim must hold against an adversary
    who can CHOOSE row content: md5 collisions are constructible, and
    the hash cost is negligible next to the export scan. ``algo`` is
    recorded in the manifest so verification survives future algorithm
    changes. The sort happens INSIDE each shard group (shards are
    bounded by construction — raise n_shards to keep them so); never a
    global sort."""
    h = _digest_fn(algo)
    row_cols = sorted(c for c in exp.columns if c != "shard")
    row_digest = h(F.to_json(F.struct(*[F.col(c) for c in row_cols])))
    return exp.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        h(F.to_json(F.sort_array(F.collect_list(row_digest)))).alias(
            "content_hash"
        ),
        F.lit(algo).alias("digest_algo"),
    )


def _read_export(spark, export_path: str) -> DataFrame:
    return (
        spark.read.option("basePath", export_path).parquet(export_path)
        if _export_is_parquet(spark, export_path)
        else spark.read.json(export_path)
    )


def write_export_manifest(spark, export_path: str) -> DataFrame:
    """Manifest for an :func:`export_training_shards` output — the
    artifact a training run pins so the dataset it consumed is
    verifiable later: one row per shard with (shard, n_rows,
    content_hash) — see :func:`_shard_digests` for the digest
    construction (full row content, order-free). Written to
    ``export_path/_manifest`` as parquet (underscore-prefixed, so the
    shard readers skip it) and returned."""
    manifest = _shard_digests(_read_export(spark, export_path)).orderBy("shard")
    manifest.write.mode("overwrite").parquet(f"{export_path}/_manifest")
    return spark.read.parquet(f"{export_path}/_manifest")


def _export_is_parquet(spark, export_path: str) -> bool:
    """Sniff the export format from the shard dirs' files — via the
    Hadoop FileSystem (any scheme: s3a/hdfs/file), NOT a driver-local
    glob, mirroring :func:`target_exists`. Connect sessions (no py4j)
    fall back to try-reading one row as parquet."""
    jvm = getattr(spark, "_jvm", None)
    if jvm is not None:
        hconf = spark._jsc.hadoopConfiguration()
        pat = jvm.org.apache.hadoop.fs.Path(f"{export_path}/shard=*/*.parquet")
        fs = pat.getFileSystem(hconf)
        hits = fs.globStatus(pat)
        return hits is not None and len(hits) > 0
    try:
        spark.read.option("basePath", export_path).parquet(export_path).schema
        return True
    except Exception:
        return False


def verify_export(spark, export_path: str) -> bool:
    """Recompute the manifest from the export's current bytes and
    compare to the stored one. False ⇒ the export changed since the
    manifest was written (lost/added shards, added/removed rows, OR any
    edited field value — the per-row digests cover full content) — the
    check a training job runs before trusting a dataset path.

    Recomputes with the algorithm the STORED manifest declares, so a
    digest-algorithm upgrade is not mistaken for tampering. Manifests
    predating the ``digest_algo`` column exist in BOTH digest eras
    (md5 first, then sha2-256 before the column was added), so a
    column-less manifest's algorithm is inferred from its stored
    digest LENGTH — 32 hex chars is md5, 64 is sha2-256; the digest
    length is part of what the full-outer compare checks, so the
    inference can never accept a digest the declared algorithm could
    not have produced. The algorithm probe is an O(1) first() on the
    O(shards) manifest."""
    stored = spark.read.parquet(f"{export_path}/_manifest")
    if "digest_algo" in stored.columns:
        probe = stored.select("digest_algo").first()
        algo = probe[0] if probe is not None else _DIGEST_ALGO_DEFAULT
    else:
        probe = stored.select(F.length("content_hash")).first()
        algo = (
            _DIGEST_ALGO_LEGACY
            if probe is not None and probe[0] == 32
            else _DIGEST_ALGO_DEFAULT
        )
        stored = stored.withColumn("digest_algo", F.lit(algo))
    fresh = _shard_digests(_read_export(spark, export_path), algo=algo)
    # full-outer on the full row with side markers: a row missing from
    # either side (count drift, hash drift, shard gone) leaves that
    # side's marker NULL (join keys themselves coalesce, so they can
    # never witness a mismatch)
    return (
        stored.withColumn("_s", F.lit(1))
        .join(
            fresh.withColumn("_f", F.lit(1)),
            ["shard", "n_rows", "content_hash", "digest_algo"],
            "full_outer",
        )
        .filter(F.col("_s").isNull() | F.col("_f").isNull())
        .isEmpty()
    )
