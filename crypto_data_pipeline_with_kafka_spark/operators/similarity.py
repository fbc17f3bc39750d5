"""Embedding similarity search (LLM-pipeline operator family):
brute-force cosine top-k as the exactness baseline, random-hyperplane
LSH bucketing as the scale path, and cosine near-dup pairing.

Numeric determinism: float32 embeddings are cast to DECIMAL(16,12) and
dot products / norms accumulate as exact decimals before one final cast
to double — so Spark and the DuckDB oracle agree bitwise, and rank
order (hence top-k membership) is identical. Everything is expressed as
posexplode + hash joins + window top-k; no Python in the path.

At 100 TB: brute-force is O(queries × corpus) and only for small query
sets; the LSH variant buckets the corpus once (16 deterministic
hyperplanes → 2^16 buckets) and joins within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(16,12)"


def embedding_components(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, pos, v) with v as exact decimal; pos is 1-based to align with
    the DuckDB oracle's 1-based list indexing."""
    return df.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("pos0", "v_raw"),
    ).select(
        F.col(id_col),
        (F.col("pos0") + 1).alias("pos"),
        # float32 → double (exact) → decimal: the explicit double hop
        # makes Spark and DuckDB round from the SAME value, keeping the
        # decimal components (and everything derived) bitwise equal.
        F.col("v_raw").cast("double").cast(_DEC).alias("v"),
    )


def norms(comp: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Exact squared-norm per vector (decimal sum → double)."""
    return comp.groupBy(id_col).agg(
        F.sum(F.col("v") * F.col("v")).cast("double").alias("norm_sq")
    )


def cosine_pairs(
    comp_a: DataFrame,
    comp_b: DataFrame,
    norms_a: DataFrame,
    norms_b: DataFrame,
) -> DataFrame:
    """Cosine for every (id_a, id_b) pair reachable through the
    component join. Callers control the blow-up by pre-filtering either
    side (query subset, LSH bucket, ...). Returns (id_a, id_b, cosine)."""
    dots = (
        comp_a.select(F.col("vec_id").alias("id_a"), "pos", F.col("v").alias("va"))
        .join(
            comp_b.select(F.col("vec_id").alias("id_b"), "pos", F.col("v").alias("vb")),
            "pos",
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("va") * F.col("vb")).cast("double").alias("dot"))
    )
    na = norms_a.select(F.col("vec_id").alias("id_a"), F.col("norm_sq").alias("na"))
    nb = norms_b.select(F.col("vec_id").alias("id_b"), F.col("norm_sq").alias("nb"))
    return (
        dots.join(F.broadcast(na), "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("dot") / (F.sqrt("na") * F.sqrt("nb"))).alias("cosine"),
        )
    )


def cosine_for_pairs(comp: DataFrame, nrm: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact cosine for an explicit (id_a, id_b) pair list — cost is
    |pairs| × dim, independent of corpus size. This is the verify stage
    for every candidate-generation scheme (LSH buckets, minhash bands)."""
    dots = (
        pairs.join(
            comp.select(F.col("vec_id").alias("id_a"), "pos", F.col("v").alias("va")),
            "id_a",
        )
        .join(
            comp.select(F.col("vec_id").alias("id_b"), "pos", F.col("v").alias("vb")),
            ["id_b", "pos"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("va") * F.col("vb")).cast("double").alias("dot"))
    )
    na = nrm.select(F.col("vec_id").alias("id_a"), F.col("norm_sq").alias("na"))
    nb = nrm.select(F.col("vec_id").alias("id_b"), F.col("norm_sq").alias("nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("dot") / (F.sqrt("na") * F.sqrt("nb"))).alias("cosine"),
        )
    )


def brute_force_topk(
    emb: DataFrame,
    query_ids_max: int = 20,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for query vectors (id < query_ids_max) against
    the whole corpus (self excluded). Deterministic tie-break on id_b."""
    comp = embedding_components(emb, id_col)
    nrm = norms(comp, id_col)
    q_comp = comp.filter(F.col(id_col) < query_ids_max)
    q_nrm = nrm.filter(F.col(id_col) < query_ids_max)
    pairs = cosine_pairs(q_comp, comp, q_nrm, nrm).filter(F.col("id_a") != F.col("id_b"))
    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id_a", "id_b", "cosine", F.col("rnk").cast("int").alias("rnk"))
    )


def hyperplane_sign(plane: F.Column, pos: F.Column) -> F.Column:
    """Deterministic pseudo-random ±1 for hyperplane component
    (plane, pos): +1 iff the first md5 hex digit of 'plane_pos' is even.
    md5 is identical in Spark and DuckDB → the whole LSH bucketing is
    oracle-checkable."""
    digit = F.substring(F.md5(F.concat_ws("_", plane, pos)), 1, 1)
    return F.when(F.instr(F.lit("02468ace"), digit) > 0, F.lit(1)).otherwise(F.lit(-1))


def lsh_buckets(
    comp: DataFrame, num_planes: int = 16, id_col: str = "vec_id"
) -> DataFrame:
    """Random-hyperplane LSH signature: the full ``num_planes``-bit
    sign-bit string per vector (band over it for candidate generation)."""
    planes = comp.select(
        F.col(id_col),
        "pos",
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(num_planes - 1))).alias("plane"),
    )
    contrib = planes.select(
        F.col(id_col),
        "plane",
        (F.col("v") * hyperplane_sign(F.col("plane"), F.col("pos"))).alias("c"),
    )
    proj = contrib.groupBy(id_col, "plane").agg(F.sum("c").cast("double").alias("proj"))
    return proj.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("plane", (F.col("proj") > 0).cast("int").alias("b"))
                    )
                ),
                lambda x: x["b"].cast("string"),
            ),
            "",
        ).alias("bucket")
    )


def lsh_ann_pairs(
    emb: DataFrame,
    num_planes: int = 16,
    bands: int = 4,
    min_cosine: float = 0.4,
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN near-neighbor pairs, banded hyperplane LSH: the
    ``num_planes``-bit signature is split into ``bands`` bands; vectors
    sharing ANY band key become candidates (multi-probe recall, exactly
    the MinHash banding trade-off), then exact cosine ≥ threshold is
    verified on candidates only. Returns (id_a, id_b, cosine).

    Scale path: candidate count ~ Σ per-band bucket collisions, never
    corpus²; band width tunes recall vs candidate volume (more bits per
    band at bigger corpora)."""
    comp = embedding_components(emb, id_col)
    nrm = norms(comp, id_col)
    buckets = lsh_buckets(comp, num_planes, id_col)
    width = num_planes // bands
    banded = buckets.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.substring("bucket", 1 + width * b, width).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(F.col(id_col), F.col("bk.band_id"), F.col("bk.band_key"))
    a = banded.select(F.col(id_col).alias("id_a"), "band_id", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band_id", "band_key")
    cand = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return cosine_for_pairs(comp, nrm, cand).filter(F.col("cosine") >= min_cosine)
