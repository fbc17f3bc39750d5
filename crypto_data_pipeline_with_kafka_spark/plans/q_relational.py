"""Relational operator queries (SURVEY §2.2 P1-P7, §2.3 J1-J4, §2.4
aggregations, §2.6 sorts/limits, §2.7 set ops) over the TPC-H-ish star
and the events stream table.

Float parity convention: every float aggregate is an exact DECIMAL sum
cast to DOUBLE (optionally divided by a count) — bitwise identical in
Spark and DuckDB. Integer-typed results are cast so both engines emit
the same width (BIGINT / INTEGER).

Registry note (round 2): the driver attests at most ~50 queries, so
single-operator queries that share a table and a shape are folded into
composite checked plans (e.g. ``rel_project_conditional`` = projection +
pushdown filters + when/otherwise; ``set_ops_suite`` = all five set
ops tagged and unioned; ``text_mining_suite`` = the six r6 text/
sampling operators as tagged legs). Each composite still
exercises the individual DataFrame APIs — the fold is in the *checking
query*, not the operator surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crypto_data_pipeline_with_kafka_spark.catalog import load_table
from crypto_data_pipeline_with_kafka_spark.operators.relational import (
    asof_join,
    idempotent_append,
    top_k_per_group,
)
from crypto_data_pipeline_with_kafka_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- filters


@register(
    "rel_project_conditional",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           CASE WHEN l_discount > 0.06 THEN l_extendedprice ELSE 0.0 END AS deep_discount_price,
           CASE WHEN l_tax > 0.04 THEN 'high' WHEN l_tax > 0.02 THEN 'mid' ELSE 'low' END AS tax_band
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_discount > 0.05
    """,
    doc="P1+P3+P4 in one checked plan: column projection + predicates "
    "(both reach the parquet scan — PushedFilters / ReadSchema; the "
    "reference prunes manually, spark_job_1.py:22) + when/otherwise "
    "conditional projection (the reference's gain/loss split, "
    "spark_job_1.py:33-34)",
    tags=("filter", "project"),
)
def rel_project_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") > 0.05)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.when(F.col("l_discount") > 0.06, F.col("l_extendedprice"))
            .otherwise(F.lit(0.0))
            .alias("deep_discount_price"),
            F.when(F.col("l_tax") > 0.04, F.lit("high"))
            .when(F.col("l_tax") > 0.02, F.lit("mid"))
            .otherwise(F.lit("low"))
            .alias("tax_band"),
        )
    )


@register(
    "rel_rename_cast",
    """
    SELECT event_id,
           user_id AS symbol_id,
           ts AS close_time,
           CAST(CAST(value AS DECIMAL(20,10)) AS VARCHAR) AS close_price_dec
    FROM events
    """,
    doc="P2+F12: projection with rename and the explicit string/double → "
    "DECIMAL(20,10) cast the reference leaves implicit to MySQL "
    "(consumer_prices.py:70-78, kline_dim_fact.sql:15-18); stringified "
    "for cross-engine comparison",
    tags=("project", "cast"),
)
def rel_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").alias("symbol_id"),
        F.col("ts").alias("close_time"),
        F.col("value").cast("decimal(20,10)").cast("string").alias("close_price_dec"),
    )


@register(
    "rel_regex_filter",
    r"""
    SELECT doc_id, source
    FROM documents
    WHERE regexp_matches(text, '^the [a-z]+ ') AND regexp_matches(source, '^src[0-9]+$')
    """,
    doc="P5: regex predicates gating rows (the reference's RSS URL "
    "validators, producer_news.py:29-36,56)",
    tags=("filter", "string"),
)
def rel_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").rlike(r"^the [a-z]+ ") & F.col("source").rlike(r"^src[0-9]+$"))
        .select("doc_id", "source")
    )


@register(
    "rel_high_watermark",
    """
    WITH wm AS (
      SELECT user_id, max(ts) AS wm_ts
      FROM events WHERE ts < TIMESTAMP '2024-01-21'
      GROUP BY user_id
    )
    SELECT e.user_id, e.event_id, e.ts
    FROM events e JOIN wm USING (user_id)
    WHERE e.ts > wm.wm_ts
    """,
    doc="P6: per-key monotonic high-watermark filter — the producer skips "
    "klines with open_time <= last seen (producer_prices.py:44-46); "
    "set-based: join against per-key max and keep strictly-newer rows",
    tags=("filter", "join"),
)
def rel_high_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    wm = (
        events.filter(F.col("ts") < F.lit("2024-01-21").cast("timestamp"))
        .groupBy("user_id")
        .agg(F.max("ts").alias("wm_ts"))
    )
    return (
        events.join(wm, "user_id")
        .filter(F.col("ts") > F.col("wm_ts"))
        .select("user_id", "event_id", "ts")
    )


# ---------------------------------------------------------------- joins


@register(
    "rel_join_dim_chain",
    """
    SELECT r.r_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="J1: inner equi-join dim lookups (the reference's 4-row "
    "dim_indicator_type join, spark_job_1.py:64-67) — both dims "
    "broadcast-hinted; never shuffles the fact side",
    tags=("join", "agg"),
)
def rel_join_dim_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@register(
    "rel_join_semi_anti",
    """
    SELECT 'semi' AS op, c_custkey, c_name
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'anti' AS op, c_custkey, c_name
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'exists' AS op, c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0)
    UNION ALL
    SELECT 'notexists' AS op, c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0)
    UNION ALL
    SELECT 'scalar' AS op, c_custkey, c_name
    FROM customer c
    WHERE CAST(c_acctbal AS DECIMAL(18,2))
            * (SELECT count(*) FROM customer c2
               WHERE c2.c_nationkey = c.c_nationkey)
          > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
    """,
    doc="J2+J4 plus the subquery-decorrelation surface in one checked "
    "plan: left-semi key-presence probe (the reference's per-row "
    "'SELECT id WHERE url=%s', consumer_news.py:47-49), left-anti 'not "
    "already inserted' dedup (spark_job_1.py:81-85), correlated EXISTS "
    "/ NOT EXISTS with an extra predicate (Catalyst decorrelates to "
    "conditioned semi/anti joins — RewritePredicateSubquery), and a "
    "correlated scalar-aggregate subquery (above-nation-average "
    "balance, decorrelated to an aggregate-join). The scalar leg "
    "compares exact DECIMAL sums (balance × group count > group sum), "
    "never a float average, so boundary membership is bitwise stable "
    "across engines. All five legs tagged and unioned",
    tags=("join", "subquery"),
)
def rel_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    o_keys = o.select(F.col("o_custkey").alias("c_custkey"))
    semi = c.join(o_keys, "c_custkey", "left_semi").select(
        F.lit("semi").alias("op"), "c_custkey", "c_name"
    )
    anti = idempotent_append(c, o_keys, ["c_custkey"]).select(
        F.lit("anti").alias("op"), "c_custkey", "c_name"
    )
    # The subquery legs deliberately go through the SQL API so the
    # driver attests Catalyst's decorrelation itself (EXISTS → semi,
    # NOT EXISTS → anti, correlated scalar agg → aggregate + join),
    # not a hand-decorrelated DataFrame equivalent. View names are
    # per-call unique: createOrReplaceTempView mutates session-global
    # state, so fixed names would silently rebind under concurrent plan
    # construction on a shared SparkSession.
    import uuid

    tag = uuid.uuid4().hex[:12]
    cust_v, ord_v = f"_sq_customer_{tag}", f"_sq_orders_{tag}"
    c.createOrReplaceTempView(cust_v)
    o.createOrReplaceTempView(ord_v)
    subq = spark.sql(
        f"""
        SELECT 'exists' AS op, c_custkey, c_name
        FROM {cust_v} c
        WHERE EXISTS (SELECT 1 FROM {ord_v} o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000.0)
        UNION ALL
        SELECT 'notexists' AS op, c_custkey, c_name
        FROM {cust_v} c
        WHERE NOT EXISTS (SELECT 1 FROM {ord_v} o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 200000.0)
        UNION ALL
        SELECT 'scalar' AS op, c_custkey, c_name
        FROM {cust_v} c
        WHERE CAST(c_acctbal AS DECIMAL(18,2))
                * (SELECT count(*) FROM {cust_v} c2
                   WHERE c2.c_nationkey = c.c_nationkey)
              > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
                 FROM {cust_v} c2
                 WHERE c2.c_nationkey = c.c_nationkey)
        """
    )
    # spark.sql analyzes eagerly — the views are resolved into subq's
    # plan, so they can be dropped before the (lazy) result executes
    spark.catalog.dropTempView(cust_v)
    spark.catalog.dropTempView(ord_v)
    return semi.unionByName(anti).unionByName(subq)


@register(
    "rel_asof_join",
    """
    WITH purchases AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ), errors AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'
    )
    SELECT e.user_id, e.event_id, e.ts, p.value AS asof_value
    FROM errors e
    ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    doc="As-of join extension (SURVEY §2.3): price at-or-before each "
    "event — union trick with last(ignorenulls) over one ordered window; "
    "one shuffle, no per-key Python. Oracle uses DuckDB's native ASOF",
    tags=("join", "asof"),
)
def rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    out = asof_join(
        errors,
        purchases,
        partition_cols=("user_id",),
        left_ts="ts",
        right_ts="ts",
        value_cols=("value",),
        tie_col="event_id",
    )
    return out.select("user_id", "event_id", "ts", F.col("asof_value"))


# ---------------------------------------------------------------- aggregation


@register(
    "agg_q1",
    """
    SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
               * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*) AS avg_disc,
      CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="§2.4: grouped aggregation, TPC-H Q1 shape (the engine-side "
    "equivalent of the reference's Grafana rollups); partial+final agg "
    "automatic; exact decimal sums for cross-engine determinism",
    tags=("agg",),
)
def agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(3,2)")
    tax = F.col("l_tax").cast("decimal(3,2)")
    one = F.lit(1).cast("decimal(3,2)")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
        (F.sum(qty).cast("double") / n).alias("avg_qty"),
        (F.sum(price).cast("double") / n).alias("avg_price"),
        (F.sum(disc).cast("double") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(min(l_quantity) AS DOUBLE) AS min_qty,
           CAST(max(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="§2.4: count_distinct + min/max (exact, no float arithmetic)",
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
    )


# GK-sketch rank tolerance: percentile_approx guarantees the returned
# element's rank is within eps*n of the target rank, eps = 1/accuracy.
_SKETCH_ACCURACY = 10_000
# HLL relative-error bound: 3× the requested rsd (the sketch is
# deterministic per dataset — this is an assertion, not a probability).
_HLL_RSD = 0.05


@register(
    "agg_approx_sketches",
    """
    SELECT l_returnflag,
           CAST(1 AS BOOLEAN) AS parts_within_3rsd,
           CAST(1 AS BOOLEAN) AS q25_rank_ok,
           CAST(1 AS BOOLEAN) AS q50_rank_ok,
           CAST(1 AS BOOLEAN) AS q75_rank_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="§2.4 approx family, VALUE-checked via error-bound assertions: "
    "sketch outputs are engine-internal (HLL and GK results differ by "
    "implementation), so instead of raw values the query emits one "
    "boolean per sketch asserting it landed within its documented error "
    "of the exact twin, computed Spark-side — approx_count_distinct "
    f"(rsd={_HLL_RSD}) within 3×rsd relative error of count_distinct, "
    "and each percentile_approx quartile's exact rank interval "
    "[count(<v), count(<=v)] overlapping the guaranteed rank window "
    f"q·n ± n/accuracy (accuracy={_SKETCH_ACCURACY}). The oracle "
    "recomputes the per-group constants, so a sketch drifting out of "
    "bound flips a boolean and breaks the hash match. Shape: two "
    "aggregation passes + a broadcast join of the group-cardinality "
    "sketch relation (bounded by |groups|, never the fact)",
    tags=("agg", "approx"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_partkey", "l_quantity"
    )
    sk = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", _HLL_RSD).alias("_ap"),
        F.count_distinct("l_partkey").alias("_xp"),
        F.percentile_approx("l_quantity", 0.25, _SKETCH_ACCURACY).alias("_a25"),
        F.percentile_approx("l_quantity", 0.5, _SKETCH_ACCURACY).alias("_a50"),
        F.percentile_approx("l_quantity", 0.75, _SKETCH_ACCURACY).alias("_a75"),
        F.count(F.lit(1)).alias("_n"),
    )
    ranked = li.join(F.broadcast(sk), "l_returnflag").groupBy("l_returnflag").agg(
        F.first("_ap").alias("_ap"),
        F.first("_xp").alias("_xp"),
        F.first("_n").alias("_n"),
        *[
            a
            for q in ("25", "50", "75")
            for a in (
                F.sum(
                    F.when(F.col("l_quantity") < F.col(f"_a{q}"), 1).otherwise(0)
                ).alias(f"_lo{q}"),
                F.sum(
                    F.when(F.col("l_quantity") <= F.col(f"_a{q}"), 1).otherwise(0)
                ).alias(f"_hi{q}"),
            )
        ],
    )

    def _rank_ok(q: float, tag: str):
        # the returned element occupies 1-based ranks [lo+1, hi], so the
        # overlap with the guarantee window [floor((q-eps)n), ceil((q+eps)n)]
        # needs lo+1 <= ceil(...) — lo alone would admit a value whose
        # whole rank interval sits one rank past the window
        eps = 1.0 / _SKETCH_ACCURACY
        n = F.col("_n")
        return (
            (F.col(f"_lo{tag}") + 1 <= F.ceil((F.lit(q) + eps) * n))
            & (F.col(f"_hi{tag}") >= F.floor((F.lit(q) - eps) * n))
        ).alias(f"q{tag}_rank_ok")

    rel_err = F.abs(F.col("_ap") - F.col("_xp")) / F.col("_xp")
    return ranked.select(
        "l_returnflag",
        (rel_err <= 3 * _HLL_RSD).alias("parts_within_3rsd"),
        _rank_ok(0.25, "25"),
        _rank_ok(0.5, "50"),
        _rank_ok(0.75, "75"),
    )


@register(
    "agg_grouping_suite",
    """
    SELECT 'rollup' AS op, l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS op, l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'gsets' AS op, l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="§2.4 multi-dimensional aggregation in one checked plan: rollup "
    "(DataFrame API), cube (DataFrame API), and explicit GROUPING SETS "
    "(SQL API — same Catalyst plan), tagged and unioned. Subtotal/grand-"
    "total rows carry NULL group markers in both engines",
    tags=("agg", "sql"),
)
def agg_grouping_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1)).alias("n")
    rollup = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(n)
        .select(F.lit("rollup").alias("op"), "l_returnflag", "l_linestatus", "n")
    )
    cube = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(n)
        .select(F.lit("cube").alias("op"), "l_returnflag", "l_linestatus", "n")
    )
    li.createOrReplaceTempView("_gs_lineitem")
    gsets = spark.sql(
        """
        SELECT 'gsets' AS op, l_returnflag, l_linestatus, count(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )
    return rollup.unionByName(cube).unionByName(gsets)


# ---------------------------------------------------------------- sort / topk


@register(
    "sort_limit_top100",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
    doc="§2.6 O1/O2: global sort + limit (TakeOrderedAndProject — no full "
    "sort materialization); unique tie-breakers make the LIMIT deterministic",
    tags=("sort",),
)
def sort_limit_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(100)
    )


@register(
    "topk_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-K per group: row_number ≤ K per customer (window sort only, "
    "no global sort)",
    tags=("sort", "window"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_k_per_group(
        _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        group_cols=("o_custkey",),
        order_cols=(F.col("o_totalprice").desc(), F.col("o_orderkey")),
        k=3,
    )


@register(
    "win_rank_nav",
    """
    SELECT user_id, event_id, ts,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS rn,
           CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INTEGER) AS value_rank,
           CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS INTEGER) AS type_rank,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS diff,
           first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value,
           percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id) AS pct_rank,
           cume_dist() OVER (PARTITION BY user_id ORDER BY value, event_id) AS cume,
           CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS INTEGER) AS quartile
    FROM events
    """,
    doc="Ranking/navigation/distribution window surface in one checked "
    "plan (§2.5 note + W2): row_number/rank/dense_rank, lead/lag (the "
    "reference's diff input, spark_job_1.py:32) with the diff itself, "
    "first_value, and percent_rank/cume_dist/ntile — rank arithmetic "
    "over identical integer inputs, so the doubles are bitwise equal "
    "across engines. All specs share one hash-partitioning on user_id: "
    "one Exchange, several sorts",
    tags=("window",),
)
def win_rank_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    w_type = Window.partitionBy("user_id").orderBy("event_type")
    w_dist = Window.partitionBy("user_id").orderBy("value", "event_id")
    return _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.row_number().over(w_ts).alias("rn"),
        F.rank().over(w_val).alias("value_rank"),
        F.dense_rank().over(w_type).alias("type_rank"),
        F.lead("value").over(w_ts).alias("next_value"),
        F.lag("value").over(w_ts).alias("prev_value"),
        (F.col("value") - F.lag("value").over(w_ts)).alias("diff"),
        F.first("value").over(w_ts.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "first_value"
        ),
        F.percent_rank().over(w_dist).alias("pct_rank"),
        F.cume_dist().over(w_dist).alias("cume"),
        F.ntile(4).over(w_dist).cast("int").alias("quartile"),
    )


# ---------------------------------------------------------------- set ops


@register(
    "set_ops_suite",
    """
    SELECT 'intersect' AS op, CAST(o_custkey AS VARCHAR) AS key FROM (
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
    )
    UNION ALL
    SELECT 'except' AS op, CAST(c_custkey AS VARCHAR) AS key FROM (
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey AS c_custkey FROM orders
    )
    UNION ALL
    SELECT 'union' AS op, event_type AS key FROM (
      SELECT event_type FROM events WHERE ts < TIMESTAMP '2024-01-15'
      UNION
      SELECT event_type FROM events WHERE ts >= TIMESTAMP '2024-01-15'
    )
    UNION ALL
    SELECT 'except_all' AS op, CAST(l_suppkey AS VARCHAR) AS key FROM (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    )
    UNION ALL
    SELECT 'intersect_all' AS op, CAST(l_suppkey AS VARCHAR) AS key FROM (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    )
    """,
    doc="§2.7 ALL the set ops in one checked plan (merged r6 from the "
    "former set_ops_distinct + set_ops_all pair to free a registry slot "
    "under the driver's ~50-query attestation cap): intersect "
    "(customers active in both years), except (the J2 anti-join's "
    "set-op twin), union-distinct (U1 relative), plus the multiset "
    "EXCEPT ALL / INTERSECT ALL — each via its DataFrame API, tagged "
    "and unioned (keys stringified so heterogeneous key types share "
    "one schema)",
    tags=("setop",),
)
def set_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1998).select("o_custkey")
    inter = a.intersect(b).select(
        F.lit("intersect").alias("op"), F.col("o_custkey").cast("string").alias("key")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    ok = o.select(F.col("o_custkey").alias("c_custkey"))
    exc = c.subtract(ok).select(
        F.lit("except").alias("op"), F.col("c_custkey").cast("string").alias("key")
    )
    e = _t(spark, sf_dir, "events")
    ea = e.filter(F.col("ts") < F.lit("2024-01-15").cast("timestamp")).select(
        "event_type"
    )
    eb = e.filter(F.col("ts") >= F.lit("2024-01-15").cast("timestamp")).select(
        "event_type"
    )
    uni = (
        ea.unionByName(eb)
        .distinct()
        .select(F.lit("union").alias("op"), F.col("event_type").alias("key"))
    )
    li = _t(spark, sf_dir, "lineitem")
    la = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    lr = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    exc_all = la.exceptAll(lr).select(
        F.lit("except_all").alias("op"),
        F.col("l_suppkey").cast("string").alias("key"),
    )
    inter_all = la.intersectAll(lr).select(
        F.lit("intersect_all").alias("op"),
        F.col("l_suppkey").cast("string").alias("key"),
    )
    return (
        inter.unionByName(exc)
        .unionByName(uni)
        .unionByName(exc_all)
        .unionByName(inter_all)
    )


@register(
    "pivot_fixed",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_o,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot with fixed value list (no extra pass to discover values); "
    "oracle is the equivalent conditional aggregation",
    tags=("agg", "pivot"),
)
def pivot_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double"))
    )
    return p.select(
        "l_returnflag", F.col("O").alias("qty_o"), F.col("F").alias("qty_f")
    )


@register(
    "agg_q3_shipping_priority",
    """
    SELECT o.o_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way selective join → grouped revenue → top-10 "
    "(filters push to all three scans; order+limit plans as "
    "TakeOrderedAndProject)",
    tags=("join", "agg", "tpch"),
)
def agg_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(3,2)")
    one = F.lit(1).cast("decimal(3,2)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "agg_q5_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way join (fact chain + broadcast dims) with "
    "the local-supplier co-location predicate; exact decimal revenue",
    tags=("join", "agg", "tpch"),
)
def agg_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(3,2)")
    one = F.lit(1).cast("decimal(3,2)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"))
    )
