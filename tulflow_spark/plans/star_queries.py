"""Star-schema query inventory: the reference's dataflow operators (SURVEY.md
§2) re-expressed over the driver's TPC-H-ish synthetic corpus, each with a
DuckDB oracle.

Scale notes (100 TB stance), applied throughout:
- dimension joins (region/nation/customer/part/supplier) are explicitly
  ``F.broadcast`` — no shuffle of the fact table for enrichment joins;
- fact-side aggregations rely on map-side partial aggregation (groupBy over
  low-cardinality keys shuffles only the partials);
- float SUM/AVG uses decimal-exact accumulation (tulflow_spark.functions.dsum)
  so results are order/partitioning-insensitive — correct under ANY degree of
  parallelism, which is also what makes the oracle hash match;
- top-k uses window row_number with a total tie-break order, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tulflow_spark.functions import davg_sql, dsum, dsum_sql
from tulflow_spark.io import table
from tulflow_spark.operators.routing import harvest_counts, with_route
from tulflow_spark.plans import register

# ---------------------------------------------------------------------------
# Aggregation / counter surface (SURVEY §2.5) — TPC-H Q1-shaped rollup
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "sum_disc_price",
            ),
            (dsum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("l_extendedprice")).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Join surface (SURVEY §2.6) — broadcast enrichment, multi-join, anti-join
# ---------------------------------------------------------------------------


@register(
    "q03_top_revenue_orders",
    oracle=f"""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer is a dimension → broadcast; orders⋈lineitem is
    the one necessary fact-fact shuffle (co-partitioned on orderkey)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q05_region_revenue",
    oracle=f"""
    SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: all dimensions broadcast; the only shuffle is
    lineitem⋈orders on orderkey + the final tiny group-by."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "j1_broadcast_enrich",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_items,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def j1_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boundwith-lookup join shape (reference: harvest.py:235-247 — small
    CSV fetched once and probed per record): small side broadcast, fact side
    never shuffled for the join."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@register(
    "j2_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j2_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-difference shape (reference: generate_oai_sets excluded-sets path,
    harvest.py:87-89): left anti join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "j3_semi_join",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_suppkey = s_suppkey AND l_quantity >= 49
    )
    """,
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


# ---------------------------------------------------------------------------
# Routing / projection / scalar-validation surface (SURVEY §2.3)
# ---------------------------------------------------------------------------


@register(
    "p1_route_split",
    oracle=f"""
    SELECT CASE WHEN event_type = 'error' THEN 'deleted' ELSE 'updated' END AS route,
           COUNT(*) AS n,
           {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1
    """,
)
def p1_route_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``process_xml`` updated/deleted routing (reference: harvest.py:196-203)
    as a single-pass route column — one scan feeds both output streams."""
    ev = table(spark, sf_dir, "events")
    routed = with_route(ev, F.col("event_type") == "error")
    return routed.groupBy("route").agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "total_value")
    )


@register(
    "a1_harvest_counts",
    oracle="""
    SELECT event_type AS source_set,
           CAST(SUM(CASE WHEN value <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS updated,
           CAST(SUM(CASE WHEN value >  100 THEN 1 ELSE 0 END) AS BIGINT) AS deleted
    FROM events
    GROUP BY event_type
    """,
)
def a1_harvest_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-set updated/deleted counters (reference: harvest.py:55-65)."""
    ev = table(spark, sf_dir, "events").withColumnRenamed("event_type", "source_set")
    return harvest_counts(ev, "source_set", F.col("value") > 100)


@register(
    "p4_exactly_one",
    oracle="""
    SELECT o_custkey AS record_key, MAX(o_orderkey) AS record_id
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_custkey
    HAVING COUNT(*) = 1
    """,
)
def p4_exactly_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``get_record_001`` semantics (reference: process.py:66-80): a key is
    valid only when EXACTLY ONE non-empty candidate exists; zero or duplicates
    → dropped to the error side."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        o.groupBy(F.col("o_custkey").alias("record_key"))
        .agg(
            F.max("o_orderkey").alias("record_id"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") == 1)
        .select("record_key", "record_id")
    )


@register(
    "a4_latest_version",
    oracle="""
    WITH named AS (
      SELECT p_brand || '-' || CAST(p_size AS VARCHAR) AS configset FROM part
    )
    SELECT regexp_replace(configset, '-(\\d+)$', '') AS name,
           MAX(CAST(regexp_extract(configset, '-(\\d+)$', 1) AS INT)) AS latest_version
    FROM named
    GROUP BY 1
    """,
)
def a4_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``most_recent_configsets`` (reference: solr_api_utils.py:81-92): parse
    ``name-N``, group by name, keep max version — the reference's one real
    group-by+max, here with the same regex split."""
    p = table(spark, sf_dir, "part").select(
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_size").cast("string")).alias(
            "configset"
        )
    )
    return (
        p.select(
            F.regexp_replace("configset", r"-(\d+)$", "").alias("name"),
            F.regexp_extract("configset", r"-(\d+)$", 1).cast("int").alias("v"),
        )
        .groupBy("name")
        .agg(F.max("v").alias("latest_version"))
    )


@register(
    "f1_md5_content_keys",
    oracle="""
    WITH norm AS (
      SELECT text, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
      FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique,
           MIN(md5(text)) AS min_key,
           COUNT(DISTINCT md5(substr(t, 1, 64) || '|' || substr(reverse(t), 1, 64)))
             AS n_unique_fp
    FROM norm
    """,
)
def f1_md5_content_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed keys (reference: harvest.py:260 md5-of-content S3
    keys): F.md5 is JVM-side, no Python in the loop.  Also rolls up the
    normalized head/tail document fingerprint (ext.text.doc_fingerprint) —
    absorbed r1's tx4_fingerprints gate (registry slot budget)."""
    from tulflow_spark.ext.text import doc_fingerprint

    d = table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_unique"),
        F.min(F.md5(F.col("text").cast("binary"))).alias("min_key"),
        F.countDistinct(doc_fingerprint("text")).alias("n_unique_fp"),
    )


@register(
    "p8_identifier_fallback",
    oracle="""
    SELECT doc_id,
           CASE WHEN n_chars > 120
                THEN array_to_string(string_split(text, ' ')[1:3], chr(10))
                ELSE text END AS display_id
    FROM documents
    """,
)
def p8_identifier_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``identifier_or_full_record`` (reference: validate.py:202-216):
    newline-join of extracted identifiers when present, else the full record."""
    d = table(spark, sf_dir, "documents")
    ids = F.slice(F.split(F.col("text"), " "), 1, 3)
    return d.select(
        "doc_id",
        F.when(F.col("n_chars") > 120, F.array_join(ids, "\n"))
        .otherwise(F.col("text"))
        .alias("display_id"),
    )


# ---------------------------------------------------------------------------
# Window / event-time surface (SURVEY §2.7 — capabilities the reference lacks
# but the engine provides as first-class operators)
# ---------------------------------------------------------------------------


@register(
    "w1_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window row_number — no global sort; at scale this
    shuffles once on the partition key with AQE skew handling."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@register(
    "w2_running_total",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
             AS running_value,
           CAST(date_diff('microsecond',
                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                ts) AS BIGINT) AS us_since_prev
    FROM events
    """,
)
def w2_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user cumulative sum (decimal-exact so the prefix sums are
    order-of-evaluation independent) + LAG inter-event gap in exact integer
    microseconds (millisecond division is where engines disagree on
    truncation).  One shuffle on user_id serves both window frames —
    absorbed r1's separate w3_lag_delta gate (registry slot budget: the
    driver adjudicates only the first ~50 queries)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(30,6)"))
        .over(wsum)
        .cast("double")
        .alias("running_value"),
        # timestamp_diff works on both TIMESTAMP and TIMESTAMP_NTZ — the
        # driver's regenerated events.ts is now timestamp[us] (naive), which
        # Spark reads as NTZ, and unix_micros accepts only LTZ.
        F.timestamp_diff("MICROSECOND", prev, F.col("ts")).alias("us_since_prev"),
    )


@register(
    "ev1_hourly_rollup",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ev1_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup; in streaming mode the identical expression runs
    under ``withWatermark`` (see tulflow_spark.streaming.events)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))


@register(
    "ev2_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, {dsum_sql('value')} AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def ev2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) via ``F.session_window`` — the native
    Spark operator (state-store backed in streaming; hash-agg in batch)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "session_value"),
        )
        .select("user_id", "session_start", "n_events", "session_value")
    )


@register(
    "a2_empty_sets",
    oracle="""
    WITH requested(source_set) AS (
      VALUES ('click'), ('view'), ('purchase'), ('signup'), ('error'),
             ('ghost-set'), ('another-empty')
    )
    SELECT r.source_set FROM requested r
    WHERE NOT EXISTS (
      SELECT 1 FROM events e WHERE e.event_type = r.source_set
    )
    """,
)
def a2_empty_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Requested-but-empty harvest sets (reference: harvest.py:41-51
    sets_with_no_records) — anti-join of the requested list against what
    actually produced records."""
    from tulflow_spark.operators.routing import sets_with_no_records

    requested = spark.createDataFrame(
        [("click",), ("view",), ("purchase",), ("signup",), ("error",),
         ("ghost-set",), ("another-empty",)],
        "source_set string",
    )
    harvested = table(spark, sf_dir, "events").withColumnRenamed(
        "event_type", "source_set"
    )
    return sets_with_no_records(requested, harvested)


@register(
    "q17_small_quantity",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#11'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (decorrelated by Catalyst
    into an aggregate + join — no per-row re-execution)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0
                 AS avg_yearly
        FROM lineitem_v JOIN part_v ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#11'
          AND l_quantity < (
            SELECT 0.2 * AVG(l_quantity) FROM lineitem_v l2
            WHERE l2.l_partkey = p_partkey
          )
    """)


@register(
    "sql1_pure_sql",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
)
def sql1_pure_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() API surface: identical SQL text runs on both engines
    (modulo the registered view names)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                 AS total_price
        FROM orders_v
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
    """)


@register(
    "ev3_sliding_window",
    oracle=f"""
    WITH shifted AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - o.off * INTERVAL '30 minutes' AS window_start,
             value
      FROM events CROSS JOIN (VALUES (0), (1)) o(off)
    )
    SELECT window_start, COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM shifted GROUP BY window_start
    """,
)
def ev3_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h window, 30m slide): every event lands in exactly
    two overlapping windows — F.window's sliding form; oracle replicates via
    the two-shifted-tumbling-buckets identity."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
        .select(F.col("win.start").alias("window_start"), "n", "total_value")
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * {dsum_sql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
           / {dsum_sql('l_extendedprice * (1 - l_discount)')} AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio over a broadcast
    dimension join.  (Registered into the parity suite since the EXTRA
    registry exists; ``test_plan_properties.py::test_q14_parity`` predates
    that and stays as a second pin.)"""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_pct"))
    )


@register(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue_delta,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side conjunctive predicates (date range +
    numeric between + threshold), no join — pushdown does all the work."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue_delta"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counting with IN-list predicates over a
    fact-fact join."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions mixing join-side and fact-side
    columns — the planner must keep the join equi and evaluate the
    disjunction as a post-join filter."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# As-of join (custom operator — Spark has no native ASOF JOIN; DuckDB does,
# which makes it a perfect oracle pair)
# ---------------------------------------------------------------------------


@register(
    "aj1_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), views AS (
      SELECT user_id, ts, MAX(value) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id, c.ts,
           v.ts AS asof_ts, v.view_value AS asof_view_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def aj1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each click joined to the newest same-user
    view at-or-before it.  Implemented with the union-tag/window carry
    (operators/asof.py) — one shuffle on the key, no range-join pair
    explosion; DuckDB's native ASOF LEFT JOIN is the oracle."""
    from tulflow_spark.operators.asof import asof_join

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    return asof_join(
        clicks, views, on=["user_id"], left_ts="ts", right_ts="ts",
        payload=["view_value"],
    )


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join with a
    non-equi conjunct (shipped after order date); the orders quarter filter
    is pushed to the scan, and only (orderkey, dates) shuffle for the
    semi-join probe."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue top-20 — fact-fact join on the order
    key, broadcast customer/nation dimensions, decimal-exact revenue, and
    `orderBy().limit(20)` → TakeOrderedAndProject (never a global sort)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q16_supplier_cardinality",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_type NOT LIKE 'MEDIUM%' AND p_brand <> 'Brand#33'
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp absent from the corpus → lineitem is the
    part-supplier association): NOT-LIKE/exclusion predicates on a
    broadcast dimension + COUNT(DISTINCT) — Spark plans the distinct as a
    two-level expand+aggregate, partials map-side."""
    p = table(spark, sf_dir, "part").filter(
        (~F.col("p_type").like("MEDIUM%")) & (F.col("p_brand") != "Brand#33")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
