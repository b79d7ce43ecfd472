"""OLAP-surface queries: set operations, grouping sets, exact percentiles,
analytic windows, CDC snapshots, and the scalar-function matrix — rounding
out the SQL capability inventory with oracle pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tulflow_spark.functions import dsum, dsum_sql
from tulflow_spark.io import table
from tulflow_spark.operators.cdc import latest_snapshot
from tulflow_spark.plans import register


@register(
    "set1_nation_intersect",
    oracle="""
    SELECT n_nationkey AS nationkey FROM customer JOIN nation ON c_nationkey = n_nationkey
    INTERSECT
    SELECT n_nationkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def set1_nation_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT surface: nations with both customers and suppliers."""
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select(F.col("n_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select(F.col("n_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "a5_rollup",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface: ROLLUP with GROUPING() markers."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            dsum("l_quantity", "sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag",
            "g_status",
            "sum_qty",
        )
    )


@register(
    "a6_percentiles",
    oracle="""
    SELECT c_mktsegment,
           quantile_cont(c_acctbal, 0.5) AS median_bal,
           quantile_cont(c_acctbal, 0.9) AS p90_bal,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def a6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≙ DuckDB
    quantile_cont); min/max ride along."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.5)").alias("median_bal"),
        F.expr("percentile(c_acctbal, 0.9)").alias("p90_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@register(
    "w4_rank",
    oracle="""
    SELECT c_custkey,
           RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_rank,
           NTILE(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def w4_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK (tie-stable) + NTILE windows."""
    c = table(spark, sf_dir, "customer")
    by_bal = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    by_bal_stable = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    # bigint casts: Spark's rank/ntile are int32, DuckDB's are int64 — align
    # the schema the driver compares
    return c.select(
        "c_custkey",
        F.rank().over(by_bal).cast("bigint").alias("bal_rank"),
        F.ntile(4).over(by_bal_stable).cast("bigint").alias("quartile"),
    )


@register(
    "cdc1_latest_snapshot",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id AS last_event_id, value AS last_value
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc1_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deleted-record CDC semantics (reference: harvest.py:196-203 deleted
    routing → index deletes): latest version per key, keys whose newest
    change is a delete dropped."""
    ev = table(spark, sf_dir, "events")
    snap = latest_snapshot(
        ev, keys=["user_id"], order_by=["ts", "event_id"],
        deleted=F.col("event_type") == "error",
    )
    return snap.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


@register(
    "f2_scalar_matrix",
    oracle="""
    SELECT o_orderkey,
           CAST(regexp_extract(o_orderpriority, '^(\\d+)', 1) AS INT) AS prio_num,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           md5(o_orderstatus || '|' || o_orderpriority) AS row_key,
           length(o_orderpriority) AS prio_len,
           upper(o_orderstatus) AS status_uc,
           array_to_string(string_split(o_orderpriority, '-'), chr(10)) AS prio_lines
    FROM orders
    """,
)
def f2_scalar_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar surface in one projection (SURVEY §2.8):
    regexp extract/version parse, timestamp formatting, md5 keys, length,
    case mapping, split + newline-join."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^(\d+)", 1)
        .cast("int")
        .alias("prio_num"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.md5(
            F.concat(F.col("o_orderstatus"), F.lit("|"), F.col("o_orderpriority"))
            .cast("binary")
        ).alias("row_key"),
        F.length("o_orderpriority").cast("bigint").alias("prio_len"),
        F.upper("o_orderstatus").alias("status_uc"),
        F.array_join(F.split("o_orderpriority", "-"), "\n").alias("prio_lines"),
    )


@register(
    "tx5_subword_tokens",
    oracle="""
    SELECT source,
           CAST(SUM(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))) AS BIGINT)
             AS total_subword_tokens
    FROM documents GROUP BY source
    """,
)
def tx5_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword token counting rollup (lookaround-free regex — same
    formula on Java regex and RE2)."""
    from tulflow_spark.ext.text import bpe_ish_token_count

    d = table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(bpe_ish_token_count("text")).alias("total_subword_tokens")
    )


@register(
    "j4_json_extract",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def j4_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: JSON property extraction from the events
    props column (JVM get_json_object — no Python)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
    )


@register(
    "sk1_salted_sum",
    oracle=f"""
    SELECT event_type, {dsum_sql('value')} AS total, COUNT(*) AS n_rows
    FROM events GROUP BY event_type
    """,
)
def sk1_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase salted aggregation — must be bit-identical
    to the plain group-by (the oracle IS the plain group-by)."""
    from tulflow_spark.operators.skew import salted_sum

    ev = table(spark, sf_dir, "events")
    return salted_sum(ev, ["event_type"], "value", buckets=16, alias="total")


@register(
    "sk2_salted_join",
    oracle=f"""
    SELECT n_name, COUNT(*) AS n_cust,
           {dsum_sql('c_acctbal')} AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def sk2_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted equi-join — must be row-identical to the plain
    join (the oracle IS the plain join + rollup).  The hot-key shape: the
    big side salts, the small side replicates x buckets, each hot-key row
    group meets its own small-side copy on its own reducer."""
    from tulflow_spark.operators.skew import salted_join

    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    joined = salted_join(c, n, ["c_nationkey"], buckets=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        dsum("c_acctbal", "total_bal"),
    )


@register(
    "j5_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k,
           CAST(COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
             AS BIGINT) AS n_distinct_k
    FROM events
    GROUP BY event_type
    """,
)
def j5_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface via Spark 4 VariantType: ``parse_json`` once,
    typed ``try_variant_get`` extraction — the open-schema path for event
    properties (no schema inference pass, no per-field regex).  The variant
    parse stays inside codegen; aggregation is an ordinary partial-agg
    group-by."""
    ev = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count_distinct(F.col("k")).alias("n_distinct_k"),
        )
    )


@register(
    "a9_approx_quantiles",
    oracle="""
    WITH ex AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS exact_p50,
             quantile_cont(value, 0.99) AS exact_p99,
             COUNT(*) AS n
      FROM events GROUP BY event_type
    )
    SELECT event_type, n, TRUE AS p50_within_bound, TRUE AS p99_within_bound
    FROM ex
    """,
)
def a9_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches: `percentile_approx` (Greenwald-Khanna,
    rank error ≤ 1/accuracy) per event_type — the 100 TB path where exact
    percentiles (a6) would shuffle every value; sketches merge map-side.

    Oracle-gated like a7: the flags assert the approximate p50/p99 land
    within the GK rank-error bound of the EXACT quantiles (both engines
    agree on group keys and counts; a sketch regression flips a flag)."""
    ev = table(spark, sf_dir, "events")
    acc = 1000  # rank error <= n/1000 per group
    approx = ev.groupBy("event_type").agg(
        F.expr(f"percentile_approx(value, 0.5, {acc})").alias("a50"),
        F.expr(f"percentile_approx(value, 0.99, {acc})").alias("a99"),
        F.count(F.lit(1)).alias("n"),
    )
    # the bound brackets must use the sketch's own DISCRETE order-statistic
    # semantics, not interpolated percentile(): max-accuracy GK is exact and
    # definitionally identical, so [p-eps, p+eps] brackets are airtight at
    # any group size (interpolated brackets fail when eps*n < 1 rank).
    # eps is 5x the nominal 1/acc: merging per-partition GK summaries
    # degrades the guarantee by a small constant factor that varies with
    # the session's partition count (observed ~3 ranks past nominal under
    # a vanilla 4-core session) — 5x still fails loudly on a real estimator
    # regression, which lands whole percentiles away
    exact_acc = 2147483647
    eps = 5.0 / acc
    exact = ev.groupBy("event_type").agg(
        F.expr(f"percentile_approx(value, {0.5 - eps}, {exact_acc})").alias("e50_lo"),
        F.expr(f"percentile_approx(value, {0.5 + eps}, {exact_acc})").alias("e50_hi"),
        F.expr(f"percentile_approx(value, {0.99 - eps}, {exact_acc})").alias("e99_lo"),
        F.expr(f"percentile_approx(value, {min(1.0, 0.99 + eps)}, {exact_acc})").alias("e99_hi"),
    )
    return approx.join(exact, "event_type").select(
        "event_type",
        "n",
        ((F.col("a50") >= F.col("e50_lo")) & (F.col("a50") <= F.col("e50_hi")))
        .alias("p50_within_bound"),
        ((F.col("a99") >= F.col("e99_lo")) & (F.col("a99") <= F.col("e99_hi")))
        .alias("p99_within_bound"),
    )


@register(
    "ev4_funnel",
    oracle="""
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT COUNT(*) AS conversions,
           COUNT(DISTINCT user_id) AS converted_users
    FROM v
    WHERE EXISTS (
      SELECT 1 FROM c
      WHERE c.user_id = v.user_id
        AND c.ts > v.ts
        AND c.ts <= v.ts + INTERVAL 30 MINUTE
    )
    """,
)
def ev4_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion (view → click within 30 min): EXISTS decorrelated
    to a LEFT SEMI self-join on user_id with range conjuncts — both sides
    pre-filtered at the scan, one shuffle on the user key, per-user pair
    space bounded by a user's own activity."""
    ev = table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts"))
    )
    hits = v.join(
        c,
        (F.col("user_id") == F.col("c_uid"))
        & (F.col("c_ts") > F.col("ts"))
        & (F.col("c_ts") <= F.col("ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_semi",
    )
    return hits.agg(
        F.count(F.lit(1)).alias("conversions"),
        F.countDistinct("user_id").alias("converted_users"),
    )


@register(
    "a10_cube",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           {dsum_sql('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a10_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 2^n slices in one pass — Spark plans a
    single Expand + partial aggregate, not n separate scans)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            dsum("l_extendedprice", "sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag",
            "g_status",
            "sum_price",
        )
    )


@register(
    "a11_pivot",
    oracle=f"""
    SELECT user_id % 10 AS user_bucket,
           {dsum_sql("CASE WHEN event_type = 'view' THEN value ELSE 0 END")}
             AS view_value,
           {dsum_sql("CASE WHEN event_type = 'click' THEN value ELSE 0 END")}
             AS click_value,
           {dsum_sql("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")}
             AS purchase_value
    FROM events
    GROUP BY user_id % 10
    """,
)
def a11_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: wide per-bucket columns from the long event stream.
    The explicit value list keeps it one pass (no distinct-values pre-scan);
    decimal-exact sums make the wide cells hash-stable."""
    ev = table(spark, sf_dir, "events")
    piv = (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(
            F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(30,6)"))
        )
    )
    return piv.select(
        "user_bucket",
        F.coalesce(F.col("view").cast("double"), F.lit(0.0)).alias("view_value"),
        F.coalesce(F.col("click").cast("double"), F.lit(0.0)).alias("click_value"),
        F.coalesce(F.col("purchase").cast("double"), F.lit(0.0)).alias(
            "purchase_value"
        ),
    )


@register(
    "a12_rollup",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           {dsum_sql('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (the hierarchical prefix subset of a10's CUBE:
    (flag,status), (flag), () — one Expand pass, same partial-agg shape)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            dsum("l_extendedprice", "sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag",
            "g_status",
            "sum_price",
        )
    )


@register(
    "a13_grouping_sets",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(CAST(l_linestatus AS VARCHAR), 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status2,
           COUNT(*) AS n_rows,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def a13_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent single-column groupings in
    ONE scan/Expand pass (the non-hierarchical case CUBE (a10) and ROLLUP
    (a12) can't express without extra sets): per-returnflag totals and
    per-linestatus totals side by side, disambiguated by GROUPING bits."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]],
            "l_returnflag", "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status2"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity", "sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus").cast("string"), F.lit("ALL"))
            .alias("linestatus"),
            "g_flag", "g_status2", "n_rows", "sum_qty",
        )
    )


@register(
    "w5_month_delta",
    oracle=f"""
    WITH monthly AS (
      SELECT n_name,
             CAST(EXTRACT(year FROM o_orderdate) * 100
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
             {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name, ym
    )
    SELECT n_name, ym, revenue,
           revenue - LAG(revenue) OVER (PARTITION BY n_name ORDER BY ym)
             AS delta
    FROM monthly
    """,
)
def w5_month_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue delta per nation (the TPC-DS-flavored LAG
    shape): decimal-exact monthly rollup first, then LAG over the tiny
    (nation × month) frame — the window runs on aggregate-sized data, so
    the per-nation sort is negligible at any scale.  First-month rows keep
    NULL delta."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("bigint")
    monthly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", ym.alias("ym"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("ym")
    return monthly.select(
        "n_name", "ym", "revenue",
        (F.col("revenue") - F.lag("revenue").over(w)).alias("delta"),
    )


@register(
    "w6_moving_avg",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             {dsum_sql('o_totalprice')} AS revenue
      FROM orders GROUP BY d
    )
    SELECT CAST(d AS TIMESTAMP) AS day, revenue,
           CAST(SUM(CAST(revenue AS DECIMAL(30,6))) OVER (
             ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE)
           / COUNT(revenue) OVER (
             ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS avg_7d
    FROM daily
    """,
)
def w6_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row trailing moving average of daily revenue (ROWS frame): the
    rollup collapses orders to one row per day BEFORE the window, so the
    unpartitioned ORDER BY runs over ~2,400 rows regardless of fact-table
    scale (window-on-aggregate, never window-on-fact).  Decimal-exact
    frame sums; COUNT handles the short head frames exactly like the
    oracle."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(dsum("o_totalprice", "revenue"))
    )
    w = Window.orderBy("d").rowsBetween(-6, Window.currentRow)
    return daily.select(
        F.col("d").cast("timestamp").alias("day"),
        "revenue",
        (
            F.sum(F.col("revenue").cast("decimal(30,6)")).over(w).cast("double")
            / F.count("revenue").over(w)
        ).alias("avg_7d"),
    )
