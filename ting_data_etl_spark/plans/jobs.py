"""The six reference analytics jobs, re-expressed Spark-first over testdata.

The reference's ``aggregate_by_store.py`` runs six config-keyed pandas jobs
("23-1" … "25-2", semantics in SURVEY.md §2.11) over per-store referral CSVs.
Per FIXTURES.md §C those semantics are re-expressed over the driver's
TPC-H-ish parquet: store_id ↔ ``o_custkey`` (kept STRING end-to-end for
key-semantics fidelity, SURVEY §7.4.5), year/month derived from
``o_orderdate`` and deliberately stringified messily to exercise the
cleaning expressions, measures from ``o_totalprice`` /
``l_extendedprice*(1-l_discount)``, branch ↔ supplier name.

Every job is a pure ``(spark, sf_dir) → DataFrame`` function; the only
materialization is the caller's. Each registers an oracle-SQL twin built
from :mod:`ting_data_etl_spark.plans.oracles` fragments.

Scale notes (100 TB design):
* all measure SUMs use fixed-point exact accumulation (`sum_exact`) — shuffle
  order can never change a result;
* group-by keys are the natural shuffle keys; no repartition hints needed —
  AQE coalesces/splits at runtime;
* dimension joins (customer, supplier, nation) are broadcast — verified in
  tests via the physical plan;
* the fact-fact join (orders ⋈ lineitem) is a shuffle hash join on the join
  key, which is the correct strategy at any scale; with both sides bucketed
  by orderkey it becomes shuffle-free (see README).

Reference parity citations are per-job below (file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ting_data_etl_spark.functions.cleaning import (
    clean_nulls,
    guarded_ratio,
    parse_month,
    sum_exact,
    to_number,
    yoy_ratio,
)
from ting_data_etl_spark.operators.relational import (
    bottom_k_per_group,
    densify_months,
    top_k_per_group,
)
from ting_data_etl_spark.plans.oracles import (
    sql_clean_nulls,
    sql_guarded_ratio,
    sql_parse_month,
    sql_sum_exact,
    sql_to_number,
    sql_yoy,
)
from ting_data_etl_spark.registry import register
from ting_data_etl_spark.sources.tables import load_table

CUR_YEAR = "2000"
PREV_YEAR = "1999"


def referral_binds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Messy-string analogue of fixture A1 (interval_referral_binds).

    All columns string, month deliberately messy (``yyyy/MM``), measure a
    numeric string — matching the reference's ``dtype=str`` ingestion
    (``aggregate_by_store.py:123``).
    """
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("store_id"),
        F.year("o_orderdate").cast("string").alias("year"),
        F.date_format("o_orderdate", "yyyy/MM").alias("month_raw"),
        F.col("o_totalprice").cast("string").alias("total_binds_raw"),
    )


#: SQL twin of :func:`referral_binds` + cleaning — shared CTE prefix.
SQL_BINDS_CTE = f"""
b AS (
  SELECT CAST(o_custkey AS VARCHAR) AS store_id,
         CAST(year(o_orderdate) AS VARCHAR) AS year,
         strftime(o_orderdate, '%Y/%m') AS month_raw,
         CAST(o_totalprice AS VARCHAR) AS total_binds_raw
  FROM orders
),
c AS (
  SELECT store_id, year,
         {sql_parse_month("month_raw")} AS month,
         {sql_to_number("total_binds_raw")} AS v
  FROM b
)
"""


def _cleaned_binds(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = referral_binds(spark, sf_dir)
    return b.select(
        "store_id",
        "year",
        parse_month("month_raw").alias("month"),
        to_number("total_binds_raw").alias("v"),
    )


# --------------------------------------------------------------------------
# 23-1: annual referral KPI card
# Reference: aggregate_by_store.py:109-236 — year filter + month clamp, two
# yearly sums, left join, guarded YoY, chained joins to cumulative binds and
# member totals, guarded bind rate, fillna(0) on join-nullable columns.
# --------------------------------------------------------------------------
_SQL_23_1 = f"""
WITH {SQL_BINDS_CTE},
cur AS (
  SELECT store_id, {sql_sum_exact("v")} AS cur_total
  FROM c WHERE year = '{CUR_YEAR}' AND month BETWEEN 1 AND 12
  GROUP BY store_id
),
prev AS (
  SELECT store_id, {sql_sum_exact("v")} AS prev_total
  FROM c WHERE year = '{PREV_YEAR}' AND month BETWEEN 1 AND 12
  GROUP BY store_id
),
cum AS (
  SELECT store_id, {sql_sum_exact("v")} AS cumulative_total
  FROM c GROUP BY store_id
),
mem AS (
  SELECT CAST(o_custkey AS VARCHAR) AS store_id, COUNT(*) AS member_total
  FROM orders GROUP BY 1
)
SELECT cur.store_id,
       cur.cur_total,
       COALESCE(prev.prev_total, 0.0) AS prev_total,
       {sql_yoy("cur.cur_total", "prev.prev_total")} AS yoy,
       COALESCE(cum.cumulative_total, 0.0) AS cumulative_total,
       COALESCE(mem.member_total, 0) AS member_total,
       {sql_guarded_ratio("cur.cur_total", "mem.member_total")} AS bind_rate
FROM cur
LEFT JOIN prev ON cur.store_id = prev.store_id
LEFT JOIN cum  ON cur.store_id = cum.store_id
LEFT JOIN mem  ON cur.store_id = mem.store_id
"""


@register("job_23_1_annual_kpi", oracle=_SQL_23_1)
def job_23_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cleaned_binds(spark, sf_dir)
    in_year = F.col("month").between(1, 12)
    cur = (
        c.filter((F.col("year") == CUR_YEAR) & in_year)
        .groupBy("store_id")
        .agg(sum_exact("v").alias("cur_total"))
    )
    prev = (
        c.filter((F.col("year") == PREV_YEAR) & in_year)
        .groupBy("store_id")
        .agg(sum_exact("v").alias("prev_total"))
    )
    cum = c.groupBy("store_id").agg(sum_exact("v").alias("cumulative_total"))
    mem = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").cast("string").alias("store_id"))
        .agg(F.count("*").alias("member_total"))
    )
    out = (
        cur.join(prev, "store_id", "left")
        .join(cum, "store_id", "left")
        .join(mem, "store_id", "left")
    )
    return out.select(
        "store_id",
        "cur_total",
        F.coalesce("prev_total", F.lit(0.0)).alias("prev_total"),
        yoy_ratio(F.col("cur_total"), F.col("prev_total")).alias("yoy"),
        F.coalesce("cumulative_total", F.lit(0.0)).alias("cumulative_total"),
        F.coalesce("member_total", F.lit(0)).alias("member_total"),
        guarded_ratio(F.col("cur_total"), F.col("member_total")).alias("bind_rate"),
    )


# --------------------------------------------------------------------------
# 23-2: monthly YoY trend — pivot years to columns, densify to 12 months/store
# Reference: aggregate_by_store.py:239-317 (pivot 274-283, densify 286-293,
# fill_value=0 → zeros not NULLs, YoY NULL only when prev == 0).
# --------------------------------------------------------------------------
_SQL_23_2 = f"""
WITH {SQL_BINDS_CTE},
g AS (
  SELECT store_id, month, year, CAST(ROUND(v * 100) AS BIGINT) AS cents
  FROM c WHERE year IN ('{PREV_YEAR}', '{CUR_YEAR}') AND month IS NOT NULL
),
p AS (
  SELECT store_id, month,
         CAST(COALESCE(SUM(CASE WHEN year = '{PREV_YEAR}' THEN cents END), 0)
              AS BIGINT) / 100.0 AS prev_total,
         CAST(COALESCE(SUM(CASE WHEN year = '{CUR_YEAR}' THEN cents END), 0)
              AS BIGINT) / 100.0 AS cur_total
  FROM g GROUP BY store_id, month
),
spine AS (SELECT CAST(unnest(generate_series(1, 12)) AS INTEGER) AS month),
stores AS (SELECT DISTINCT store_id FROM p),
dense AS (SELECT s.store_id, m.month FROM stores s CROSS JOIN spine m)
SELECT d.store_id, d.month,
       COALESCE(p.prev_total, 0.0) AS prev_total,
       COALESCE(p.cur_total, 0.0) AS cur_total,
       {sql_guarded_ratio(
           "COALESCE(p.cur_total, 0.0) - COALESCE(p.prev_total, 0.0)",
           "COALESCE(p.prev_total, 0.0)",
       )} AS yoy
FROM dense d
LEFT JOIN p ON d.store_id = p.store_id AND d.month = p.month
"""


@register("job_23_2_monthly_yoy", oracle=_SQL_23_2)
def job_23_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cleaned_binds(spark, sf_dir)
    g = c.filter(
        F.col("year").isin(PREV_YEAR, CUR_YEAR) & F.col("month").isNotNull()
    )
    # Pivot years → columns; cents accumulator keeps the pivot agg exact.
    p = (
        g.groupBy("store_id", "month")
        .pivot("year", [PREV_YEAR, CUR_YEAR])
        .agg(F.sum(F.round(F.col("v") * 100).cast("long")))
        .na.fill(0, [PREV_YEAR, CUR_YEAR])
        .select(
            "store_id",
            "month",
            (F.col(PREV_YEAR) / 100.0).alias("prev_total"),
            (F.col(CUR_YEAR) / 100.0).alias("cur_total"),
        )
    )
    dense = densify_months(
        p, ["store_id"], "month", value_cols=["prev_total", "cur_total"]
    )
    return dense.select(
        "store_id",
        "month",
        "prev_total",
        "cur_total",
        yoy_ratio(F.col("cur_total"), F.col("prev_total")).alias("yoy"),
    )


# --------------------------------------------------------------------------
# 24-1: referral performance KPI — whole-year (no month clamp), lineitem
# revenue through the orders⋈lineitem fact-fact join, different column order.
# Reference: aggregate_by_store.py:320-419 (no month filter 346-347,
# column order 400-405).
# --------------------------------------------------------------------------
_SQL_24_1 = f"""
WITH r AS (
  SELECT CAST(o.o_custkey AS VARCHAR) AS store_id,
         CAST(year(o.o_orderdate) AS VARCHAR) AS year,
         l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
cur AS (
  SELECT store_id, {sql_sum_exact("rev")} AS cur_total
  FROM r WHERE year = '{CUR_YEAR}' GROUP BY store_id
),
prev AS (
  SELECT store_id, {sql_sum_exact("rev")} AS prev_total
  FROM r WHERE year = '{PREV_YEAR}' GROUP BY store_id
),
cnt AS (
  SELECT CAST(o_custkey AS VARCHAR) AS store_id, COUNT(*) AS order_cnt
  FROM orders WHERE CAST(year(o_orderdate) AS VARCHAR) = '{CUR_YEAR}'
  GROUP BY 1
)
SELECT cur.store_id,
       {sql_yoy("cur.cur_total", "prev.prev_total")} AS yoy,
       cur.cur_total,
       COALESCE(prev.prev_total, 0.0) AS prev_total,
       COALESCE(cnt.order_cnt, 0) AS order_cnt,
       {sql_guarded_ratio("cur.cur_total", "cnt.order_cnt")} AS rev_per_order
FROM cur
LEFT JOIN prev ON cur.store_id = prev.store_id
LEFT JOIN cnt  ON cur.store_id = cnt.store_id
"""


@register("job_24_1_performance_kpi", oracle=_SQL_24_1)
def job_24_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    r = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").cast("string").alias("store_id"),
        F.year("o_orderdate").cast("string").alias("year"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    cur = (
        r.filter(F.col("year") == CUR_YEAR)
        .groupBy("store_id")
        .agg(sum_exact("rev").alias("cur_total"))
    )
    prev = (
        r.filter(F.col("year") == PREV_YEAR)
        .groupBy("store_id")
        .agg(sum_exact("rev").alias("prev_total"))
    )
    cnt = (
        o.filter(F.year("o_orderdate").cast("string") == CUR_YEAR)
        .groupBy(F.col("o_custkey").cast("string").alias("store_id"))
        .agg(F.count("*").alias("order_cnt"))
    )
    out = cur.join(prev, "store_id", "left").join(cnt, "store_id", "left")
    return out.select(
        "store_id",
        yoy_ratio(F.col("cur_total"), F.col("prev_total")).alias("yoy"),
        "cur_total",
        F.coalesce("prev_total", F.lit(0.0)).alias("prev_total"),
        F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
        guarded_ratio(F.col("cur_total"), F.col("order_cnt")).alias("rev_per_order"),
    )


# --------------------------------------------------------------------------
# 24-2: branch×month conversion rate — composite-key (store, month) left join
# with post-join zero-fill and guarded rate.
# Reference: aggregate_by_store.py:422-510 (composite join 492, fill 493,
# guarded rate 496-498, month-asc output sort 504).
# --------------------------------------------------------------------------
_SQL_24_2 = f"""
WITH {SQL_BINDS_CTE},
fp AS (
  SELECT store_id, month, COUNT(*) AS first_purchase_cnt
  FROM c WHERE year = '{CUR_YEAR}' AND month IS NOT NULL
  GROUP BY store_id, month
),
bn AS (
  SELECT CAST(o.o_custkey AS VARCHAR) AS store_id,
         month(o.o_orderdate) AS month,
         {sql_sum_exact("l.l_extendedprice * (1 - l.l_discount)")} AS binds_total
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE CAST(year(o.o_orderdate) AS VARCHAR) = '{CUR_YEAR}'
  GROUP BY 1, 2
)
SELECT fp.store_id, fp.month,
       fp.first_purchase_cnt,
       COALESCE(bn.binds_total, 0.0) AS binds_total,
       {sql_guarded_ratio("COALESCE(bn.binds_total, 0.0)", "fp.first_purchase_cnt")}
         AS conversion_rate
FROM fp LEFT JOIN bn ON fp.store_id = bn.store_id AND fp.month = bn.month
"""


@register("job_24_2_branch_month_conversion", oracle=_SQL_24_2)
def job_24_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cleaned_binds(spark, sf_dir)
    fp = (
        c.filter((F.col("year") == CUR_YEAR) & F.col("month").isNotNull())
        .groupBy("store_id", "month")
        .agg(F.count("*").alias("first_purchase_cnt"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").cast("string") == CUR_YEAR
    )
    bn = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("string").alias("store_id"),
            F.month("o_orderdate").alias("month"),
        )
        .agg(
            sum_exact(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "binds_total"
            )
        )
    )
    out = fp.join(bn, ["store_id", "month"], "left")
    return out.select(
        "store_id",
        "month",
        "first_purchase_cnt",
        F.coalesce("binds_total", F.lit(0.0)).alias("binds_total"),
        guarded_ratio(
            F.coalesce("binds_total", F.lit(0.0)), F.col("first_purchase_cnt")
        ).alias("conversion_rate"),
    )


# --------------------------------------------------------------------------
# 25-1 / 25-2: top-5 / bottom-5 branches per store by share.
# Reference: aggregate_by_store.py:513-611 (top, sort 593-594) and 614-723
# (bottom, sort 705-706, extra null-sentinel cleaning 653-661). pandas
# head(5) is tie-unstable; we fix the contract with a branch-name tiebreak.
# Store ↔ customer nation, branch ↔ supplier name (FIXTURES.md §C).
# --------------------------------------------------------------------------
def _branch_share_sql(order: str) -> str:
    return f"""
WITH r AS (
  SELECT CAST(cu.c_nationkey AS VARCHAR) AS store_id,
         {sql_clean_nulls("s.s_name")} AS branch_name,
         l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer cu ON o.o_custkey = cu.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE CAST(year(o.o_orderdate) AS VARCHAR) = '{CUR_YEAR}'
),
g AS (
  SELECT store_id, branch_name,
         {sql_sum_exact("rev")} AS binds_total,
         COUNT(*) AS first_purchase_cnt
  FROM r WHERE branch_name IS NOT NULL
  GROUP BY store_id, branch_name
),
ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY store_id
           ORDER BY share {order}, branch_name ASC
         ) AS rn
  FROM (
    SELECT *, {sql_guarded_ratio("binds_total", "first_purchase_cnt")} AS share
    FROM g
  )
)
SELECT store_id, branch_name, binds_total, first_purchase_cnt, share
FROM ranked WHERE rn <= 5
"""


def _branch_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").cast("string") == CUR_YEAR
    )
    cu = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    r = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(
            F.col("c_nationkey").cast("string").alias("store_id"),
            clean_nulls("s_name").alias("branch_name"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    g = (
        r.filter(F.col("branch_name").isNotNull())
        .groupBy("store_id", "branch_name")
        .agg(
            sum_exact("rev").alias("binds_total"),
            F.count("*").alias("first_purchase_cnt"),
        )
    )
    return g.withColumn(
        "share", guarded_ratio(F.col("binds_total"), F.col("first_purchase_cnt"))
    )


@register("job_25_1_top5_branches", oracle=_branch_share_sql("DESC NULLS LAST"))
def job_25_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _branch_share(spark, sf_dir)
    return top_k_per_group(
        g, ["store_id"], "share", k=5, tiebreak=["branch_name"]
    ).select("store_id", "branch_name", "binds_total", "first_purchase_cnt", "share")


@register("job_25_2_bottom5_branches", oracle=_branch_share_sql("ASC NULLS LAST"))
def job_25_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _branch_share(spark, sf_dir)
    return bottom_k_per_group(
        g, ["store_id"], "share", k=5, tiebreak=["branch_name"]
    ).select("store_id", "branch_name", "binds_total", "first_purchase_cnt", "share")


# --------------------------------------------------------------------------
# Generic config-driven filter+aggregate — the reference's declared design
# (CONFIGS dict, aggregate_by_store.py:15-99 + generic path 725-762; dead
# code there, made real here per SURVEY §2.11).
# --------------------------------------------------------------------------
_SQL_GENERIC = f"""
WITH {SQL_BINDS_CTE}
SELECT store_id, {sql_sum_exact("v")} AS total
FROM c
WHERE year = '{CUR_YEAR}' AND month IN (1, 2, 3, 4, 5, 6)
GROUP BY store_id
"""


@register("job_generic_config_sum", oracle=_SQL_GENERIC)
def job_generic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ting_data_etl_spark.plans.config import AggregationConfig, run_generic

    cfg = AggregationConfig(
        source="orders",
        key_cols=["store_id"],
        value_col="v",
        year=CUR_YEAR,
        months=[1, 2, 3, 4, 5, 6],
    )
    return run_generic(spark, sf_dir, cfg)
