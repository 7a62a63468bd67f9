"""Query registry: every implemented operator exposed as a named
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) a
DuckDB oracle SQL string.

This is the engine's conformance suite — one key per operator row in
SURVEY.md §2. Column names are aliased identically on both sides;
aggregates use exact decimal arithmetic (php_etl_spark.functions.exact)
so values are bit-identical across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from php_etl_spark.catalog import Catalog
from php_etl_spark.functions.exact import dsum, davg, dec, MONEY, RATE
from php_etl_spark.functions.strings import str_before, str_after, dedup_key
from php_etl_spark.operators import (
    apply_mapping,
    parse_conjunction,
    lookup_join,
    semi_join,
    anti_join,
    fanout_join,
    first_wins_dedup,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _cat(spark: SparkSession, sf_dir: str) -> Catalog:
    return Catalog(spark, sf_dir)


# ---------------------------------------------------------------------------
# §2.1 scans
# ---------------------------------------------------------------------------


@query(
    "scan_lineitem",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity > 30
    """,
)
def scan_lineitem(spark, sf_dir):
    """S1: projected+filtered scan; both the column list and the
    predicate reach the parquet reader (PushedFilters/ReadSchema).
    Reference: SQLTable::all builds SELECT <cols> WHERE <q>
    (/root/reference/sdk/src/SQLTable.php:38-50)."""
    return (
        _cat(spark, sf_dir)
        .lineitem.select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
        .filter(F.col("l_quantity") > 30)
    )


# ---------------------------------------------------------------------------
# §2.2 projection / mapping
# ---------------------------------------------------------------------------


@query(
    "project_columns",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def project_columns(spark, sf_dir):
    """P1: column-list projection (/root/reference/sdk/src/SQLTable.php:40-44)."""
    return _cat(spark, sf_dir).customer.select("c_custkey", "c_name", "c_mktsegment")


@query(
    "project_rename",
    oracle="""
    SELECT c_custkey AS person_id, c_name AS full_name,
           c_nationkey AS country_id FROM customer
    """,
)
def project_rename(spark, sf_dir):
    """P2: 'dst <- [src]' mapping spec compiled to select/alias
    (/root/reference/sdk/etl.php:10-30)."""
    return apply_mapping(
        _cat(spark, sf_dir).customer,
        ["person_id <- [c_custkey]", "full_name <- [c_name]", "country_id <- [c_nationkey]"],
    )


@query(
    "project_literal",
    oracle="""
    SELECT o_orderkey AS order_id, 'etl' AS source_system, 1 AS batch_no
    FROM orders
    """,
)
def project_literal(spark, sf_dir):
    """P3: literal columns from the mapping spec
    (/root/reference/sdk/src/ETLTask.php:83 final branch)."""
    return apply_mapping(
        _cat(spark, sf_dir).orders,
        {"order_id": "[o_orderkey]", "source_system": "etl", "batch_no": "1"},
    )


@query("project_now")
def project_now(spark, sf_dir):
    """P4: NOW() computed column — nondeterministic, rows-only check
    (/root/reference/sdk/src/ETLTask.php:83)."""
    return apply_mapping(
        _cat(spark, sf_dir).orders,
        {"order_id": "[o_orderkey]", "imported_at": "NOW()"},
    )


@query("gen_uuid")
def gen_uuid(spark, sf_dir):
    """P5: generated v4 UUID key per row — rows-only
    (str_uuid, /root/reference/sdk/lib/str.php:39-51)."""
    return _cat(spark, sf_dir).customer.select(
        F.col("c_custkey"), F.expr("uuid()").alias("row_uuid")
    )


@query(
    "reshape_person",
    oracle="""
    SELECT c_custkey AS person_id,
           COALESCE(c_name, 'UNKNOWN') AS name,
           UPPER(c_mktsegment) AS segment,
           CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS delinquent,
           CAST(c_nationkey AS BIGINT) AS nation_id
    FROM customer
    """,
)
def reshape_person(spark, sf_dir):
    """P7: hand-built per-row reshaping dict → one select
    (assure→person map, /root/reference/sdk/migrate_assures.php:304-315)."""
    c = _cat(spark, sf_dir).customer
    return c.select(
        F.col("c_custkey").alias("person_id"),
        F.coalesce(F.col("c_name"), F.lit("UNKNOWN")).alias("name"),
        F.upper(F.col("c_mktsegment")).alias("segment"),
        F.when(F.col("c_acctbal") < 0, F.lit(1)).otherwise(F.lit(0)).alias("delinquent"),
        F.col("c_nationkey").cast("long").alias("nation_id"),
    )


# ---------------------------------------------------------------------------
# §2.3 filters
# ---------------------------------------------------------------------------


@query(
    "filter_where",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 100000 AND o_orderstatus = 'F'
    """,
)
def filter_where(spark, sf_dir):
    """F1: raw WHERE fragment pushed to the scan
    (/root/reference/sdk/etl.php:141)."""
    return (
        _cat(spark, sf_dir)
        .orders.filter(F.expr("o_totalprice > 100000 AND o_orderstatus = 'F'"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "filter_eq",
    oracle="""
    SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
    """,
)
def filter_eq(spark, sf_dir):
    """F2: parameterized equality (/root/reference/sdk/migrate_assures.php:21-24)."""
    return (
        _cat(spark, sf_dir)
        .events.filter(F.col("event_type") == F.lit("purchase"))
        .select("event_id", "user_id", "value")
    )


@query(
    "filter_and",
    oracle="""
    SELECT p_partkey, p_brand, p_size FROM part
    WHERE p_size >= 10 AND p_brand = 'Brand#3'
    """,
)
def filter_and(spark, sf_dir):
    """F3: the 'col op value' conjunction mini-parser
    (SQLTable::exists, /root/reference/sdk/src/SQLTable.php:52-79)."""
    return (
        _cat(spark, sf_dir)
        .part.filter(parse_conjunction("p_size >= 10", "p_brand = 'Brand#3'"))
        .select("p_partkey", "p_brand", "p_size")
    )


@query(
    "filter_notnull",
    oracle="""
    SELECT event_id, COALESCE(props, '{}') AS props_safe FROM events
    WHERE props IS NOT NULL AND user_id IS NOT NULL
    """,
)
def filter_notnull(spark, sf_dir):
    """F5: null/validity guards (?? null defaulting,
    /root/reference/sdk/migrate_assures.php:108,230)."""
    ev = _cat(spark, sf_dir).events
    return ev.filter(
        F.col("props").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "event_id", F.coalesce(F.col("props"), F.lit("{}")).alias("props_safe")
    )


@query(
    "filter_rlike",
    oracle=r"""
    SELECT doc_id, lang FROM documents
    WHERE regexp_matches(text, '^the\s')
    """,
)
def filter_rlike(spark, sf_dir):
    """F6: regex validity gate (FILTER_VALIDATE_EMAIL,
    /root/reference/sdk/migrate_assure_users.php:195)."""
    return (
        _cat(spark, sf_dir)
        .documents.filter(F.col("text").rlike(r"^the\s"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# §2.4 joins
# ---------------------------------------------------------------------------


@query(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner(spark, sf_dir):
    """J1: inner equi-join (/root/reference/sdk/migrate_conjoint.php:76-84).
    Catalyst picks broadcast vs sort-merge; customer is small enough to
    broadcast at test SFs, and AQE converts at runtime on a cluster."""
    cat = _cat(spark, sf_dir)
    return (
        cat.orders.join(cat.customer, cat.orders.o_custkey == cat.customer.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@query(
    "join_lookup",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_name, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def join_lookup(spark, sf_dir):
    """J2: the reference's per-row LIMIT-1 probe
    (/root/reference/sdk/migrate_assures.php:19-36) as ONE broadcast
    hash join — O(N) network round trips become a map-side lookup."""
    cat = _cat(spark, sf_dir)
    probe = lookup_join(
        cat.lineitem.withColumnRenamed("l_partkey", "p_partkey"),
        cat.part.select("p_partkey", "p_name", "p_brand"),
        on="p_partkey",
    )
    return probe.select("l_orderkey", "l_linenumber", "p_name", "p_brand")


@query(
    "join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COALESCE(o.o_orderkey, -1) AS order_key,
           CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END AS no_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_left(spark, sf_dir):
    """J3: left-outer with miss-path kept
    (/root/reference/sdk/migrate_assure_users.php:217-231)."""
    cat = _cat(spark, sf_dir)
    j = cat.customer.join(
        cat.orders, cat.customer.c_custkey == cat.orders.o_custkey, "left"
    )
    return j.select(
        "c_custkey",
        "c_name",
        F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("order_key"),
        F.when(F.col("o_orderkey").isNull(), 1).otherwise(0).alias("no_orders"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark, sf_dir):
    """J4: existence probe as left-semi join
    (registrant_exists, /root/reference/sdk/migrate_employeur.php:27-40)."""
    cat = _cat(spark, sf_dir)
    return semi_join(
        cat.customer.select("c_custkey", "c_name"),
        cat.orders.select(F.col("o_custkey").alias("c_custkey")),
        on="c_custkey",
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
)
def join_anti(spark, sf_dir):
    """J5: dedup-against-destination as left-anti join
    (ETLTask unique-key probe, /root/reference/sdk/src/ETLTask.php:43-53).
    The 'destination' here is the set of customers holding a >300k
    order, so the anti side is non-trivial."""
    cat = _cat(spark, sf_dir)
    return anti_join(
        cat.customer.select("c_custkey", "c_name"),
        cat.orders.filter(F.col("o_totalprice") > 300000).select(
            F.col("o_custkey").alias("c_custkey")
        ),
        on="c_custkey",
    )


@query(
    "join_fanout",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, l.l_linenumber, l.l_quantity
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def join_fanout(spark, sf_dir):
    """J6: 1:N fan-out preserving child multiplicity
    (/root/reference/sdk/migrate_assures.php:90-96,217-227)."""
    cat = _cat(spark, sf_dir)
    return fanout_join(
        cat.orders.select("o_orderkey", "o_custkey"),
        cat.lineitem.select(
            F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity"
        ),
        on="o_orderkey",
    ).select("o_orderkey", "o_custkey", "l_linenumber", "l_quantity")


# ---------------------------------------------------------------------------
# §2.5 aggregation
# ---------------------------------------------------------------------------


@query("agg_count", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def agg_count(spark, sf_dir):
    """A1: COUNT(*) (/root/reference/sdk/process.php:5-19)."""
    return _cat(spark, sf_dir).lineitem.agg(F.count("*").alias("n_rows"))


@query(
    "agg_count_distinct",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS n_customers FROM orders",
)
def agg_count_distinct(spark, sf_dir):
    """A2: COUNT(DISTINCT) (/root/reference/sdk/migrate_employeur.php:29-31)."""
    return _cat(spark, sf_dir).orders.agg(
        F.countDistinct("o_custkey").alias("n_customers")
    )


@query("agg_approx_count_distinct")
def agg_approx_count_distinct(spark, sf_dir):
    """A2 at-scale variant: HyperLogLog sketch — the shuffle-light way
    to count 100 TB of distinct keys. Approximate → rows-only check."""
    return _cat(spark, sf_dir).events.agg(
        F.approx_count_distinct("user_id").alias("approx_users")
    )


@query(
    "dedup_first",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_first(spark, sf_dir):
    """A3: first-wins dedup under an explicit total order
    (/root/reference/sdk/src/ETLTask.php:34-53; PHP gets order from the
    cursor, a distributed engine must declare it)."""
    ev = _cat(spark, sf_dir).events
    return first_wins_dedup(
        ev, keys=["user_id"], order_by=["ts", "event_id"], normalize=False
    ).select("user_id", "event_id", "event_type", "value")


@query(
    "dedup_normalized",
    oracle="""
    SELECT source_key, doc_id FROM (
      SELECT CASE WHEN TRY_CAST(source AS DOUBLE) IS NOT NULL THEN source
                  ELSE TRIM(source) END AS source_key,
             doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY (CASE WHEN TRY_CAST(source AS DOUBLE) IS NOT NULL
                             THEN source ELSE TRIM(source) END)
               ORDER BY doc_id) AS rn
      FROM (SELECT doc_id, source || '  ' AS source FROM documents)
    ) WHERE rn = 1
    """,
)
def dedup_normalized(spark, sf_dir):
    """A3 normalization rule: trim strings before comparing, keep
    numerics raw (/root/reference/sdk/src/ETLTask.php:50-52). Input is
    padded to prove trailing whitespace doesn't split groups."""
    doc = _cat(spark, sf_dir).documents.select(
        "doc_id", F.concat(F.col("source"), F.lit("  ")).alias("source")
    )
    out = first_wins_dedup(doc, keys=["source"], order_by=["doc_id"], normalize=True)
    return out.select(dedup_key("source").alias("source_key"), "doc_id")


@query(
    "agg_groupby_sum",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS {MONEY})) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS {MONEY})) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS {MONEY})
               * (1 - CAST(l_discount AS {RATE}))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS {MONEY})
               * (1 - CAST(l_discount AS {RATE}))
               * (1 + CAST(l_tax AS {RATE}))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS {MONEY})) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS {MONEY})) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(l_discount AS {RATE})) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_sum(spark, sf_dir):
    """Flagship: TPC-H Q1-style pricing summary (capability extension —
    the reference has no SUM/GROUP BY, SURVEY.md §2.5). Exact decimal
    aggregation keeps results identical under any partitioning."""
    li = _cat(spark, sf_dir).lineitem
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", RATE))
    charge = disc_price * (F.lit(1) + dec("l_tax", RATE))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", RATE).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.7 limits
# ---------------------------------------------------------------------------


@query(
    "limit_n",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10",
)
def limit_n(spark, sf_dir):
    """L1: LIMIT probe — made deterministic with a total order
    (/root/reference/sdk/migrate_assures.php:24)."""
    return (
        _cat(spark, sf_dir)
        .orders.select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(10)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 10 OFFSET 25
    """,
)
def limit_offset(spark, sf_dir):
    """L2: row-range slice (get_range, /root/reference/sdk/lib/array.php:10-58)."""
    return (
        _cat(spark, sf_dir)
        .orders.select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(25)
        .limit(10)
    )
