"""UDF surface (SURVEY §2 C-X): vectorized scalar pandas UDF, grouped-map
UDAF (`applyInPandas`), and a lateral-join Python UDTF.

The reference has no UDF facility of any kind (643 LoC, storage only); this
is the declared extension surface. All three forms are Arrow-batched — no
row-at-a-time Python anywhere:

- scalar `pandas_udf`: whole-column NumPy arithmetic per Arrow batch;
- `applyInPandas`: one pandas frame per group per task, state never leaves
  the executor, output is a per-group reduction (constant rows/group);
- UDTF: row→rows expansion evaluated per-partition, composed via LATERAL.

Determinism for the oracle: scalar arithmetic is per-row IEEE double (same
result in any order); the grouped UDAF emits only order-independent measures
(count, min, max, and an exact integer-valued sum).
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from rtcdb_spark.queries.base import query
from rtcdb_spark.sources import load_table


@pandas_udf(DoubleType())
def _charge(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    # Vectorized per-row double math — IEEE-identical to the SQL expression.
    return price * (1.0 - discount) * (1.0 + tax)


@query(
    "udf_pandas_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF computing the line charge, row-exact vs the SQL
    expression. (In production this slot is for logic Spark can't express —
    plain arithmetic like this belongs in built-ins; here it pins the Arrow
    path's numeric fidelity.)"""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            _charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def _flag_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    # One group per (returnflag, linestatus): order-independent measures only.
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "l_linestatus": [pdf["l_linestatus"].iloc[0]],
            "n_lines": [int(len(pdf))],
            "min_price": [float(pdf["l_extendedprice"].min())],
            "max_price": [float(pdf["l_extendedprice"].max())],
            "sum_qty": [float(pdf["l_quantity"].sum())],  # integer-valued → exact
        }
    )


@query(
    "udf_grouped_agg",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_lines,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           SUM(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("udf", "udaf", "pandas"),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via `applyInPandas`: per-group pandas reduction shuffled on
    the grouping key. Scale note: each group must fit in one task's memory —
    fine for low-cardinality keys; high-cardinality custom aggs should use
    partial-aggregate built-ins instead."""
    l = load_table(spark, sf_dir, "lineitem")
    out_schema = (
        "l_returnflag string, l_linestatus string, n_lines long, "
        "min_price double, max_price double, sum_qty double"
    )
    return (
        l.select(
            "l_returnflag", "l_linestatus", "l_extendedprice", "l_quantity"
        )
        .groupBy("l_returnflag", "l_linestatus")
        .applyInPandas(_flag_stats, out_schema)
        .orderBy("l_returnflag", "l_linestatus")
    )


@udtf(returnType="pos int, token string")
class _TokenizeWs:
    """Whitespace tokenizer UDTF: one input string → (position, token) rows.
    Split on single spaces, matching DuckDB's string_split(text, ' ')."""

    def eval(self, text: str) -> Iterator[tuple[int, str]]:
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok


@query(
    "udf_udtf_tokenize",
    """
    SELECT doc_id,
           unnest(generate_series(1, len(toks))) - 1 AS pos,
           unnest(toks) AS token
    FROM (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE doc_id < 20
    )
    ORDER BY doc_id, pos
    """,
    tags=("udf", "udtf"),
)
def udf_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF applied via LATERAL join: tokenizes each document into
    (pos, token) rows. The expansion runs per-partition with no shuffle."""
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("documents_udtf_in")
    spark.udtf.register("tokenize_ws", _TokenizeWs)
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM documents_udtf_in d, LATERAL tokenize_ws(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )


def _minmax_norm(pdf: pd.DataFrame) -> pd.DataFrame:
    # Per-group min-max normalization. min/max are exact; the subtract+divide
    # are single IEEE double ops in the same order as the oracle SQL, so the
    # result is bit-identical cross-engine.
    vmin, vmax = pdf["value"].min(), pdf["value"].max()
    rng = vmax - vmin
    out = pdf[["event_id", "event_type"]].copy()
    out["value_norm"] = 0.0 if rng == 0.0 else (pdf["value"] - vmin) / rng
    return out


@query(
    "udf_grouped_map",
    """
    SELECT event_id, event_type,
           CASE WHEN mx = mn THEN 0.0 ELSE (value - mn) / (mx - mn) END AS value_norm
    FROM (
        SELECT event_id, event_type, value,
               MIN(value) OVER (PARTITION BY event_type) AS mn,
               MAX(value) OVER (PARTITION BY event_type) AS mx
        FROM events WHERE value IS NOT NULL
    )
    ORDER BY event_id
    """,
    tags=("udf", "grouped-map"),
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map `applyInPandas`: per-event-type min-max normalization —
    a row-preserving per-group transform (vs `udf_grouped_agg`'s per-group
    reduction). Each group arrives as one pandas frame on one executor; at
    scale the group key (event_type) must be low-skew or pre-salted since
    one group = one task's memory. The oracle is the window-function
    formulation of the same math."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (
        e.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(
            _minmax_norm, "event_id long, event_type string, value_norm double"
        )
        .orderBy("event_id")
    )


def _cogroup_user_balance(
    events_pdf: "pd.DataFrame", orders_pdf: "pd.DataFrame"
) -> "pd.DataFrame":
    """Per-user co-grouped merge: event count and order count + decimal-cent
    order total for one user's two frames (either may be empty)."""
    if len(events_pdf):
        user = int(events_pdf["user_id"].iloc[0])
    else:
        user = int(orders_pdf["o_custkey"].iloc[0])
    cents = int(
        sum(
            int(Decimal(float(v)).quantize(Decimal("0.01"), ROUND_HALF_UP).scaleb(2))
            for v in orders_pdf["o_totalprice"]
        )
    )
    return pd.DataFrame(
        {
            "user_id": [user],
            "n_events": [len(events_pdf)],
            "n_orders": [len(orders_pdf)],
            "order_total": [cents / 100.0],
        }
    )


@query(
    "udf_cogrouped_map",
    f"""
    WITH ev AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
    oc AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               {{dsum_sql}} AS order_total
        FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(ev.user_id, oc.o_custkey) AS user_id,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(order_total, 0.0) AS order_total
    FROM ev FULL OUTER JOIN oc ON ev.user_id = oc.o_custkey
    ORDER BY user_id
    """.format(dsum_sql="CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"),
    tags=("udf", "cogrouped-map"),
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped map (`groupBy().cogroup().applyInPandas`) — the C-X API
    for aligning TWO relations per key in one Python callback: each user's
    events frame and orders frame arrive together, merged here into a
    per-user activity/balance row (integer-cent fold keeps the order total
    value-exact against the decimal-sum oracle). This is the pandas-side
    twin of a full-outer join + two aggregates — use it when the per-key
    merge logic is genuinely imperative (sessionized attribution, custom
    ledgers); both groups must fit one task's memory, so keys must be
    user-grained, never global."""
    e = load_table(spark, sf_dir, "events").select("user_id")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    out = (
        e.groupBy("user_id")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(
            _cogroup_user_balance,
            "user_id long, n_events long, n_orders long, order_total double",
        )
    )
    return out.orderBy("user_id")
