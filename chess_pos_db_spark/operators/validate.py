"""Data-quality validation (the Deequ/expectations pattern): declared
rules → one row per rule with its violation count, computed in as few
passes as the rules allow. The ingest-gate stage of a production
pipeline — run after every append, alert on nonzero counts (the
quarantine path in sources/formats.py catches rows that don't PARSE;
this catches rows that parse but are WRONG).

Scale shape: per-table rules fuse into ONE scan each (all are
conditional-count aggregates over the same pass — map-side combined to
a single row per table); the referential-integrity rule is the only
join, a LEFT ANTI on the orders key that AQE broadcasts when the dim
side is small and shuffles otherwise. Nothing here is per-rule passes:
K rules over a 100 TB table still cost one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import t

_EVENT_TYPES = ("signup", "view", "click", "purchase", "error")
_TYPES_SQL = ", ".join(f"'{t_}'" for t_ in _EVENT_TYPES)


@register(
    "quality_expectations",
    oracle=f"""
SELECT rule, violations FROM (
    SELECT 'lineitem_quantity_range' AS rule,
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_price_positive',
           CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders_key_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_totalprice_not_null',
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_orders_referential',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'events_type_in_domain',
           -- NULL is out of domain (NOT IN is NULL for NULL input)
           CAST(SUM(CASE WHEN event_type IS NULL
                              OR event_type NOT IN ({_TYPES_SQL})
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
)
""",
)
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    e = t(spark, sf_dir, "events")

    def viol(cond) -> "F.Column":
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    li_rules = li.agg(
        viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
            "lineitem_quantity_range"
        ),
        viol(F.col("l_extendedprice") <= 0).alias("lineitem_price_positive"),
    )
    o_rules = o.agg(
        (F.count("*") - F.count_distinct("o_orderkey"))
        .cast("long")
        .alias("orders_key_unique"),
        viol(F.col("o_totalprice").isNull()).alias("orders_totalprice_not_null"),
    )
    ref = (
        li.join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count("*").alias("lineitem_orders_referential"))
    )
    e_rules = e.agg(
        # NULL is OUT of domain: ~isin(...) is NULL for NULL input and
        # the when/otherwise would silently count it as in-domain —
        # exactly the rows an ingest gate exists to catch
        viol(
            F.col("event_type").isNull()
            | ~F.col("event_type").isin(*_EVENT_TYPES)
        ).alias("events_type_in_domain")
    )
    # one-row aggregates → unpivot to (rule, violations); the cross join
    # of four single-row frames is a no-op at any scale
    wide = (
        li_rules.crossJoin(o_rules).crossJoin(ref).crossJoin(e_rules)
    )
    rules = [
        "lineitem_quantity_range",
        "lineitem_price_positive",
        "orders_key_unique",
        "orders_totalprice_not_null",
        "lineitem_orders_referential",
        "events_type_in_domain",
    ]
    return wide.unpivot([], rules, "rule", "violations")
