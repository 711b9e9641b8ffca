"""Global top-k with a dense 1..k rank, the ordering stated ONCE.

Plan shape: an EXPLICIT ``orderBy().limit(k)`` compiles to
``TakeOrderedAndProject`` — a k-row heap per partition merged on one
small final task — and the ``row_number`` window that follows covers
<= k rows by construction, so the "No Partition Defined" window is
bounded regardless of corpus size. The rank-filter window form compiles
to the same operator today (``LimitPushDownThroughWindow``), but only
while its preconditions hold; here the bound is stated in the code and
the TakeOrderedAndProject plan gates in ``tools/audit_plans.py`` pin the
operator, so an edit that breaks the pushdown fails the audit instead of
silently single-partitioning every row.

The ordering must carry a total tiebreak (a unique trailing key): the
heap cut and the rank assignment reuse the SAME column list, and a
non-total order would make the surviving k rows nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def global_topk(
    df: DataFrame, k: int, order_cols: list[Column | str], rank_col: str
) -> DataFrame:
    """Top-``k`` rows of ``df`` under ``order_cols`` plus a 1..k
    ``rank_col``; the same ordering drives both the heap cut and the
    rank so the two can never disagree."""
    top = df.orderBy(*order_cols).limit(k)
    return top.withColumn(
        rank_col, F.row_number().over(W.partitionBy().orderBy(*order_cols))
    )
