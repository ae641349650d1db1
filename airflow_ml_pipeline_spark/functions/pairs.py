"""In-partition pair explosion over a sorted id list — the posting-list
kernel shared by the Jaccard pair counter, FastSS fuzzy matching, and
market-basket mining: given a SORTED array column, emit every (a, b)
combination with a < b as structs, without a self-join (the list is
already grouped, so pairs never cross partitions and the fan-out is
bounded by the list length choose 2, not the table size).

Extracted because the nested transform/slice index arithmetic
(``i + 2`` / ``size - i - 1``) is easy to get subtly wrong and was
previously copy-pasted at three call sites (review finding).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sorted_pairs(ids: Column, a_name: str = "a", b_name: str = "b") -> Column:
    """Array of ``struct<a_name, b_name>`` for every ordered pair drawn
    from the SORTED array ``ids`` (a before b). Explode the result to get
    one row per pair."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
            ),
        )
    )
