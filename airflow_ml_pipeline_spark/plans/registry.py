"""Declared-query registry: the engine's public query surface.

Every operator the engine claims (SURVEY.md §2) registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with an ANSI-SQL
oracle string that DuckDB runs over the same parquet tables. The driver
harness (/root/repo/__spark_entry__.py) exposes this registry verbatim.

Contract rules enforced by convention here:
- every computed column is aliased identically in the Spark plan and the SQL;
- float aggregates are rounded on BOTH sides (sum-order nondeterminism);
- timestamps are emitted as formatted strings (engine-neutral);
- integer sums are cast to BIGINT in SQL (DuckDB widens to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Oracles whose equality holds deterministically on the COMMITTED test
#: corpora but is not guaranteed for arbitrary regenerated data (ADVICE
#: r10: document the demotion procedure in the registry, not only the
#: docstring). Each entry names the fragility and the exact demotion
#: step. Corpus regeneration is gated by
#: tests/test_corpus_fingerprints.py, which fails with this reason
#: BEFORE a red driver row can appear mysterious.
FRAGILE_ORACLES: dict[str, str] = {
    "near_dup_pairs_minhash": (
        "oracle asserts LSH-discovered == exhaustive pair kernel; the "
        "16-band/2-row scheme's per-pair recall at the J=0.5 boundary "
        "is ~0.99, so a REGENERATED corpus may legitimately miss a "
        "boundary pair with no code bug. Demotion procedure: if "
        "tests/test_corpus_fingerprints.py reports a corpus change, "
        "re-run tests/test_dedup.py's recall-equality pin on the new "
        "corpora; if a boundary pair is missed, change this query's "
        "@query(oracle=...) to oracle=None (rows-only) and move the "
        "equality evidence to the engine-side pytest pin."
    ),
}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` → rows-only driver check
    (reserved for genuinely non-SQL-expressible operators)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
