"""Column-dtype parity between every Spark query schema and its DuckDB oracle.

The driver's correctness harness canonicalizes both result sets through
pandas before hashing, so a *type-class* mismatch fails the hash even when
every value matches: DuckDB's bare ``SUM(<integer>)`` yields HUGEINT, which
pandas serializes as float64, against Spark's BIGINT → ``"1.0" != "1"``.
This artifact cost a red row in round 1 (``returnflag_priority_counts``) and
round 2 (``user_eventtype_map_stats``); this test kills the class (round-2
verdict item #3): every declared oracle is planned in DuckDB at sf0.001 and
its column type classes are asserted against the Spark result schema.

DuckDB types come from the relation plan (no execution); Spark schemas come
from the lazy DataFrame — so the test is analysis-only except for queries
whose builders eagerly materialize (checkpointed pipelines), all sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from airflow_ml_pipeline_spark.schemas import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"

#: Spark simpleString → type class.
_SPARK_CLASS = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
}


def _spark_class(simple: str) -> str:
    if simple.startswith("decimal"):
        return "decimal"
    if simple.startswith(("array", "map", "struct")):
        return "nested"
    return _SPARK_CLASS.get(simple, simple)


#: DuckDB logical type id → type class. HUGEINT gets its own class on
#: purpose: pandas serializes it as float64, so it is hash-incompatible
#: with every Spark integral type — oracles must CAST(... AS BIGINT).
_DUCK_CLASS = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "HUGEINT": "hugeint",
    "UHUGEINT": "hugeint",
    "FLOAT": "float",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts",
    "TIMESTAMP_NS": "ts",
}


def _duck_class(t) -> str:
    s = str(t)
    if s.startswith("DECIMAL"):
        return "decimal"
    if s.startswith(("STRUCT", "MAP")) or s.endswith("[]"):
        return "nested"
    return _DUCK_CLASS.get(s, s)


def _compatible(spark_cls: str, duck_cls: str) -> bool:
    if spark_cls == duck_cls:
        return True
    # decimal vs float serialize to the same numeric text for exact values;
    # the driver has hash-matched this pairing since round 1.
    return {spark_cls, duck_cls} == {"decimal", "float"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_every_oracle_dtype_matches_spark_schema(spark, duck):
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(queries)
    problems = []
    for name, sql in sorted(oracles.items()):
        try:
            sdf = queries[name](spark, SF_DIR)
        except Exception as exc:  # pragma: no cover - surface as a failure
            problems.append(f"{name}: spark build error {exc!r}")
            continue
        try:
            rel = duck.sql(sql)
        except Exception as exc:  # pragma: no cover
            problems.append(f"{name}: duckdb plan error {exc!r}")
            continue
        spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        duck_types = dict(zip(rel.columns, rel.types))
        if sorted(spark_types) != sorted(duck_types):
            problems.append(
                f"{name}: column names spark={sorted(spark_types)} "
                f"duck={sorted(duck_types)}"
            )
            continue
        for col, simple in spark_types.items():
            s_cls, d_cls = _spark_class(simple), _duck_class(duck_types[col])
            if not _compatible(s_cls, d_cls):
                hint = (
                    " (CAST the oracle aggregate AS BIGINT)"
                    if d_cls == "hugeint"
                    else ""
                )
                problems.append(
                    f"{name}.{col}: spark {simple} ({s_cls}) vs "
                    f"duck {duck_types[col]} ({d_cls}){hint}"
                )
    assert not problems, "\n".join(problems)
