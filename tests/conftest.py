"""Shared fixtures: one local SparkSession per test session (SURVEY.md §5.2).

Mirrors the reference's conftest strategy (tmp-path'd mini config, small
deterministic fixtures — /root/reference/tests/conftest.py:8-89) adapted to
Spark: session-scoped builder, small shuffle-partition count for local speed.
"""

from __future__ import annotations

import pytest

from airflow_ml_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "engine-tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "8", "spark.ui.enabled": "false"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
