"""Distributed-rank win demonstration (round-6 kernel measurement).

The two-phase rank kernels in ``functions/prefix.py`` are
window-equality-tested and oracle-checked through their consumers
(``gini_ranked_revenue``, ``token_zipf_fit``), but at test/driver scale a
single-partition global window is fast enough that the kernels never get
to *win*. This script builds a Zipf-shaped vocabulary fixture (the
tie-heavy shape ``global_row_number_tied`` exists for: the hapax class at
freq=1 owns ~half the types) and times three ways to compute the exact
global ``row_number() OVER (ORDER BY freq DESC, tok)``:

- ``window``: the single-partition global window (the formulation
  ``token_zipf_fit`` used before round 6) — the serial baseline;
- ``bucketed``: plain equi-depth ``global_row_number`` on freq — ties
  can never split across buckets, so the hapax class collapses into ONE
  bucket and its window is serial again (the documented degeneration);
- ``tied``: ``global_row_number_tied`` — exact value classes sub-split
  on the 7-byte string-prefix surrogate, parallelism ~n/n_sub
  regardless of tie mass.

Every variant is asserted result-equal (full rank set) before timing;
the timing action is a noop-format write of the (tok, rk) projection.
Results print as a markdown block to paste into SCALING.md + one JSON
line.

Usage: python tools/rank_demo.py [n_types] (default 5_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from airflow_ml_pipeline_spark.functions.prefix import (  # noqa: E402
    global_row_number,
    global_row_number_tied,
)
from airflow_ml_pipeline_spark.session import get_spark  # noqa: E402

N_TYPES = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
N_SUB = 64


def build_vocab(spark):
    """A Zipf-ish type table: token = md5 surrogate (unique), freq drawn
    so ~50% of types are hapax (freq=1) and the rest decay heavy-tailed —
    deterministic, no RNG."""
    return (
        spark.range(N_TYPES)
        .select(
            F.concat(F.lit("tok_"), F.md5(F.col("id").cast("string"))).alias(
                "tok"
            ),
            # id-driven deterministic tie-heavy distribution:
            # 50% freq=1, 25% freq=2, 12.5% freq=3 ... (geometric classes)
            (
                F.floor(-F.log2((F.col("id") % 1_048_576 + 1) / 1_048_576.0))
                + 1
            )
            .cast("bigint")
            .alias("freq"),
        )
        .repartition(32)
        .localCheckpoint()  # freeze the fixture OUT of every timed plan
    )


def timed(label, df):
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    print(f"  {label}: {dt:.2f} s", flush=True)
    return dt


def main():
    spark = get_spark("rank_demo")
    spark.sparkContext.setLogLevel("ERROR")
    vocab = build_vocab(spark)
    n = vocab.count()
    hapax = vocab.filter(F.col("freq") == 1).count()
    print(f"fixture: {n} types, {hapax} hapax ({hapax / n:.0%})", flush=True)

    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    variants = {
        "window": vocab.select(
            "tok", F.row_number().over(w).cast("bigint").alias("rk")
        ),
        "bucketed": global_row_number(
            vocab, "freq", [F.asc("tok")], N_SUB, descending=True
        ).select("tok", "rk"),
        "tied": global_row_number_tied(
            vocab, "freq", "tok", N_SUB, descending=True
        ).select("tok", "rk"),
    }

    # result equality first (exceptAll both ways is exact on bigint ranks)
    base = variants["window"]
    for name in ("bucketed", "tied"):
        diff = (
            variants[name].exceptAll(base).count()
            + base.exceptAll(variants[name]).count()
        )
        assert diff == 0, f"{name} diverges from the global window: {diff}"
    print("all variants result-equal", flush=True)

    times = {label: timed(label, df) for label, df in variants.items()}

    md = [
        f"| global rank over {n:,} types ({hapax / n:.0%} hapax) | "
        f"window {times['window']:.2f} s | bucketed {times['bucketed']:.2f} s | "
        f"tied {times['tied']:.2f} s |"
    ]
    print("\n".join(md))
    print(
        json.dumps(
            {"n_types": n, "hapax_share": round(hapax / n, 3), **times}
        )
    )


if __name__ == "__main__":
    main()
