"""Retrain the learned quality model and print the frozen-artifact block
for ``operators/quality_model.py`` (QUALITY_INTERCEPT / QUALITY_COEFS).

The frozen model is the trainer's own output on the sf0.01 corpus,
quantized to 6 dp — the release step a production curation pipeline runs
when it ships a new fastText/ONNX quality filter. Run after changing the
featurization, the label heuristic, or the corpus family:

    python tools/freeze_quality_model.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from airflow_ml_pipeline_spark.operators.quality_model import (
        train_quality_model,
    )
    from airflow_ml_pipeline_spark.session import get_spark

    spark = get_spark("freeze_quality_model", master="local[8]")
    intercept, coefs, _ = train_quality_model(spark, sf_dir)
    print(f'QUALITY_INTERCEPT = "{intercept:.6f}"')
    print("QUALITY_COEFS: list[str] = [")
    for i in range(0, len(coefs), 4):
        row = ", ".join(f'"{c:.6f}"' for c in coefs[i : i + 4])
        print(f"    {row},")
    print("]")


if __name__ == "__main__":
    main()
