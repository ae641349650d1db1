"""Serving latency bench (round-3 verdict item 6): p50/p95 for POST
/predict over real HTTP, 1-row and 100-row batch, against the Flask app
serving the promoted champion.

The reference's only serving topology promise is single-model low-latency
REST (reference deployment.py:113-178). Numbers here measure the whole
request path over a real loopback socket. /predict scores DRIVER-SIDE
(deployment._fast_scorer: Python feature twin + the pyspark.ml
single-instance predict/predictProbability API — no Spark job per
request); parity with the Spark transform path is test-asserted
(tests/test_serving_http.py). Before the fast path the same measurement
was p50 ~515 ms/request flat (each request paid a Spark job launch).

Usage: python tools/serve_bench.py [n_requests] (default 40)
Prints one JSON line; paste the markdown block into SCALING.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_ml_pipeline_spark.operators.serving_harness import (  # noqa: E402
    SAMPLE_ROW,
    train_and_serve,
)
from airflow_ml_pipeline_spark.session import get_spark  # noqa: E402

N_REQ = int(sys.argv[1]) if len(sys.argv) > 1 else 40


def pctl(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))]


def measure(handle, payload, n):
    # warm the route (first request pays plan codegen + Python worker spin-up)
    for _ in range(3):
        status, _ = handle.post("/predict", payload)
        assert status == 200
    lat = []
    for _ in range(n):
        t0 = time.time()
        status, body = handle.post("/predict", payload)
        lat.append((time.time() - t0) * 1000)
        assert status == 200 and body["predictions"]
    return {
        "p50_ms": round(statistics.median(lat), 1),
        "p95_ms": round(pctl(lat, 95), 1),
        "mean_ms": round(statistics.mean(lat), 1),
    }


def main():
    spark = get_spark("serve-bench", master="local[8]")
    with tempfile.TemporaryDirectory() as tmp:
        handle = train_and_serve(spark, tmp, n_samples=300)
        single = measure(handle, SAMPLE_ROW, N_REQ)
        batch = [dict(SAMPLE_ROW, tenure=1 + i % 72) for i in range(100)]
        batch100 = measure(handle, batch, N_REQ)
        handle.shutdown()
    out = {
        "metric": "serving_predict_latency",
        "n_requests": N_REQ,
        "single_row": single,
        "batch_100": batch100,
        "per_row_batch_ms": round(batch100["p50_ms"] / 100, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
