"""D5 over REAL HTTP: routes, status codes and response shapes of the Flask
serving app, matched to the reference (deployment.py:113-178), driven
through a live loopback socket — not a werkzeug test client."""

from __future__ import annotations

import pytest

from airflow_ml_pipeline_spark.operators.serving_harness import (
    SAMPLE_ROW,
    train_and_serve,
)


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    handle = train_and_serve(
        spark, str(tmp_path_factory.mktemp("serving")), n_samples=300
    )
    yield handle
    handle.shutdown()


def test_health_route(served):
    status, body = served.get("/health")
    assert status == 200
    assert body == {"status": "healthy", "model": "logistic_regression"}


def test_predict_single_row(served):
    status, body = served.post("/predict", SAMPLE_ROW)
    assert status == 200
    assert set(body) == {"predictions", "probabilities"}
    assert len(body["predictions"]) == 1
    assert body["predictions"][0] in (0, 1)
    assert 0.0 <= body["probabilities"][0] <= 1.0


def test_predict_batch(served):
    batch = [dict(SAMPLE_ROW, tenure=t) for t in range(1, 11)]
    status, body = served.post("/predict", batch)
    assert status == 200
    assert len(body["predictions"]) == 10
    assert len(body["probabilities"]) == 10


def test_predict_empty_body_is_400(served):
    status, body = served.post("/predict", None)
    assert status == 400
    assert "error" in body


def test_predict_malformed_row_is_500(served):
    status, body = served.post("/predict", {"tenure": "not-a-number"})
    assert status == 500
    assert "error" in body


def test_fast_path_matches_spark_batch_path(spark, served):
    """The driver-side fast scorer (engineered_row + transform_row +
    single-instance predictProbability) must reproduce the Spark
    transform-path probabilities on the same rows — this is the parity
    gate that makes the ~1 ms serving path trustworthy."""
    from airflow_ml_pipeline_spark.operators import deployment, generate
    from airflow_ml_pipeline_spark.operators.serving_harness import serving_config

    customers = generate.generate_synthetic_data(
        spark, n_samples=40, random_state=7
    ).drop("churn")
    rows = [r.asDict() for r in customers.collect()]

    status, body = served.post("/predict", rows)
    assert status == 200

    cfg = serving_config("/tmp/unused")
    cfg["deployment"]["champion_model_path"] = served.champion_path
    model, prep, _ = deployment.load_champion(spark, cfg)
    scored = deployment.predict_proba(model, prep, customers)
    spark_rows = scored.select("prediction", "probability_1").collect()

    assert body["predictions"] == [int(r.prediction) for r in spark_rows]
    for fast_p, spark_r in zip(body["probabilities"], spark_rows):
        assert abs(fast_p - float(spark_r.probability_1)) < 1e-9


def test_fast_path_edge_rows_match_spark(spark, served):
    """Edge inputs the random-row parity test cannot hit: the tenure=0
    division guards, every tenure-bucket boundary (pd.cut right-closed
    intervals), and an unknown category (sklearn handle_unknown='ignore'
    -> all-zero dummies)."""
    from airflow_ml_pipeline_spark.operators import deployment
    from airflow_ml_pipeline_spark.operators.serving_harness import serving_config
    from airflow_ml_pipeline_spark.schemas import CUSTOMERS_INPUT

    edge_rows = [
        dict(SAMPLE_ROW, tenure=0),  # charge_per_tenure/support_intensity guards
        *[dict(SAMPLE_ROW, tenure=t) for t in (6, 7, 12, 24, 48, 72)],
        dict(SAMPLE_ROW, contract_type="never-seen-contract"),  # unknown cat
        dict(SAMPLE_ROW, num_support_tickets=0, total_charges=0.0),
    ]
    status, body = served.post("/predict", edge_rows)
    assert status == 200

    cfg = serving_config("/tmp/unused")
    cfg["deployment"]["champion_model_path"] = served.champion_path
    model, prep, _ = deployment.load_champion(spark, cfg)
    scored = deployment.predict_proba(
        model, prep, spark.createDataFrame(edge_rows, schema=CUSTOMERS_INPUT)
    )
    spark_rows = scored.select("prediction", "probability_1").collect()
    assert body["predictions"] == [int(r.prediction) for r in spark_rows]
    for fast_p, spark_r in zip(body["probabilities"], spark_rows):
        assert abs(fast_p - float(spark_r.probability_1)) < 1e-9


def test_model_info_route(served):
    status, body = served.get("/model/info")
    assert status == 200
    assert body["model_name"] == "logistic_regression"
    assert body["metrics"] == {"f1": 0.5, "roc_auc": 0.5}
