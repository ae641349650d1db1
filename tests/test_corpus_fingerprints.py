"""Corpus-fingerprint gate for fragile oracles (ADVICE r10).

``near_dup_pairs_minhash``'s oracle asserts exact equality between the
LSH-discovered pair set and the exhaustive pair kernel. That equality is
deterministic on the COMMITTED corpora (recall measured complete at all
three SFs) but is not a mathematical guarantee for arbitrary data: at
the J=0.5 boundary the 16-band/2-row scheme's per-pair recall is ~0.99,
so a silently regenerated corpus could turn the driver row red with no
code bug. This gate pins the committed corpora's content fingerprints so
a regeneration fails HERE, with the named reason and the demotion
procedure (``registry.FRAGILE_ORACLES``), before the driver sweep runs.

The digest is pure-Python (sorted (doc_id, text) -> md5), independent of
parquet encoding details, so a byte-level rewrite of the same logical
corpus does NOT fire the gate.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow.parquet as pq
import pytest

from airflow_ml_pipeline_spark.plans.registry import FRAGILE_ORACLES

#: committed corpus fingerprints (round 11); recompute + update via the
#: snippet in this file's git log if the driver legitimately regenerates
#: testdata, then follow the FRAGILE_ORACLES demotion procedure.
EXPECTED = {
    "0.001": (500, "b0a7585ae46c4bdfb15e7eb7d8897f3d"),
    "0.01": (500, "f72c220f1c502057e4574bcc2b010b69"),
    "0.1": (5000, "17349f1c5f6cf4f6dee56b4d27348bcf"),
}


def _fingerprint(path: str) -> tuple[int, str]:
    t = pq.read_table(path, columns=["doc_id", "text"])
    rows = sorted(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    h = hashlib.md5()
    for doc_id, text in rows:
        h.update(str(doc_id).encode())
        h.update(b"\x00")
        h.update(text.encode())
        h.update(b"\x01")
    return len(rows), h.hexdigest()


@pytest.mark.parametrize("sf", sorted(EXPECTED))
def test_documents_corpus_unchanged(sf: str) -> None:
    path = f"/root/testdata/sf{sf}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent in this environment")
    got = _fingerprint(path)
    assert got == EXPECTED[sf], (
        f"documents corpus at sf{sf} differs from the committed "
        f"fingerprint ({got} != {EXPECTED[sf]}). A regenerated corpus "
        f"can invalidate fragile oracles — follow the demotion "
        f"procedure: {FRAGILE_ORACLES['near_dup_pairs_minhash']}"
    )


def test_fragile_oracle_registry_names_exist() -> None:
    from airflow_ml_pipeline_spark.plans import registry
    import __spark_entry__  # noqa: F401  (imports populate the registry)

    for name in FRAGILE_ORACLES:
        assert name in registry.QUERIES, name
