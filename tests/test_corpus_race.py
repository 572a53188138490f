"""End-to-end composed-pipeline parity: clean_corpus (all 11 stages) vs
the independent DuckDB+Python reference in scripts/stress_corpus.py.

Per-stage operators each have their own oracle; this is the only check
where every stage consumes the PREVIOUS stage's rewritten text, so a
single byte drifting anywhere cascades into a fingerprint mismatch."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)


def test_composed_pipeline_matches_reference(spark):
    from stress_corpus import run

    result = run(1200, spark=spark)
    assert result["fingerprint_match"], result
    assert result["survivors"]["spark"] == result["survivors"]["reference"]
    # the gates must actually bite AND leave a corpus: a truly composed
    # run, not a pass-through (survivor share between 10% and 90%)
    assert 120 < result["survivors"]["spark"] < 1080
