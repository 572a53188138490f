"""bench.py's round-over-round delta line (r9 verdict #2): every bench run
must put the primary/secondary deltas vs the newest BENCH_r{N}.json on the
record, adjudicated against the measured spreads — favorable or not."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_bench_delta_line_within_noise(capsys):
    """A tiny move swallowed by the spread envelope → within-noise.
    Discovers the newest BENCH_r{N}.json the same way the function does,
    so the pin survives future rounds' artifacts."""
    import glob
    import re

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    newest = max(
        glob.glob(os.path.join(repo, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r0*(\d+)\.json$", p).group(1)),
    )
    prev = (bench.json.load(open(newest)).get("parsed") or {}).get("value")
    result = {"value": (prev or 20.0) + 0.1}
    spreads = {"q1": 0.4, "q2": 0.3}  # envelope = 2*(0.7) = 1.4 > 0.1
    bench._report_delta_vs_prior(result, spreads, None)
    err = capsys.readouterr().err
    assert "# delta vs BENCH_r" in err
    if isinstance(prev, (int, float)) and prev > 0:
        assert "within-noise" in err
        assert f"{prev}->" in err
    else:  # a failed prior round's artifact: the line must still appear
        assert "unparsable" in err


def test_bench_delta_excludes_current_round_artifact(capsys, monkeypatch):
    """r10 ADVICE: a re-run after the harness saved this round's
    BENCH_r{N}.json must NOT compare the round to itself.  With
    SPARK_GRAFT_ROUND=10 the newest eligible prior is r9, even though
    BENCH_r10.json exists on disk."""
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "10")
    bench._report_delta_vs_prior({"value": 20.0}, {"q1": 0.1}, None)
    err = capsys.readouterr().err
    assert "# delta vs BENCH_r9:" in err


def test_bench_delta_infers_round_from_verdict(capsys):
    """With no env override the current round is VERDICT.md's round + 1,
    so the newest prior never exceeds the verdict round."""
    import re

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    m = re.search(r"VERDICT\s*[—-]+\s*round\s+(\d+)",
                  open(os.path.join(repo, "VERDICT.md")).read(200))
    if m is None:
        import pytest

        pytest.skip("no VERDICT.md round header")
    bench._report_delta_vs_prior({"value": 20.0}, {"q1": 0.1}, None)
    err = capsys.readouterr().err
    got = re.search(r"# delta vs BENCH_r(\d+):", err)
    assert got and int(got.group(1)) <= int(m.group(1))


def test_bench_delta_line_exceeds_spread_and_secondary(capsys):
    """A move past the envelope → exceeds-spread; the secondary point's
    delta rides the same line when both rounds have one."""
    result = {"value": 400.0}
    spreads = {"q1": 0.05}
    bench._report_delta_vs_prior(result, spreads, {"value": 40.0})
    err = capsys.readouterr().err
    assert "exceeds-spread" in err
    assert "secondary" in err


def test_bench_delta_like_for_like_on_set_change(capsys, monkeypatch, tmp_path):
    """When the headline set changes between rounds, the raw-total delta is
    not comparable — the line must ALSO adjudicate the intersection (r11:
    q41+q60 joined the set and a -21% like-for-like move printed as +1.3%)."""
    import json

    prior = {"parsed": {"value": 10.0, "queries": {"qa": 6.0, "qb": 4.0}}}
    (tmp_path / "BENCH_r7.json").write_text(json.dumps(prior))
    monkeypatch.setattr(bench.os.path, "dirname", lambda _p: str(tmp_path))
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "8")
    result = {"value": 12.0, "queries": {"qa": 5.0, "qb": 3.0, "qc": 4.0}}
    bench._report_delta_vs_prior(result, {"qa": 0.2, "qb": 0.2, "qc": 0.2}, None)
    err = capsys.readouterr().err
    assert "like-for-like over 2 shared queries" in err
    assert "10.00->8.00s" in err and "-20.0%" in err
    assert "exceeds-spread" in err       # |8-10| = 2 > 2*(0.2+0.2)
    assert "added ['qc']" in err and "removed []" in err
