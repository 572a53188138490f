"""Property-based tests (SURVEY §5.2) — hypothesis generates the cases,
one vectorized Spark job checks them all (per-example Spark jobs would be
prohibitively slow)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from tegallega_spark.functions.timecodec import (
    gtfs_time_to_seconds,
    seconds_to_hhmmss,
)
from tegallega_spark.operators.stateful import (
    MIN_SPACING_M,
    _stitch_group,
    _thin_group,
)

import pandas as pd


# ---------------------------------------------------------------------------
# Pure-pandas properties of the stateful folds (exercised distributed in
# test_operators/test_extract; here hypothesis explores the input space)
# ---------------------------------------------------------------------------

@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.floats(min_value=-1, max_value=1, allow_nan=False),
                st.floats(min_value=-1, max_value=1, allow_nan=False),
            ),
            min_size=2,
            max_size=6,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_stitch_preserves_vertex_budget(ways):
    """Output length == total vertices − (n_ways − 1): exactly one joint
    vertex dropped per non-first way, connected or not (js:132-134)."""
    rows = []
    for wo, way in enumerate(ways):
        for vi, (lon, lat) in enumerate(way):
            rows.append(("r", wo, vi, lon, lat))
    pdf = pd.DataFrame(rows, columns=["relation_id", "way_order", "vertex_idx", "lon", "lat"])
    out = _stitch_group(pdf)
    total = sum(len(w) for w in ways)
    assert len(out) == total - (len(ways) - 1)
    # first way's start is always preserved verbatim
    assert (out.iloc[0].lon, out.iloc[0].lat) == ways[0][0]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=0.05, allow_nan=False),  # lat ~5.5km span
            st.booleans(),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_thinning_invariant(points):
    """Every kept non-real stop is ≥ MIN_SPACING_M from the previously kept
    stop; real stops always survive."""
    rows = [
        ("r", f"s{i}", 0.0, lat, float(i), is_real)
        for i, (lat, is_real) in enumerate(points)
    ]
    pdf = pd.DataFrame(
        rows, columns=["relation_id", "stop_id", "lon", "lat", "frac_idx", "is_real"]
    )
    kept = _thin_group(pdf)
    real_in = {r[1] for r in rows if r[5]}
    assert real_in <= set(kept["stop_id"])
    def hav_m(lat1, lat2):
        r = 6371000.0
        return 2 * r * math.asin(abs(math.sin(math.radians(lat2 - lat1) / 2)))
    last = None
    for row in kept.itertuples(index=False):
        if last is not None and not row.is_real:
            assert hav_m(last, row.lat) >= MIN_SPACING_M - 1e-9
        last = row.lat


# ---------------------------------------------------------------------------
# Time-codec properties, vectorized through one Spark job
# ---------------------------------------------------------------------------

def test_time_codec_roundtrip_property(spark):
    import random

    rng = random.Random(42)
    secs = [rng.randrange(0, 48 * 3600) for _ in range(500)]
    df = spark.createDataFrame([(s,) for s in secs], "s long")
    out = df.select("s", seconds_to_hhmmss(F.col("s")).alias("hms")).withColumn(
        "back", gtfs_time_to_seconds(F.col("hms"))
    )
    rows = out.collect()
    for r in rows:
        # reference semantics: HH:MM:SS with unbounded hours, lossless
        assert r.back == r.s, (r.s, r.hms, r.back)
        h, m, sec = r.hms.split(":")
        assert int(m) < 60 and int(sec) < 60
        assert int(h) == r.s // 3600


# ---------------------------------------------------------------------------
# Round-5 operators: intra-doc paragraph dedup + mixture sampling
# ---------------------------------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab \t", min_size=0, max_size=8),
        min_size=0,
        max_size=10,
    )
)
def test_paragraph_dedup_idempotent_and_duplicate_free(paras):
    """Pure-python replay of dedupe_paragraphs' contract (trim, drop empty,
    keep-first distinct): idempotence and no-duplicates, over adversarial
    whitespace paragraphs.  The Spark expression is pinned against this
    exact contract in test_training_ops; hypothesis explores the space."""
    def model(text):
        seen, out = set(), []
        import re
        for p in re.split(r"\r?\n(?:[ \t]*\r?\n)+", text):
            p = re.sub(r"^\s+|\s+$", "", p)
            if p and p not in seen:
                seen.add(p)
                out.append(p)
        return "\n\n".join(out)

    text = "\n\n".join(paras)
    once = model(text)
    assert model(once) == once                      # idempotent
    kept = once.split("\n\n") if once else []
    assert len(kept) == len(set(kept))              # duplicate-free
    # keep-first order: kept is a subsequence of the trimmed input
    trimmed = [p.strip() for p in paras if p.strip()]
    it = iter(trimmed)
    assert all(any(p == q for q in it) for p in kept)


def test_paragraph_dedup_spark_matches_python_model(spark):
    """The Spark expression agrees with the python model on one vectorized
    batch of adversarial cases."""
    import re

    from tegallega_spark.operators.textual import dedupe_paragraphs

    def model(text):
        if text is None:
            return None
        seen, out = set(), []
        for p in re.split(r"\r?\n(?:[ \t]*\r?\n)+", text):
            p = re.sub(r"^\s+|\s+$", "", p)
            if p and p not in seen:
                seen.add(p)
                out.append(p)
        return "\n\n".join(out)

    cases = [
        "a\n\nb\n\na",
        "a\n\n\n\na\n\nb",
        "  x  \n\nx\n\ny",
        "\n\n\n\n",
        "p\n \np\n\t\np",
        "tail\n\n",
        "\n\nhead",
        "one only",
        None,
        "a\t\n\na",                  # tab-edged repeat must still dedup
        "crlf\r\n\r\ncrlf\r\n\r\nz",  # CRLF blank lines split too
        "m\r\n \r\nm",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, text string"
    )
    got = {r.i: r.c for r in df.select(
        "i", dedupe_paragraphs(F.col("text")).alias("c")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == model(c), f"case {i}: {c!r} -> {got[i]!r}"


@settings(max_examples=25, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.tuples(st.integers(min_value=1, max_value=5000),
                  st.floats(min_value=0.05, max_value=1.0)),
        min_size=1, max_size=4,
    )
)
def test_mixture_rates_feasible(spec):
    """The rate formula never upsamples and always saturates the binding
    stratum: 0 < rate_s <= 1 with equality for argmin(n_s / w_s)."""
    total = sum(w for _, w in spec.values())
    targets = {s: w / total for s, (_, w) in spec.items()}
    counts = {s: n for s, (n, _) in spec.items()}
    n_out = min(counts[s] / w for s, w in targets.items())
    rates = {s: w * n_out / counts[s] for s, w in targets.items()}
    assert all(0 < r <= 1 + 1e-12 for r in rates.values())
    binding = min(targets, key=lambda s: counts[s] / targets[s])
    assert math.isclose(rates[binding], 1.0)
