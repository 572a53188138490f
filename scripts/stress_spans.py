#!/usr/bin/env python
"""Duplicated-span dedup scale race: ExactSubstr-style span detection
(Spark, operators/textual.duplicated_spans) vs DuckDB running the
IDENTICAL query (k-gram windows → occurrence counts → interval merge) as
plain SQL on the same parquet corpus.

Corpus: N synthetic docs of 80-200 random tokens; 20% get one of 50
boilerplate spans (20-40 tokens) spliced in, and 5% are whole-doc
duplicates — so the answer contains partial spans, full-doc spans, and
plenty of unique text.  Both engines compute the exact same span set
(asserted identical per doc), so the race is simultaneously a second
independent-implementation correctness oracle.

Usage: python scripts/stress_spans.py [N ...]   (default 5000 20000 80000)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/tegallega_spans_stress"
K = 8
MIN_COUNT = 2


def build_corpus(n: int, seed: int = 23) -> list[tuple[int, str]]:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(5000)])
    boilers = [
        " ".join(rng.choice(vocab, size=int(rng.integers(20, 41))))
        for _ in range(50)
    ]
    docs: list[tuple[int, str]] = []
    for i in range(n):
        if i % 20 == 19 and docs:  # 5% whole-doc duplicates
            docs.append((i, docs[int(rng.integers(0, len(docs)))][1]))
            continue
        toks = list(rng.choice(vocab, size=int(rng.integers(80, 201))))
        if rng.random() < 0.2:
            b = boilers[int(rng.integers(0, len(boilers)))].split()
            at = int(rng.integers(0, len(toks)))
            toks = toks[:at] + b + toks[at:]
        docs.append((i, " ".join(toks)))
    return docs


def write_parquet(docs: list[tuple[int, str]], path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        ),
        path,
    )


DUCK_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY raw_pos) - 1 AS pos,
         tok
  FROM (SELECT doc_id,
               unnest(string_split_regex(text, '\\s+')) AS tok,
               generate_subscripts(string_split_regex(text, '\\s+'), 1) AS raw_pos
        FROM read_parquet('{{path}}'))
  WHERE tok <> ''
),
grams AS (
  SELECT doc_id, pos,
         array_to_string(list(tok) OVER w, ' ') AS gram,
         count(*) OVER w AS glen
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {K - 1} FOLLOWING)
),
kgrams AS (SELECT doc_id, pos, gram FROM grams WHERE glen = {K}),
dup AS (SELECT gram FROM kgrams GROUP BY gram HAVING count(*) >= {MIN_COUNT}),
hits AS (
  SELECT doc_id, pos AS s, pos + {K} AS e
  FROM kgrams WHERE gram IN (SELECT gram FROM dup)
),
flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN max(e) OVER prev IS NULL OR s > max(e) OVER prev
              THEN 1 ELSE 0 END AS new_span
  FROM hits
  WINDOW prev AS (PARTITION BY doc_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
spans AS (
  SELECT doc_id, s, e,
         sum(new_span) OVER (PARTITION BY doc_id ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS span_id
  FROM flagged
)
SELECT doc_id, min(s) AS start_tok, max(e) AS end_tok
FROM spans GROUP BY doc_id, span_id
"""


def run_duckdb(path: str) -> tuple[float, set]:
    import duckdb

    t0 = time.perf_counter()
    con = duckdb.connect()
    # At 2.56 M docs the window CTEs exceed DuckDB's default in-memory
    # budget (80% of RAM: the in-process python was OOM-killed at 107 GB
    # anon RSS on this 128 GiB host).  Cap the budget below the kernel's
    # kill line and give it a spill directory so the reference engine
    # gets its fair disk-backed path instead of a SIGKILL.
    con.execute("SET memory_limit='60GB'")
    os.makedirs(os.path.join(OUT, "duckspill"), exist_ok=True)
    con.execute(f"SET temp_directory='{os.path.join(OUT, 'duckspill')}'")
    rows = con.execute(DUCK_SQL.format(path=path)).fetchall()
    return time.perf_counter() - t0, {tuple(r) for r in rows}


def run_spark(spark, path: str) -> tuple[float, set]:
    from tegallega_spark.operators.textual import duplicated_spans

    t0 = time.perf_counter()
    spans = duplicated_spans(
        spark.read.parquet(path), k=K, min_count=MIN_COUNT
    )
    got = {(r.doc_id, r.start_tok, r.end_tok) for r in spans.collect()}
    return time.perf_counter() - t0, got


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [5000, 20000, 80000]
    os.makedirs(OUT, exist_ok=True)

    from tegallega_spark.session import get_spark

    spark = get_spark("spans-stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    # warm the Python/Arrow UDF worker pool (same untimed one-time session
    # setup bench.py performs): daemon fork + Arrow serializer init
    # otherwise land entirely inside the FIRST size's timed run
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(256).repartition(32).select(_warm("id")).collect()

    import statistics

    results = []
    for n in sizes:
        path = os.path.join(OUT, f"docs_{n}.parquet")
        write_parquet(build_corpus(n), path)
        # median-of-N on BOTH engines (r5 verdict: DuckDB's side jitters
        # 2-3× across sessions on this VM, so a single sample per engine
        # makes the ratio column noise).  Multi-minute runs self-average,
        # so very large N defaults to 1 run; override with SPANS_RUNS.
        runs = int(os.environ.get("SPANS_RUNS", "3" if n <= 320_000 else "1"))
        ts_samples, td_samples = [], []
        spark_spans = duck_spans = None
        for _ in range(runs):
            ts, spark_spans = run_spark(spark, path)
            td, duck_spans = run_duckdb(path)
            ts_samples.append(ts)
            td_samples.append(td)
        assert spark_spans == duck_spans, (
            f"N={n}: span sets differ "
            f"(spark {len(spark_spans)}, duckdb {len(duck_spans)})"
        )
        ts_m = statistics.median(ts_samples)
        td_m = statistics.median(td_samples)
        results.append(
            {
                "n_docs": n,
                "spans": len(spark_spans),
                "spark_s": round(ts_m, 2),
                "duckdb_s": round(td_m, 2),
                "ratio": round(td_m / ts_m, 2),
                "runs": runs,
                "spark_spread": round(max(ts_samples) - min(ts_samples), 2),
                "duckdb_spread": round(max(td_samples) - min(td_samples), 2),
            }
        )
        print(json.dumps(results[-1]), file=sys.stderr)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
