#!/usr/bin/env python
"""Measure the K1 CSV sink stage alone at replication N: the r10
coalesce(1) single-thread serialization vs the r11 parallel part write +
driver concat (sources/gtfs.write_gtfs_table).  Both paths produce the
same line multiset (pinned by test_sink_output_byte_identical); this
script publishes the WALL delta of the sink stage the end-to-end GTFS
race cannot see (its table writes go through the noop format).

Usage: python scripts/measure_gtfs_sink.py [N]   (default 64)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.stress_gtfs import build_input, make_session  # noqa: E402


def write_coalesced(df, name, out_dir, cols):
    """The r10 sink shape: coalesce(1), one part file, rename."""
    os.makedirs(out_dir, exist_ok=True)
    final = os.path.join(out_dir, f"{name}.txt")
    with tempfile.TemporaryDirectory(dir=out_dir) as tmp:
        spark_out = os.path.join(tmp, "csv")
        df.select(*cols).coalesce(1).write.option("header", True).option(
            "emptyValue", ""
        ).mode("overwrite").csv(spark_out)
        part = glob.glob(os.path.join(spark_out, "part-*.csv"))[0]
        shutil.move(part, final)
    return final


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from tegallega_spark.pipeline.gtfs_build import build_gtfs
    from tegallega_spark.schemas import GTFS_COLUMNS
    from tegallega_spark.sources.gtfs import write_gtfs_table

    root = build_input(n)
    spark = make_session(root)
    tables = build_gtfs(spark, root)
    st = tables["stop_times"].persist()
    rows = st.count()  # materialize upstream once; sink timing is sink-only
    out = os.path.join(tempfile.gettempdir(), f"gtfs_sink_ab_{n}")
    shutil.rmtree(out, ignore_errors=True)
    cols = GTFS_COLUMNS["stop_times"]

    results = {}
    for label, fn in [
        ("parallel", lambda: write_gtfs_table(st, "stop_times", f"{out}/new")),
        ("coalesce1", lambda: write_coalesced(st, "stop_times", f"{out}/old", cols)),
    ]:
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            path = fn()
            walls.append(round(time.perf_counter() - t0, 2))
            size = os.path.getsize(path)
        results[label] = {"walls_s": walls, "best_s": min(walls), "bytes": size}

    # line-multiset equality of the two outputs (the sink contract)
    def line_multiset(p):
        import hashlib
        h = hashlib.sha256()
        with open(p, "rb") as f:
            for ln in sorted(f.readlines()):
                h.update(ln)
        return h.hexdigest()

    same = line_multiset(f"{out}/new/stop_times.txt") == line_multiset(
        f"{out}/old/stop_times.txt"
    )
    print(json.dumps({
        "replication": n, "stop_times_rows": rows, "outputs_same_multiset": same,
        "sink": results,
        "speedup": round(results["coalesce1"]["best_s"] / results["parallel"]["best_s"], 2),
    }))
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
