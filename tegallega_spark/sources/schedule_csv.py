"""Two-header wide schedule CSV → long form (SURVEY S4).

Reference: generate_gtfs.py:221-324.  Layout (route-data/schedule/
{agencyId}_{direction}.csv, e.g. KCI_0.csv:1-3):

    row 1: ,,stopA,stopA,stopB,stopB,...   (stop ids in duplicated pairs)
    row 2: ,,A,D,A,D,...                   (arrival/departure markers)
    rows : relationId,tripNum,t,t,...      (times, empty = skipped stop)

Wide→long melt runs as mapInPandas over wholetext rows: each file is one
row (these are small hand-curated inputs), parsed with the csv module, and
exploded to (agency_id, direction, relation_id, trip_num, col_pair_idx,
stop_id, arrival, departure).  Pair order is preserved as col_pair_idx.
The reference's skip rules (both-empty → skip, one-empty → coalesce) are
applied downstream so they stay visible in the plan.
"""

from __future__ import annotations

import csv
import io
import os
import re
from collections.abc import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SCHEDULE_LONG_COLS = (
    "agency_id string, direction int, relation_id string, trip_num string, "
    "col_pair_idx int, stop_id string, arrival string, departure string"
)


def _melt_file(fname: str, content: str) -> Iterator[tuple]:
    m = re.match(r"([A-Za-z0-9]+)_(\d+)\.csv$", os.path.basename(fname))
    if not m:
        return
    agency_id, direction = m.group(1), int(m.group(2))
    reader = csv.reader(io.StringIO(content))
    try:
        stop_ids = next(reader)
        event_types = next(reader)
    except StopIteration:
        return
    if len(stop_ids) < 2 or len(event_types) < 2:
        # invalid header rows → whole file skipped (generate_gtfs.py:234-237)
        return
    for row in reader:
        if not row or row[0].strip() == "":
            continue
        relation_id, trip_num = row[0], row[1]
        pair = 0
        for col_idx in range(2, len(row), 2):
            if col_idx + 1 >= len(row):
                break
            stop_id = stop_ids[col_idx] if col_idx < len(stop_ids) else None
            if not stop_id:
                continue
            yield (
                agency_id,
                direction,
                relation_id,
                trip_num,
                pair,
                stop_id,
                row[col_idx].strip(),
                row[col_idx + 1].strip(),
            )
            pair += 1


def read_schedule_long(spark: SparkSession, schedule_dir: str) -> DataFrame:
    import glob as _glob

    if not _glob.glob(f"{schedule_dir}/*.csv"):
        # S3 tolerance (generate_gtfs.py:223-225): missing schedules are a
        # warning, not a failure — train routes simply produce no trips
        print(f"No schedule CSVs found under {schedule_dir}")
        return spark.createDataFrame([], SCHEDULE_LONG_COLS)

    files = spark.read.text(f"{schedule_dir}/*.csv", wholetext=True).select(
        F.input_file_name().alias("fname"), F.col("value").alias("content")
    )

    def melt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in SCHEDULE_LONG_COLS.split(", ")]
        for pdf in batches:
            out = []
            for fname, content in zip(pdf["fname"], pdf["content"]):
                out.extend(_melt_file(fname, content))
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(melt, schema=SCHEDULE_LONG_COLS)
