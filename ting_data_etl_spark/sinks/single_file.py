"""Per-group single-file CSV sink with utf-8-sig BOM (SURVEY.md §2.1 S5).

The reference contract: exactly one file ``output/{store}/{analysis_id}.csv``
per group, encoded ``utf-8-sig`` so Excel opens it correctly, with a fixed
column order (reference ``aggregate_by_store.py:225-233`` et al.). Spark's
CSV writer emits ``part-*`` files and has no ``utf-8-sig`` encoding, so this
is implemented as ``applyInPandas`` over the group key: each group's rows
arrive as ONE Arrow-batched pandas frame in one task, which writes the single
file itself. That keeps the write fully distributed (no driver collect, no
post-hoc rename pass that object stores make non-atomic).

Scale note: one group must fit in one task's memory — true by construction
here (per-store analytic outputs are ≤ a few thousand rows). For groups that
don't fit, use :mod:`ting_data_etl_spark.sinks.fanout` instead.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType


def safe_path_component(key: str) -> str:
    """Validate a group key used as a filesystem path component.

    Group values come from DATA; used raw in ``os.path.join`` a value like
    ``'../evil'`` escapes the sink root, ``'a/b'`` silently nests, and
    ``''`` drops the file at the root. Loud rejection over silent
    mangling — the repo's posture for every other hostile-input path.
    """
    if (
        not key
        or key in (".", "..")
        or "/" in key
        or os.sep in key
        or (os.altsep and os.altsep in key)
        or "\x00" in key
    ):
        raise ValueError(
            f"group key {key!r} is not a safe path component; "
            "sanitize the key column before writing"
        )
    return key


def write_per_group_csv(
    df: DataFrame,
    output_dir: str,
    group_col: str,
    file_name: str,
    columns: Sequence[str],
    sort_by: Sequence[str] = (),
    encoding: str = "utf-8-sig",
) -> DataFrame:
    """Write ``{output_dir}/{group}/{file_name}`` per group.

    Returns the lazy receipts DataFrame ``(group_key, rows_written)`` — one
    row per group; materializing it (count/collect/write) performs the
    distributed write. ``columns`` fixes the output column order (reference
    P1 projection); ``sort_by`` reproduces the per-group pre-output sort
    (O1, e.g. month asc, reference ``aggregate_by_store.py:311, 504``).
    """
    out_schema = StructType(
        [
            StructField("group_key", StringType(), True),
            StructField("rows_written", LongType(), True),
        ]
    )
    cols = list(columns)
    sort_cols = list(sort_by)

    def _write_group(pdf):
        import pandas as pd

        key = safe_path_component(str(pdf[group_col].iloc[0]))
        if sort_cols:
            pdf = pdf.sort_values(sort_cols, kind="mergesort")
        target_dir = os.path.join(output_dir, key)
        os.makedirs(target_dir, exist_ok=True)
        # atomic per-file publish (tmp + os.replace): a concurrent run over
        # the same output_dir, or a speculative/retried copy of this task,
        # must never leave a torn half-written CSV for a reader
        final = os.path.join(target_dir, file_name)
        tmp = f"{final}.tmp.{os.getpid()}"
        pdf[cols].to_csv(tmp, index=False, encoding=encoding)
        os.replace(tmp, final)
        return pd.DataFrame({"group_key": [key], "rows_written": [len(pdf)]})

    return df.groupBy(group_col).applyInPandas(_write_group, schema=out_schema)
