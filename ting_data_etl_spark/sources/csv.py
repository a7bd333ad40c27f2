"""CSV sources: all-string reads and the header-scanning messy reader.

The reference's ingestion model (SURVEY.md §1.2-1.3):

* every column ingests as **string** (``pd.read_csv(dtype=str)``, reference
  ``aggregate_by_store.py:123`` et al.) — coercion happens lazily per column
  via :func:`ting_data_etl_spark.functions.to_number`;
* BI-tool exports carry 0..n meta rows before the real header; the header is
  the first row whose cells contain the key column name (reference
  ``fan_out_by_storeid.py:16-30``); files with no such row are skipped with a
  warning (``:28-30``);
* ragged rows are tolerated (short rows → skipped/empty, reference
  ``fan_out_by_storeid.py:33-34``, ``verify_fanout.py:90-93``).

Scale design: the header scan reads only the first ``max_scan_bytes`` of each
file on the driver (one small ranged read per file — object-store friendly);
the bulk of the data is then read by Spark's distributed text reader and
parsed with ``from_csv``, dropping the known prefix lines by line position —
no full-file driver read, no RDD round-trip.
"""

from __future__ import annotations

import csv
import io
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def scan_csv_dir(path: str) -> list[str]:
    """Enumerate ``*.csv`` files (case-insensitive ext) in a flat directory.

    Mirrors reference ``fan_out_by_storeid.py:7-10`` / ``verify_fanout.py:8-13``.
    """
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.lower().endswith(".csv") and os.path.isfile(os.path.join(path, f))
    )


def all_string_schema(columns: list[str]) -> StructType:
    return StructType([StructField(c, StringType(), True) for c in columns])


def read_all_string_csv(
    spark: SparkSession, path: str, encoding: str = "utf-8"
) -> DataFrame:
    """CSV → DataFrame with every column as string (``dtype=str`` analogue).

    Header cells are whitespace-stripped wholesale (reference
    ``aggregate_by_store.py:468, 477, 554, 563``).
    """
    df = (
        spark.read.option("header", True)
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
        .option("inferSchema", False)  # everything stays StringType
        .csv(path)
    )
    renames = {c: c.strip() for c in df.columns if c != c.strip()}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df


@dataclass
class MessyCsvResult:
    """A messy-CSV read: data plus the sidecar metadata the sink re-emits.

    ``raw_header`` is the header row exactly as parsed (unstripped,
    undeduplicated) — the row the reference re-serializes into every
    fanned-out per-store file (``fan_out_by_storeid.py:44-47``), kept
    alongside the normalized ``header`` the DataFrame columns use.
    """

    df: DataFrame
    header: list[str]
    meta_rows: list[list[str]] = field(default_factory=list)
    raw_header: list[str] | None = None
    skipped: bool = False  # True when no header row contained the key column


def _scan_header(
    raw: bytes, key_col: str, encoding: str, max_rows: int = 50
) -> tuple[list[list[str]], list[str] | None, list[str] | None, int]:
    """Find the header row (first row containing *key_col*) in a file prefix.

    Returns (meta_rows, stripped_header_or_None, raw_header_or_None,
    header_line_index).
    """
    text = raw.decode(encoding, errors="replace")
    reader = csv.reader(io.StringIO(text))
    meta: list[list[str]] = []
    for i, row in enumerate(reader):
        if i >= max_rows:
            break
        if any(cell.strip() == key_col for cell in row):
            return meta, [c.strip() for c in row], row, i
        meta.append(row)
    return meta, None, None, -1


def read_messy_csv(
    spark: SparkSession,
    path: str,
    key_col: str,
    encoding: str = "utf-8",
    max_scan_bytes: int = 256 * 1024,
    validate_quotes: bool = True,
) -> MessyCsvResult:
    """Header-scanning CSV source (SURVEY.md §2.1 S3).

    Driver does ONE bounded ranged read (first ``max_scan_bytes``) to locate
    the header; Spark's distributed text reader then loads the whole file,
    the known meta/header prefix rows are dropped by line position, and data
    lines parse via ``from_csv`` with an explicit all-string schema. Ragged
    rows parse PERMISSIVE (missing cells → NULL ≈ the reference's skip/empty
    behavior).

    Two failure modes are rejected LOUDLY rather than silently misparsed:

    * *path* must be a single file — the prefix-drop counts physical lines
      of the first split, which is only well-defined for one file (a glob
      would interleave line numbering across files);
    * embedded newlines inside quoted cells break the line-oriented model
      (a CSV *record* would span several text lines): any such cell in the
      scanned prefix raises immediately, and ``validate_quotes`` adds a
      distributed quote-parity sweep over the data region — a line with an
      odd number of ``\"`` characters means a record was torn apart.
    """
    if not os.path.isfile(path):
        raise ValueError(
            f"read_messy_csv requires a single file, got {path!r} "
            "(for directories, loop per file — schemas differ per file anyway)"
        )
    with open(path, "rb") as f:
        raw = f.read(max_scan_bytes)
    meta, header, raw_header, header_idx = _scan_header(raw, key_col, encoding)
    for row in [*meta, *([header] if header else [])]:
        if any("\n" in cell or "\r" in cell for cell in row):
            raise ValueError(
                f"{path!r}: quoted embedded newline inside the meta/header "
                "prefix — line-positional prefix dropping would misalign; "
                "clean the export or parse this file with a multiLine reader"
            )
    if header is None:
        # No header row contains the key column: warn + skip
        # (reference fan_out_by_storeid.py:28-30).
        empty = spark.createDataFrame([], all_string_schema(["_skipped"]))
        return MessyCsvResult(df=empty, header=[], meta_rows=meta, skipped=True)

    # Deduplicate header names the way BI exports need (a, a -> a, a_2).
    seen: dict[str, int] = {}
    cols: list[str] = []
    for c in header:
        n = seen.get(c, 0)
        seen[c] = n + 1
        cols.append(c if n == 0 else f"{c}_{n + 1}")

    # Spark's CSV reader has no skipRows (as of 4.1), so: read as text, drop
    # the known prefix lines by position, parse with from_csv. For a single
    # file, monotonically_increasing_id() enumerates lines of the first split
    # in byte order with counter starting at 0, so ids 0..header_idx are
    # exactly the meta rows + header line (the 256 KB scan bound guarantees
    # they sit inside the first split).
    ddl = ", ".join(f"`{c}` STRING" for c in cols)
    lines = spark.read.text(path).withColumn("_lineno", F.monotonically_increasing_id())
    data_lines = lines.filter(F.col("_lineno") > header_idx)
    if validate_quotes:
        # quote-parity sweep: a physical line with an odd number of '"' can
        # only come from a record whose quoted cell spans lines — the one
        # shape the line-positional model cannot represent. One cheap
        # column-pruned pass; fail loudly instead of parsing garbage.
        odd = (
            F.length(F.regexp_replace(F.col("value"), '[^"]', "")) % 2 == 1
        )
        if not data_lines.filter(odd).isEmpty():
            raise ValueError(
                f"{path!r}: data region contains a quoted embedded newline "
                "(odd quote parity on a physical line); parse this file "
                "with a multiLine CSV reader instead"
            )
    df = (
        data_lines
        .select(F.from_csv(F.col("value"), ddl, {"mode": "PERMISSIVE"}).alias("r"))
        .select("r.*")
    )
    return MessyCsvResult(df=df, header=cols, meta_rows=meta, raw_header=raw_header)


def valid_key_condition(key_col: str) -> F.Column:
    """Non-blank/non-NULL key predicate (reference ``fan_out_by_storeid.py:33-37``)."""
    return F.col(key_col).isNotNull() & (F.length(F.trim(F.col(key_col))) > 0)


def filter_valid_keys(df: DataFrame, key_col: str) -> DataFrame:
    """Drop rows with blank/NULL key (reference ``fan_out_by_storeid.py:33-37``)."""
    return df.filter(valid_key_condition(key_col))
