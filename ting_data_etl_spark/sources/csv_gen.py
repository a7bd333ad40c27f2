"""Seeded synthetic messy-CSV generator (SURVEY §2.1 S6, §5.3).

The reference's ``csv_gen.py:45-114`` generates adversarial corpora — N files
x random rows x random 3-10-column schemas over 5 primitive types (string,
int, float, ISO date 2018-2024 (F8), bool), seeded — as the generator half of
its property-based testing strategy (the property being the fan-out
verifier's invariants). This generator keeps that contract and adds the messy
traits the reference *reads* but never generates, so the header-scanning
reader (S3) and alias resolution can actually be fuzzed:

* 0-3 BI-tool meta rows before the header;
* alias-variant column names (month/store-name variants, padded headers);
* human-formatted numbers ("12,345", "45%"), textual null sentinels;
* ragged (short) rows, blank keys, quoted commas;
* some files with NO key column at all (must be skipped with a warning).

Driver-side tooling on purpose (it writes local fixture files for tests);
everything it produces is consumed by the distributed reader.
"""

from __future__ import annotations

import csv
import os
import random
from datetime import date, timedelta

DATA_TYPES = ["string", "int", "float", "date", "bool"]

#: Alias pools the fuzz corpus draws column names from — the same variant
#: lists the reference resolves (aggregate_by_store.py:452-464, 530-550).
MONTH_ALIASES = ["month", "Month", "MONTH", "月份", "月"]
NAME_ALIASES = ["Store Name", "store_name", "Name", "門市名稱", "門市名稱 "]

NULL_SENTINELS = ["", "nan", "NaN", "NULL", "None"]

META_ROW_TEMPLATES = [
    ["Report generated", "{stamp}"],
    ["Source", "BI-Export"],
    ["", ""],
]

#: Cell pool for the ADVERSARIAL meta fuzz (round-6 item #8): embedded
#: delimiters, double quotes (csv doubles them on write), padding, CJK,
#: empties — every shape a BI tool emits above the header EXCEPT embedded
#: newlines, which the line-positional reader rejects by contract.
_ADVERSARIAL_META_CELLS = [
    "Report generated",
    "值,含,逗號",  # commas force quoting
    'quote "inside" cell',
    '","',
    "  padded  ",
    "門市月報表",
    "",
    "=SUM(A1:A9)",  # formula-looking cell, must stay inert text
    "semi;colon",
    "trailing,",
]


def _adversarial_meta_rows(rng: random.Random) -> list[list[str]]:
    """0-4 meta rows of 1-5 cells each, drawn from the adversarial pool."""
    return [
        [rng.choice(_ADVERSARIAL_META_CELLS) for _ in range(rng.randint(1, 5))]
        for _ in range(rng.randint(0, 4))
    ]


def _iso_date(rng: random.Random) -> str:
    """ISO date literal in 2018-01-01..2024-12-31 (F8, csv_gen.py:24-28)."""
    start = date(2018, 1, 1)
    span = (date(2024, 12, 31) - start).days
    return (start + timedelta(days=rng.randint(0, span))).isoformat()


def _value(rng: random.Random, dtype: str) -> str:
    if rng.random() < 0.06:
        return rng.choice(NULL_SENTINELS)
    if dtype == "string":
        v = f"val_{rng.randint(10000, 99999)}"
        if rng.random() < 0.08:
            v = f"{v},with comma"  # forces csv quoting, no newline
        return v
    if dtype == "int":
        n = rng.randint(-100000, 100000)
        # human thousands separators sometimes
        return f"{n:,}" if rng.random() < 0.3 else str(n)
    if dtype == "float":
        if rng.random() < 0.2:
            return f"{rng.uniform(0, 100):.2f}%"
        return f"{rng.uniform(-10000, 10000):.4f}"
    if dtype == "date":
        return _iso_date(rng)
    if dtype == "bool":
        return rng.choice(["true", "false"])
    return ""


def _schema(rng: random.Random, key_col: str, min_cols: int, max_cols: int):
    n_cols = rng.randint(min_cols, max_cols)
    cols, types = [key_col], ["string"]
    # sprinkle alias-variant columns so ensure_col has something to resolve
    if rng.random() < 0.7:
        cols.append(rng.choice(MONTH_ALIASES))
        types.append("month")
    if rng.random() < 0.5:
        cols.append(rng.choice(NAME_ALIASES))
        types.append("string")
    used = set(cols)
    while len(cols) < n_cols:
        name = f"col_{rng.randint(1000, 9999)}"
        if name in used:
            continue
        used.add(name)
        cols.append(name)
        types.append(rng.choice(DATA_TYPES))
    return cols, types


def _month_value(rng: random.Random) -> str:
    m = rng.randint(1, 12)
    return rng.choice([f"{m}", f"{m:02d}", f"2025{m:02d}", f"2025-{m:02d}", f"2025/{m:02d}"])


def generate_messy_csvs(
    out_dir: str,
    n_files: int = 6,
    seed: int = 42,
    key_col: str = "store_id",
    n_keys: int = 12,
    min_rows: int = 20,
    max_rows: int = 60,
    min_cols: int = 3,
    max_cols: int = 8,
    keyless_every: int = 4,
    adversarial_meta: bool = False,
) -> list[str]:
    """Write a seeded messy corpus; returns the file paths (sorted).

    Every ``keyless_every``-th file omits the key column entirely — the
    reader contract is to skip those with a warning (reference
    ``fan_out_by_storeid.py:28-30``). ``adversarial_meta`` swaps the tame
    meta templates for the delimiter/quote-stuffed pool
    (:func:`_adversarial_meta_rows`) — the fuzz input for the byte-exact
    prefix re-emission contract (``fan_out_by_storeid.py:44-47``).
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    keys = [f"store_{i:03d}" for i in range(1, n_keys + 1)]
    paths = []
    for i in range(1, n_files + 1):
        path = os.path.join(out_dir, f"data_{i:02d}.csv")
        paths.append(path)
        keyless = keyless_every > 0 and i % keyless_every == 0
        cols, types = _schema(rng, key_col, min_cols, max_cols)
        if keyless:
            cols, types = cols[1:], types[1:]
        with open(path, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            if adversarial_meta:
                for t in _adversarial_meta_rows(rng):
                    w.writerow(t)
            else:
                for t in META_ROW_TEMPLATES[: rng.randint(0, 3)]:
                    w.writerow([c.format(stamp=_iso_date(rng)) for c in t])
            w.writerow(cols)
            for _ in range(rng.randint(min_rows, max_rows)):
                row = []
                for c, t in zip(cols, types):
                    if c == key_col:
                        # occasional blank key (P7 guard) / padded key
                        r = rng.random()
                        if r < 0.04:
                            row.append("")
                        elif r < 0.12:
                            row.append(f"  {rng.choice(keys)} ")
                        else:
                            row.append(rng.choice(keys))
                    elif t == "month":
                        row.append(_month_value(rng))
                    else:
                        row.append(_value(rng, t))
                if rng.random() < 0.05 and len(row) > 2:
                    row = row[: rng.randint(1, len(row) - 1)]  # ragged row
                w.writerow(row)
    return sorted(paths)
