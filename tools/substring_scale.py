"""Scale probe for dedup_repeated_substrings (VERDICT r07 #3's SCALE row).

The anchor/merge plan's scale claim is structural: the repeated-hash
relation is produced by one hash-keyed aggregation over the stride-1 anchor
windows, and the join back is a SEMI-join — each window matches at most one
hash row, so candidate volume is bounded by the window count (≤ one row per
token) with NO fan-out and no need for frequency caps. This probe runs the
operator over the generated 10x/100x corpora (/tmp/scale_corpus, built by
tools/scale_corpus.py with planted boilerplate prefixes) and records the
whole funnel per scale:

  windows (= tokens)  →  repeated hashes  →  semi-join hits  →  span rows

Linear-ish growth of every stage with corpus size = the claim, measured.

Usage: python tools/substring_scale.py [--scales 10,100]
Writes SUBSTRING_SCALE_r08.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

CORPUS_ROOT = "/tmp/scale_corpus"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="10,100")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ting_data_etl_spark.functions.text import portable_hash31, tokens
    from ting_data_etl_spark.operators.text_queries import (
        REPEAT_L,
        repeated_substring_spans,
    )
    from ting_data_etl_spark.session import get_spark

    spark = get_spark(app_name="substring-scale")
    spark.sparkContext.setLogLevel("ERROR")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_json = os.path.join(here, "SUBSTRING_SCALE_r08.json")
    report: dict = {"repeat_l": REPEAT_L, "scales": {}}
    if os.path.exists(out_json):
        with open(out_json) as f:
            prev = json.load(f)
        if prev.get("repeat_l") == REPEAT_L:
            report["scales"].update(prev.get("scales", {}))
    for s in args.scales.split(","):
        path = os.path.join(CORPUS_ROOT, f"x{s}", "documents.parquet")
        if not os.path.exists(path):
            print(f"skip x{s}: {path} missing (run tools/scale_stress.py)")
            continue
        docs = spark.read.parquet(path)
        n_docs = docs.count()

        # funnel diagnostics (same expressions the operator uses)
        tok = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        n = F.size("toks")
        wins = (
            tok.filter(n >= REPEAT_L)
            .select(
                "doc_id",
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(0), n - REPEAT_L),
                        lambda i: F.concat_ws(
                            " ", F.slice(F.col("toks"), i + 1, REPEAT_L)
                        ),
                    )
                ).alias("pos", "win"),
            )
            .select("doc_id", "pos", portable_hash31(F.col("win")).alias("h"))
        )
        n_windows = wins.count()
        rep = (
            wins.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
        )
        n_rep_hashes = rep.count()
        n_hits = wins.join(rep.select("h"), "h").count()

        t0 = time.time()
        spans = repeated_substring_spans(docs)
        n_spans = spans.count()
        wall = round(time.time() - t0, 1)
        row = {
            "n_docs": n_docs,
            "n_windows": n_windows,
            "n_repeated_hashes": n_rep_hashes,
            "n_semi_join_hits": n_hits,
            "hits_per_window": round(n_hits / max(n_windows, 1), 4),
            "n_span_rows": n_spans,
            "operator_wall_sec": wall,
        }
        report["scales"][f"x{s}"] = row
        print(f"x{s}:", row, flush=True)

    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
