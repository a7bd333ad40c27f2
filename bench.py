"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}. Each query executes fully via the
noop sink (no collect, no disk write — measures compute + shuffle only).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "flagship_pricing_summary",
    "job_23_1_annual_kpi",
    "job_23_2_monthly_yoy",
    "job_24_1_performance_kpi",
    "job_24_2_branch_month_conversion",
    "job_25_1_top5_branches",
    "job_25_2_bottom5_branches",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash_signatures",
    "dedup_simhash_pairs",
    "similarity_bruteforce_topk",
    "similarity_ivf_topk",
    "similarity_ivf_kmeans_topk",
    "similarity_srp_lsh_topk",
    "text_bpe_token_count",
    "text_winnow_fingerprints",
    "multimodal_frame_sample",
    "sample_hash_mod",
    "shard_assignment",
    "text_corpus_profile",
    "text_lang_id",
    "events_tumbling_5min",
    "events_sessionize_30min_gap",
    "streaming_tumbling_5min",
    "streaming_stateful_sessionize",
    "streaming_click_purchase_join",
    "dedup_connected_components",
    "events_asof_click_before_purchase",
    "events_cube_type_hour",
    "cdc_upsert_snapshot",
    "bucketed_join_revenue_by_priority",
    "dq_lineitem_expectations",
    "pack_sequences",
    "jsonl_roundtrip_profile",
    "e2e_csv_pipeline",
    "prim_fanout_verify",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from ting_data_etl_spark.session import get_spark

    spark = get_spark(app_name="ting-data-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()

    # Warm the JVM/codegen path once so timings measure steady-state compute.
    qs["flagship_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    def run_all() -> dict[str, float]:
        out: dict[str, float] = {}
        for name in HEADLINE:
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
        return out

    # Pass 1 (cold): absorbs the one-time builds several operators stage —
    # the IVF k-means fit, bucketed tables, streaming source stages, JSONL/
    # partitioned layouts. Pass 2 (steady state) is the headline number:
    # those builds are write-once index/layout jobs whose cost amortizes
    # over every subsequent query, which is what per-query latency means in
    # production. Both totals are reported.
    cold = run_all()
    timings = run_all()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "cold_total_sec": round(sum(cold.values()), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
