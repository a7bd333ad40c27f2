"""Sink → verify end-to-end, including defect *detection* on a corrupted tree.

A verifier that only ever sees clean data proves nothing — the second test
corrupts the fan-out tree (misrouted row + foreign file) and asserts each
check catches its defect class, mirroring the reference's own failure modes
(``verify_fanout.py``: wrong key in a store dir, extra/missing files).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ting_data_etl_spark.operators.verify import (
    completeness_violations,
    fanout_source,
    fanout_verification_report,
    invariant_violations,
    read_fanout_back,
    sample_violations,
)


def _tmpdir(name: str) -> str:
    d = os.path.join(tempfile.gettempdir(), "ting_verify_tests", name)
    shutil.rmtree(d, ignore_errors=True)
    return d


class TestCleanTree:
    def test_report_is_all_green(self, spark, sf_dir):
        src = fanout_source(spark, sf_dir)
        report = fanout_verification_report(spark, src, _tmpdir("clean"))
        counts = {r.check_name: r.n for r in report.collect()}
        assert counts["missing_store_files"] == 0
        assert counts["extra_store_files"] == 0
        assert counts["key_value_violations"] == 0
        assert counts["sampled_violations"] == 0
        assert counts["rows_checked"] == src.count()
        assert counts["stores_checked"] == 25  # TPC-H nations


class TestCorruptedTree:
    def test_checks_detect_injected_defects(self, spark, sf_dir):
        src = fanout_source(spark, sf_dir)
        out = _tmpdir("corrupt")
        fanout_verification_report(spark, src, out).collect()

        # defect 1 (V2): a row whose embedded key contradicts its directory
        # (pick the first populated (store, src) dir — tiny sf dirs are sparse)
        store_dir = sorted(
            d for d in os.listdir(out) if d.startswith("store_id=")
        )[0]
        victim_store = store_dir.split("=")[1]
        src_dir = sorted(os.listdir(os.path.join(out, store_dir)))[0]
        victim_dir = os.path.join(out, store_dir, src_dir)
        part = [f for f in os.listdir(victim_dir) if f.endswith(".csv")][0]
        with open(os.path.join(victim_dir, part), "a") as f:
            f.write("999999,17171717\n")  # wrong embedded key
        # drop Hadoop's local-FS checksum sidecar, which (correctly) flags
        # the hand-edited file before our own checks get a chance to
        crc = os.path.join(victim_dir, f".{part}.crc")
        if os.path.exists(crc):
            os.remove(crc)

        # defect 2 (V1 extra): a foreign (store, src) combination on disk
        foreign = os.path.join(out, "store_id=99", "src=rogue.csv")
        os.makedirs(foreign, exist_ok=True)
        shutil.copy(os.path.join(victim_dir, part), os.path.join(foreign, part))

        back = read_fanout_back(spark, out)
        bad = invariant_violations(back)
        assert bad.filter(F.col("store_id") == victim_store).count() == 1

        expected = src.select("store_id", "src").distinct()
        found = back.select("store_id", "src").distinct()
        missing, extra = completeness_violations(expected, found)
        assert missing.count() == 0
        got_extra = {(r.store_id, r.src) for r in extra.collect()}
        assert ("99", "rogue.csv") in got_extra

    def test_violation_sampling_is_capped(self, spark):
        rows = [(i, "7", "8", "s.csv") for i in range(20)]
        bad = spark.createDataFrame(
            rows, "row_id long, store_id string, store_key_copy string, src string"
        )
        assert sample_violations(bad, k=5).count() == 5
