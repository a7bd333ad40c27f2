"""Z-order layout tests: the data-skipping claim, measured.

The layout operator's docstring claims row-group min/max statistics skip
most of the file for rectangle predicates. This test MEASURES it from
parquet footer metadata: the fraction of row groups whose (l_orderkey,
l_partkey) min/max ranges intersect the query rectangle must be
substantially lower in the Z-ordered layout than in the natural-order
layout of the same rows.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from ting_data_etl_spark.operators import layout as L


def _intersecting_rowgroups(path_glob: str) -> tuple[int, int]:
    """(row groups intersecting the query rectangle, total row groups)."""
    hit = total = 0
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        schema_names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        i_ok = schema_names.index("l_orderkey")
        i_pk = schema_names.index("l_partkey")
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            ok = g.column(i_ok).statistics
            pk = g.column(i_pk).statistics
            total += 1
            if (
                ok.min <= L.ZQ_OK_HI
                and ok.max >= L.ZQ_OK_LO
                and pk.min <= L.ZQ_PK_HI
                and pk.max >= L.ZQ_PK_LO
            ):
                hit += 1
    return hit, total


class TestZorderSkipping:
    def test_zorder_layout_prunes_more_rowgroups(self, spark, sf_dir, tmp_path):
        import pyspark.sql.functions as F

        from ting_data_etl_spark.sources.tables import load_table

        # small row groups so sf0.001 produces enough of them to measure
        spark.conf.set("spark.hadoop.parquet.block.size", str(64 * 1024))
        try:
            li = load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
            )
            natural = str(tmp_path / "natural")
            li.repartition(4).write.mode("overwrite").parquet(natural)
            zordered = str(tmp_path / "zordered")
            z = L.zvalue(F.col("l_orderkey"), F.col("l_partkey"))
            (
                li.withColumn("__z", z)
                .repartitionByRange(4, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
                .write.mode("overwrite")
                .parquet(zordered)
            )
        finally:
            spark.conf.unset("spark.hadoop.parquet.block.size")

        nat_hit, nat_total = _intersecting_rowgroups(f"{natural}/*.parquet")
        z_hit, z_total = _intersecting_rowgroups(f"{zordered}/*.parquet")
        assert nat_total >= 4 and z_total >= 4
        nat_frac = nat_hit / nat_total
        z_frac = z_hit / z_total
        # random layout: nearly every row group spans the whole key space ->
        # every group intersects; z-order confines groups to rectangles
        assert nat_frac >= 0.9, (nat_hit, nat_total)
        assert z_frac <= nat_frac / 2, (
            f"z-order skipped too little: {z_hit}/{z_total} intersect vs "
            f"natural {nat_hit}/{nat_total}"
        )

    def test_zvalue_interleave_exactness(self, spark):
        import pyspark.sql.functions as F

        def morton(a: int, b: int, bits: int = L.ZORDER_BITS) -> int:
            z = 0
            for i in range(bits):
                z |= ((a >> i) & 1) << (2 * i)
                z |= ((b >> i) & 1) << (2 * i + 1)
            return z

        rows = [(a, b) for a in (0, 1, 5, 1000, 65535) for b in (0, 3, 512, 65535)]
        df = spark.createDataFrame(rows, "a long, b long")
        got = {
            (r.a, r.b): r.z
            for r in df.select(
                "a", "b", L.zvalue(F.col("a"), F.col("b")).alias("z")
            ).collect()
        }
        for a, b in rows:
            assert got[(a, b)] == morton(a, b), (a, b)
