"""Capacity-rule tests: knob recommendations track corpus size correctly."""

from __future__ import annotations

from ting_data_etl_spark import capacity


class TestCapacityRules:
    def test_registered_defaults_at_test_scale(self):
        """At the driver corpus size the rules reproduce the registered
        constants — retuning is a no-op until the corpus outgrows them."""
        from ting_data_etl_spark.operators import dedup, similarity

        rec = capacity.recommend(n_docs=5_000, n_vecs=2_000)
        assert rec["srp_bits"] == similarity.SRP_BITS == 6
        assert rec["simhash_bits"] == dedup.SIMHASH_BITS == 32
        assert rec["kmeans_lists"] == similarity.KMEANS_LISTS == 8

    def test_monotone_nondecreasing(self):
        sizes = [1_000, 5_000, 50_000, 500_000, 5_000_000, 50_000_000]
        for knob in ("srp_bits", "simhash_bits", "kmeans_lists"):
            vals = [capacity.recommend(n, n)[knob] for n in sizes]
            assert vals == sorted(vals), (knob, vals)

    def test_bucket_occupancy_targets(self):
        """The recommended widths keep expected bucket occupancy in range."""
        for n in (50_000, 500_000, 5_000_000):
            bits = capacity.srp_bits(n)
            occ = n / 2**bits
            assert occ <= capacity.SRP_TARGET_BUCKET * 1.01
            assert occ > capacity.SRP_TARGET_BUCKET / 4
        for n in (50_000, 200_000):  # below the 60-bit clamp
            bits = capacity.simhash_bits(n)
            occ = n / 2 ** (bits // 4)
            assert occ <= capacity.SIMHASH_TARGET_BUCKET * 1.01

    def test_simhash_clamped_to_md5_safe_max(self):
        assert capacity.simhash_bits(10**9) == capacity.SIMHASH_MAX_BITS == 60


class TestChunkHashRule:
    def test_width_flips_at_collision_budget(self):
        from ting_data_etl_spark.capacity import (
            CHUNK_HASH31_MAX_CHUNKS,
            chunk_hash_bits,
            recommend,
        )

        assert chunk_hash_bits(770_456) == 31  # the x100 measured corpus
        assert chunk_hash_bits(CHUNK_HASH31_MAX_CHUNKS) == 31
        assert chunk_hash_bits(CHUNK_HASH31_MAX_CHUNKS + 1) == 64
        assert recommend(5_000, 2_000)["chunk_hash_bits"] == 31
        assert recommend(5_000_000, 2_000)["chunk_hash_bits"] == 64


class TestIndexBuckets:
    def test_registered_value_at_test_scale(self):
        # every fixture corpus floors to the registered INDEX_BUCKETS
        from ting_data_etl_spark.operators.incremental import INDEX_BUCKETS

        assert capacity.index_buckets(60_000) == INDEX_BUCKETS
        assert capacity.index_buckets(5_000_000) == INDEX_BUCKETS

    def test_bucket_bytes_bounded_and_power_of_two(self):
        for n in (10**6, 10**8, 10**9, 10**10):
            b = capacity.index_buckets(n)
            assert b & (b - 1) == 0  # power of two
            per_bucket = n * 8 * capacity.INDEX_ROW_BYTES / b
            assert per_bucket <= capacity.INDEX_TARGET_BUCKET_BYTES * 1.01

    def test_monotone(self):
        sizes = [10**5, 10**7, 10**9, 10**10]
        vals = [capacity.index_buckets(n) for n in sizes]
        assert vals == sorted(vals)
        assert vals[-1] >= 2048


class TestManifestShards:
    def test_registered_value_at_test_scale(self):
        from ting_data_etl_spark.operators.sampling import N_SHARDS

        assert capacity.manifest_shards(60_000) == N_SHARDS
        assert capacity.manifest_shards(5_000_000) == N_SHARDS

    def test_shard_bytes_bounded_and_power_of_two(self):
        for n in (10**8, 10**9, 10**10):
            s = capacity.manifest_shards(n)
            assert s & (s - 1) == 0
            per_shard = n * capacity.SHARD_DOC_BYTES / s
            assert per_shard <= capacity.SHARD_TARGET_BYTES * 1.01

    def test_monotone(self):
        sizes = [10**5, 10**7, 10**9, 10**10]
        vals = [capacity.manifest_shards(n) for n in sizes]
        assert vals == sorted(vals)
        assert vals[-1] >= 4096
