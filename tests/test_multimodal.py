"""Tests for the multimodal binary+metadata plumbing (decoder injection)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ting_data_etl_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    documents_as_media,
    extract_features,
    fake_decoder,
    real_decoder,
)


class TestDecoderInjection:
    def test_fake_decoder_features_flow_through_map_in_pandas(self, spark, sf_dir):
        media = documents_as_media(spark, sf_dir).limit(20)
        feats = extract_features(media, decoder=fake_decoder)
        assert feats.schema == FEATURE_SCHEMA
        rows = feats.collect()
        assert len(rows) == 20
        assert all(r.feature_dim == 8 for r in rows)
        # deterministic: same payload -> same features across runs
        again = {r.media_id: r.feature_norm for r in extract_features(
            media, decoder=fake_decoder).collect()}
        assert {r.media_id: r.feature_norm for r in rows} == again

    def test_real_decoder_is_a_loud_stub(self, spark, sf_dir):
        media = documents_as_media(spark, sf_dir).limit(1)
        with pytest.raises(Exception, match="NotImplementedError|media decode"):
            extract_features(media, decoder=real_decoder).collect()

    def test_payload_bytes_roundtrip(self, spark, sf_dir):
        # binary column arrives as bytes; n_bytes metadata matches payload
        media = documents_as_media(spark, sf_dir).limit(5)
        for r in media.select("payload", "n_bytes").collect():
            assert isinstance(r.payload, (bytes, bytearray))
            assert len(r.payload) == r.n_bytes

    def test_metadata_predicate_prunes_without_touching_payload(self, spark, sf_dir):
        # planner-side check: a metadata filter must not force payload decode
        media = documents_as_media(spark, sf_dir)
        small = media.filter(F.col("n_bytes") < 100).select("media_id", "n_bytes")
        assert small.count() == small.collect().__len__()


class TestFrameSample:
    def test_default_framer_is_stubbed(self, spark, sf_dir):
        import pytest

        from ting_data_etl_spark.operators.multimodal import (
            documents_as_media,
            sample_frames,
        )

        m = documents_as_media(spark, sf_dir).limit(1)
        with pytest.raises(Exception) as exc:
            sample_frames(m).collect()
        assert "NotImplementedError" in str(exc.value) or isinstance(
            exc.value, NotImplementedError
        )

    def test_row_expansion_and_stride(self, spark):
        import pyspark.sql.functions as F

        from ting_data_etl_spark.operators.multimodal import (
            FRAME_CHARS,
            fake_framer,
            sample_frames,
        )

        # 9 frames of text -> stride 4 keeps frames 0, 4, 8
        text = "x" * (FRAME_CHARS * 8 + 10)
        df = spark.createDataFrame(
            [(1, text)], "media_id long, text string"
        ).select(
            "media_id",
            F.encode("text", "UTF-8").alias("payload"),
            F.lit("video").alias("media_type"),
        )
        rows = sample_frames(df, framer=fake_framer).collect()
        assert [(r.frame_idx, r.frame_chars) for r in rows] == [
            (0, FRAME_CHARS),
            (4, FRAME_CHARS),
            (8, 10),
        ]


class TestResize:
    def test_resize_caps_payload(self, spark):
        import pyspark.sql.functions as F

        from ting_data_etl_spark.operators.multimodal import (
            RESIZE_CHARS,
            fake_resizer,
            resize_media,
        )

        long_text = "a" * (RESIZE_CHARS * 3)
        short_text = "b" * 10
        df = spark.createDataFrame(
            [(1, long_text), (2, short_text)], "media_id long, text string"
        ).select(
            "media_id",
            F.encode("text", "UTF-8").alias("payload"),
            F.lit("image").alias("media_type"),
            F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        )
        rows = {r.media_id: r for r in resize_media(df, fake_resizer).collect()}
        assert rows[1].resized_bytes == RESIZE_CHARS
        assert rows[1].orig_bytes == RESIZE_CHARS * 3
        assert rows[2].resized_bytes == 10


class TestRealPpmCodec:
    """The r9 dependency-free PPM (P6) decode path — real, un-mocked."""

    @staticmethod
    def _gradient_ppm(w=96, h=40):
        import numpy as np

        x = np.arange(w, dtype=np.uint8)
        y = np.arange(h, dtype=np.uint8)
        arr = np.stack(
            [
                np.tile(x, (h, 1)),
                np.tile(y[:, None], (1, w)),
                np.full((h, w), 7, dtype=np.uint8),
            ],
            axis=-1,
        ).astype("uint8")
        return arr

    def test_roundtrip_and_header_comments(self):
        import numpy as np

        from ting_data_etl_spark.operators.multimodal import (
            decode_ppm,
            encode_ppm,
        )

        arr = self._gradient_ppm()
        assert (decode_ppm(encode_ppm(arr)) == arr).all()
        # netpbm comment + multi-whitespace header forms decode too
        raw = b"P6 # comment\n# another\n 96\t40\n255\n" + arr.tobytes()
        assert (decode_ppm(raw) == arr).all()
        with pytest.raises(ValueError, match="truncated"):
            decode_ppm(b"P6\n96 40\n255\n" + arr.tobytes()[:-1])
        with pytest.raises(ValueError, match="not a P6"):
            decode_ppm(b"P5\n1 1\n255\n\x00")

    def test_downscale_nearest_neighbor_exact(self):
        import numpy as np

        from ting_data_etl_spark.operators.multimodal import (
            RESIZE_MAX_DIM,
            ppm_downscale,
        )

        arr = self._gradient_ppm(w=200, h=100)
        out = ppm_downscale(arr)
        assert out.shape == (32, 64, 3)  # 200x100 -> cap 64 keeps aspect
        rows = (np.arange(32) * 100) // 32
        cols = (np.arange(64) * 200) // 64
        assert (out == arr[rows][:, cols]).all()
        small = self._gradient_ppm(w=10, h=10)
        assert ppm_downscale(small) is small  # no-op under the cap

    def test_real_resizer_through_map_in_pandas(self, spark):
        """A real PPM fixture round-trips the resize_media plumbing with
        the PRODUCTION hook — no fake injected anywhere."""
        from ting_data_etl_spark.operators.multimodal import (
            decode_ppm,
            encode_ppm,
            ppm_downscale,
            real_resizer,
            resize_media,
        )

        big = encode_ppm(self._gradient_ppm(w=200, h=100))
        small = encode_ppm(self._gradient_ppm(w=8, h=8))
        df = spark.createDataFrame(
            [(1, big), (2, small)], "media_id long, payload binary"
        ).select(
            "media_id",
            "payload",
            F.lit("image/ppm").alias("media_type"),
            F.length("payload").cast("long").alias("n_bytes"),
        )
        rows = {r.media_id: r for r in resize_media(df, real_resizer).collect()}
        want = encode_ppm(ppm_downscale(decode_ppm(big)))
        assert rows[1].resized_bytes == len(want)
        import hashlib

        assert rows[1].resized_md5 == hashlib.md5(want).hexdigest()
        # under-cap image is byte-identical after the pass
        assert rows[2].resized_bytes == len(small)
        assert rows[2].resized_md5 == hashlib.md5(small).hexdigest()

    def test_real_decoder_features_on_ppm(self, spark):
        from ting_data_etl_spark.operators.multimodal import (
            encode_ppm,
            extract_features,
            real_decoder,
        )

        pay = encode_ppm(self._gradient_ppm(w=96, h=40))
        df = spark.createDataFrame(
            [(1, pay)], "media_id long, payload binary"
        ).select(
            "media_id",
            "payload",
            F.lit("image/ppm").alias("media_type"),
            F.length("payload").cast("long").alias("n_bytes"),
        )
        r = extract_features(df, decoder=real_decoder).collect()[0]
        assert r.feature_dim == 8
        # width/height land in the first two features via feature_norm
        feats = real_decoder(pay, "image/ppm")
        assert feats[0] == 96 and feats[1] == 40
        assert r.feature_norm == sum(x * x for x in feats)


class TestPhashDedup:
    def test_ahash_known_image(self):
        """Hand-checkable aHash: half-dark/half-bright image."""
        import numpy as np

        from ting_data_etl_spark.operators.multimodal import ahash_bits

        arr = np.zeros((48, 48, 3), dtype=np.uint8)
        arr[:, 24:, :] = 200  # right half bright
        bits = ahash_bits(arr)
        assert len(bits) == 64
        # each row of the 8x8 grid: 4 dark cells (0) then 4 bright cells
        assert bits == ("0000" + "1111") * 8

    def test_hash_is_pixel_based_not_byte_based(self):
        """Re-encoding the decoded image (new header bytes possible) must
        not change the hash — perceptual means pixels, not payload bytes."""
        from ting_data_etl_spark.operators.multimodal import (
            ahash_bits,
            decode_ppm,
            encode_ppm,
        )
        import numpy as np

        rng = np.random.default_rng(7)
        arr = rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
        pay = encode_ppm(arr)
        # a P6 with a comment in the header: same pixels, different bytes
        pay2 = b"P6\n# re-encoded\n48 48\n255\n" + arr.tobytes()
        assert pay != pay2
        assert ahash_bits(decode_ppm(pay)) == ahash_bits(decode_ppm(pay2))

    def test_planted_duplicate_collapses(self, spark, sf_dir, tmp_path):
        from ting_data_etl_spark.operators.multimodal import (
            multimodal_phash_dedup,
        )
        from ting_data_etl_spark.sources.tables import load_table

        d = load_table(spark, sf_dir, "documents")
        max_id = d.agg(F.max("doc_id")).collect()[0][0]
        base = d.limit(20)
        dup = base.limit(1).select(
            (F.col("doc_id") + max_id + 1).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        cols = [f.name for f in d.schema.fields]
        ds = str(tmp_path / "planted")
        base.select(*cols).unionByName(dup.select(*cols)).coalesce(
            1
        ).write.parquet(f"{ds}/documents.parquet")
        out = {
            r.media_id: r.keeper_id
            for r in multimodal_phash_dedup(spark, ds).collect()
        }
        orig = base.limit(1).collect()[0].doc_id
        planted = orig + max_id + 1
        assert planted in out
        assert out[planted] <= orig


class TestPhashNearDup:
    def test_complete_vs_bruteforce_under_cap(self, spark, sf_dir):
        """The banded search must return EXACTLY the brute-force
        hamming<=3 pairs that share at least one uncapped band
        (pigeonhole completeness + the documented cap semantics)."""
        from collections import Counter

        from ting_data_etl_spark.operators.multimodal import (
            PHASH_BAND_CAP,
            PHASH_BANDS,
            PHASH_GRID,
            PHASH_HAMMING_MAX,
            multimodal_phash_near_dup,
            phash_relation,
        )

        hashes = {
            r.media_id: r.phash
            for r in phash_relation(spark, sf_dir).collect()
        }
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in multimodal_phash_near_dup(spark, sf_dir).collect()
        }
        g2 = PHASH_GRID * PHASH_GRID
        w = g2 // PHASH_BANDS
        bucket = Counter()
        for h in hashes.values():
            for j in range(PHASH_BANDS):
                bucket[(j, h[j * w : (j + 1) * w])] += 1
        ids = sorted(hashes)
        want = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                ha, hb = hashes[a], hashes[b]
                d = sum(x != y for x, y in zip(ha, hb))
                if d > PHASH_HAMMING_MAX:
                    continue
                shares_uncapped = any(
                    ha[j * w : (j + 1) * w] == hb[j * w : (j + 1) * w]
                    and bucket[(j, ha[j * w : (j + 1) * w])]
                    <= PHASH_BAND_CAP
                    for j in range(PHASH_BANDS)
                )
                if shares_uncapped:
                    want[(a, b)] = d
        assert got == want
        assert got, "fixture produced no near-dup pairs"

    def test_exact_dups_are_hamming_zero_subset(self, spark, sf_dir):
        from ting_data_etl_spark.operators.multimodal import (
            multimodal_phash_dedup,
            multimodal_phash_near_dup,
        )

        near = {
            (r.id_a, r.id_b): r.hamming
            for r in multimodal_phash_near_dup(spark, sf_dir).collect()
        }
        for r in multimodal_phash_dedup(spark, sf_dir).collect():
            pair = (min(r.keeper_id, r.media_id), max(r.keeper_id, r.media_id))
            # keeper pairs share the hash exactly -> hamming 0 in the
            # near-dup relation (unless the shared band bucket is capped,
            # impossible for the tiny fixture)
            assert near.get(pair) == 0, (pair, near.get(pair))
