"""Fuzz the header-scanning CSV reader against a pure-Python reference parse.

The generator half of the reference's property-testing strategy (SURVEY §5.3):
seeded messy corpora (meta rows, alias headers, sentinels, ragged rows,
quoted commas, keyless files) are read by the distributed S3 reader and
compared cell-for-cell with ``csv.reader``'s view of the same file.
"""

from __future__ import annotations

import csv
import os
import shutil
import tempfile

import pytest

from ting_data_etl_spark.functions.cleaning import ensure_col
from ting_data_etl_spark.sources.csv import filter_valid_keys, read_messy_csv
from ting_data_etl_spark.sources.csv_gen import (
    MONTH_ALIASES,
    NAME_ALIASES,
    generate_messy_csvs,
)

KEY = "store_id"


@pytest.fixture(scope="module")
def corpus():
    out = os.path.join(tempfile.gettempdir(), "ting_csv_fuzz")
    shutil.rmtree(out, ignore_errors=True)
    return generate_messy_csvs(out, n_files=8, seed=7, keyless_every=4)


def _python_reference_parse(path: str, key_col: str):
    """The reference algorithm (fan_out_by_storeid.py:16-30): scan to the
    header row containing the key column; everything after = data rows."""
    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    for i, row in enumerate(rows):
        if any(c.strip() == key_col for c in row):
            return row, rows[i + 1 :]
    return None, []


class TestMessyReaderFuzz:
    def test_matches_python_reference_on_every_file(self, spark, corpus):
        for path in corpus:
            header, data = _python_reference_parse(path, KEY)
            res = read_messy_csv(spark, path, key_col=KEY)
            if header is None:
                assert res.skipped and res.df.count() == 0
                continue
            assert res.skipped is False
            # header = stripped cells, deduplicated with _N suffixes
            seen: dict[str, int] = {}
            expect_header = []
            for c in (c.strip() for c in header):
                n = seen.get(c, 0)
                seen[c] = n + 1
                expect_header.append(c if n == 0 else f"{c}_{n + 1}")
            assert res.header == expect_header
            got = res.df.collect()
            assert len(got) == len(data)
            # cell-level compare on the key column and first data column
            key_idx = [c.strip() for c in header].index(KEY)
            expect_keys = sorted(
                (r[key_idx] if key_idx < len(r) else None) or "" for r in data
            )
            got_keys = sorted(r[res.header[key_idx]] or "" for r in got)
            assert got_keys == expect_keys

    def test_meta_rows_preserved_as_sidecar(self, spark, corpus):
        for path in corpus:
            header, _ = _python_reference_parse(path, KEY)
            if header is None:
                continue
            res = read_messy_csv(spark, path, key_col=KEY)
            with open(path, newline="", encoding="utf-8") as f:
                raw_rows = list(csv.reader(f))
            n_meta = raw_rows.index(header)
            assert res.meta_rows == raw_rows[:n_meta]

    def test_blank_key_guard(self, spark, corpus):
        for path in corpus:
            res = read_messy_csv(spark, path, key_col=KEY)
            if res.skipped:
                continue
            kept = filter_valid_keys(res.df, KEY)
            assert kept.filter(
                (res.df[KEY].isNull()) | (res.df[KEY] == "")
            ).count() == 0

    def test_ensure_col_resolves_generated_aliases(self, spark, corpus):
        for path in corpus:
            res = read_messy_csv(spark, path, key_col=KEY)
            if res.skipped:
                continue
            if any(c.strip() in MONTH_ALIASES for c in res.header):
                assert ensure_col(res.header, ["月份", *MONTH_ALIASES])
            if any(c.strip() in [a.strip() for a in NAME_ALIASES] for c in res.header):
                assert ensure_col(res.header, ["門市名稱", *NAME_ALIASES])


class TestLoudFailures:
    def test_rejects_multi_file_path(self, spark):
        with pytest.raises(ValueError, match="single file"):
            read_messy_csv(spark, tempfile.gettempdir(), key_col=KEY)

    def test_rejects_quoted_newline_in_prefix(self, spark):
        path = os.path.join(tempfile.gettempdir(), "ting_bad_prefix.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow(["meta", "line one\nline two"])  # quoted newline
            w.writerow([KEY, "v"])
            w.writerow(["s1", "1"])
        with pytest.raises(ValueError, match="meta/header prefix"):
            read_messy_csv(spark, path, key_col=KEY)

    def test_rejects_quoted_newline_in_data(self, spark):
        path = os.path.join(tempfile.gettempdir(), "ting_bad_data.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow([KEY, "v"])
            w.writerow(["s1", "multi\nline cell"])
        with pytest.raises(ValueError, match="multiLine"):
            read_messy_csv(spark, path, key_col=KEY)

    def test_duplicate_headers_deduplicated(self, spark):
        path = os.path.join(tempfile.gettempdir(), "ting_dup_hdr.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            f.write(f"{KEY},a,a\ns1,1,2\n")
        res = read_messy_csv(spark, path, key_col=KEY)
        assert res.header == [KEY, "a", "a_2"]
        row = res.df.collect()[0]
        assert (row["a"], row["a_2"]) == ("1", "2")

    def test_dedup_never_collides_with_real_header(self, spark):
        # 'a,a,a_2': the generated alias for the second 'a' must not
        # collide with the real 'a_2' column
        path = os.path.join(tempfile.gettempdir(), "ting_dup_hdr2.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            f.write(f"{KEY},a,a,a_2\ns1,1,2,3\n")
        res = read_messy_csv(spark, path, key_col=KEY)
        assert len(set(res.header)) == len(res.header)
        row = res.df.collect()[0]
        assert (row["a"], row["a_2"], row["a_2_2"]) == ("1", "2", "3")

    def test_bare_quote_in_unquoted_cell_accepted(self, spark):
        # an inch mark inside an unquoted cell is literal text to every
        # CSV parser; the torn-record sweep must not reject it
        path = os.path.join(tempfile.gettempdir(), "ting_inch.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            f.write(f'{KEY},item,qty\nS001,5" pipe,10\n')
        res = read_messy_csv(spark, path, key_col=KEY)
        assert res.df.collect()[0]["item"] == '5" pipe'

    def test_truncated_scan_does_not_accept_partial_header(self, spark):
        # the header straddles the scan boundary: a partial last line must
        # not be parsed as the header (losing trailing columns silently)
        path = os.path.join(tempfile.gettempdir(), "ting_trunc.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            f.write("meta,row\n")
            f.write(f"{KEY},month,amount\n")
            f.write("s1,1,100\n")
        # scan bound cuts inside 'amount' -> header line is incomplete
        cut = open(path, "rb").read().index(b"amou") + 2
        with pytest.warns(UserWarning, match="skipped"):
            res = read_messy_csv(spark, path, key_col=KEY, max_scan_bytes=cut)
        assert res.skipped

    def test_backtick_header_cell(self, spark):
        path = os.path.join(tempfile.gettempdir(), "ting_backtick.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            f.write(f"{KEY},price`usd\ns1,7\n")
        res = read_messy_csv(spark, path, key_col=KEY)
        assert res.df.collect()[0]["price`usd"] == "7"


class TestNonUtf8RoundTrip:
    """Round-7 (VERDICT r6 missing #4): the reference's ``--encoding``
    parameter (fan_out_by_storeid.py:57) exercised end to end with the
    charsets its Chinese-BI provenance actually ships — big5/cp950 messy
    exports with Chinese meta rows, headers and values must parse correctly
    in the DISTRIBUTED data path (not just the driver header scan) and
    fan back out byte-identical in the same charset."""

    KEY = "門市編號"
    META = [
        ["報表名稱", "門市月報,含 \"加盟\" 店"],
        ["產出日期", "2026-01-15"],
    ]
    HEADER = ["門市編號", " 門市名稱 ", "月份", "銷售金額"]
    DATA = [
        ["S001", "台北旗艦店", "202512", "1,234,567"],
        ["S002", "高雄夢時代店", "202512", "987,654"],
        ["S001", "台北旗艦店", "202511", "1,111,111"],
        ["S003", "台中逢甲店", "202512", ""],
    ]

    def _write_src(self, path: str, enc: str) -> None:
        with open(path, "w", newline="", encoding=enc) as f:
            w = csv.writer(f)
            for r in self.META:
                w.writerow(r)
            w.writerow(self.HEADER)
            for r in self.DATA:
                w.writerow(r)

    @pytest.mark.parametrize("enc", ["big5", "cp950", "utf-8"])
    def test_read_fanout_reread_round_trip(self, spark, enc, tmp_path):
        from ting_data_etl_spark.sinks.fanout import write_fanout_per_store_csv

        src = str(tmp_path / f"src_{enc}.csv")
        self._write_src(src, enc)

        res = read_messy_csv(spark, src, key_col=self.KEY, encoding=enc)
        assert not res.skipped
        assert res.meta_rows == self.META
        assert res.raw_header == self.HEADER
        assert res.header == [c.strip() for c in self.HEADER]

        rows = sorted(
            ([v for v in r] for r in res.df.collect()),
            key=lambda r: (r[0] or "", r[2] or ""),
        )
        want = sorted(
            ([c if c != "" else None for c in r] for r in self.DATA),
            key=lambda r: (r[0] or "", r[2] or ""),
        )
        assert rows == want, f"{enc}: distributed data path mangled values"

        out_dir = str(tmp_path / f"out_{enc}")
        receipts = write_fanout_per_store_csv(
            res.df,
            out_dir,
            self.KEY,
            "月報.csv",
            res.header,
            res.meta_rows,
            res.raw_header,
            encoding=enc,
        ).collect()
        assert {r.group_key for r in receipts} == {"S001", "S002", "S003"}

        # byte-identical prefix re-emission in the SOURCE charset
        import io

        buf = io.StringIO()
        w = csv.writer(buf)
        for r in self.META:
            w.writerow(r)
        w.writerow(self.HEADER)
        expect_prefix = buf.getvalue().encode(enc)
        for r in receipts:
            raw = open(os.path.join(out_dir, r.group_key, "月報.csv"), "rb").read()
            assert raw.startswith(expect_prefix), f"{enc}/{r.group_key}: prefix"

        # re-read one fanned-out file through the same charset-aware reader
        back = read_messy_csv(
            spark,
            os.path.join(out_dir, "S001", "月報.csv"),
            key_col=self.KEY,
            encoding=enc,
        )
        got = sorted(tuple(r) for r in back.df.collect())
        assert got == sorted(
            tuple(c if c != "" else None for c in r)
            for r in self.DATA
            if r[0] == "S001"
        )

    def test_rejects_line_unsafe_encoding(self, spark, tmp_path):
        src = str(tmp_path / "u16.csv")
        self._write_src(src, "utf-16")
        with pytest.raises(ValueError, match="line-split-safe"):
            read_messy_csv(spark, src, key_col=self.KEY, encoding="utf-16")

    def test_rejects_unknown_codec_with_friendly_error(self, spark, tmp_path):
        src = str(tmp_path / "x.csv")
        self._write_src(src, "utf-8")
        with pytest.raises(ValueError, match="unknown encoding"):
            read_messy_csv(spark, src, key_col=self.KEY, encoding="x-windows-950")

    def test_python_alias_reaches_jvm_as_canonical_name(self, spark, tmp_path):
        """'latin-1' is a Python alias the JVM rejects; the reader must pass
        the canonical name (iso8859-1) so gate-accepted aliases work
        end to end on the distributed non-utf-8 path."""
        src = str(tmp_path / "l1.csv")
        with open(src, "w", newline="", encoding="latin-1") as f:
            w = csv.writer(f)
            w.writerow(["rapport", "café périphérie"])
            w.writerow(["store", "name"])
            w.writerow(["S001", "Müller"])
            w.writerow(["S002", "Ångström"])
        res = read_messy_csv(spark, src, key_col="store", encoding="latin-1")
        assert [r.name for r in res.df.orderBy("store").collect()] == [
            "Müller", "Ångström"
        ]

    def test_blank_data_line_dropped_on_both_paths(self, spark, tmp_path):
        """Both charset branches must agree on blank data lines (the CSV
        reader skips them; the utf-8 text path must too)."""
        for enc in ("utf-8", "big5"):
            src = str(tmp_path / f"blank_{enc}.csv")
            self._write_src(src, enc)
            with open(src, "ab") as f:
                f.write(b"\n")  # trailing blank line in the data region
            res = read_messy_csv(spark, src, key_col=self.KEY, encoding=enc)
            assert res.df.count() == len(self.DATA), enc


class TestMetaPrefixReemission:
    """Round-6 fuzz (VERDICT r5 #8): adversarial multi-line meta prefixes —
    embedded delimiters, doubled quotes, CJK, padding — must survive the
    read → per-store fan-out round trip BYTE-IDENTICAL to the reference's
    csv.writer re-serialization (fan_out_by_storeid.py:44-47: prefix_rows
    then the raw header through the same writer the data rows use)."""

    N_SEEDS = 50

    def _expected_prefix(self, meta_rows, raw_header) -> bytes:
        import io

        buf = io.StringIO()
        w = csv.writer(buf)
        for r in meta_rows:
            w.writerow(r)
        w.writerow(raw_header)
        return buf.getvalue().encode("utf-8")

    def test_prefix_byte_identical_over_seeds(self, spark):
        from ting_data_etl_spark.sinks.fanout import write_fanout_per_store_csv
        from ting_data_etl_spark.sources.csv_gen import generate_messy_csvs

        base = os.path.join(tempfile.gettempdir(), "ting_meta_fuzz")
        shutil.rmtree(base, ignore_errors=True)
        checked_files = 0
        checked_stores = 0
        for seed in range(self.N_SEEDS):
            src = generate_messy_csvs(
                os.path.join(base, f"src_{seed}"),
                n_files=1,
                seed=seed,
                n_keys=3,
                min_rows=4,
                max_rows=8,
                keyless_every=0,
                adversarial_meta=True,
            )[0]
            res = read_messy_csv(spark, src, key_col=KEY)
            assert not res.skipped
            # sidecar capture is exact: csv.reader's own view of the prefix
            with open(src, newline="", encoding="utf-8") as f:
                raw_rows = list(csv.reader(f))
            n_meta = len(res.meta_rows)
            assert res.meta_rows == raw_rows[:n_meta]
            assert res.raw_header == raw_rows[n_meta]

            out_dir = os.path.join(base, f"out_{seed}")
            receipts = write_fanout_per_store_csv(
                res.df,
                out_dir,
                KEY,
                "data.csv",
                res.header,
                res.meta_rows,
                res.raw_header,
            ).collect()
            assert receipts, f"seed {seed}: no stores written"
            expect = self._expected_prefix(res.meta_rows, res.raw_header)
            for r in receipts:
                got = open(
                    os.path.join(out_dir, r.group_key, "data.csv"), "rb"
                ).read()
                assert got.startswith(expect), (
                    f"seed {seed} store {r.group_key}: prefix not "
                    f"byte-identical\nexpect {expect!r}\ngot    {got[:len(expect)]!r}"
                )
                checked_stores += 1
            checked_files += 1
        assert checked_files == self.N_SEEDS
        assert checked_stores >= self.N_SEEDS  # >=1 store per seeded file


class TestScanCorpusPublish:
    """The S1 scan corpus's atomic versioned publish (r14 flake fix +
    ADVICE r14 hardening): concurrent cold starts must never leave a
    window where a process that already saw _READY globs an absent dir."""

    def _read_token(self):
        import ting_data_etl_spark.plans.csv_e2e as E

        with open(os.path.join(E.SCAN_DIR, "_READY"), encoding="utf-8") as f:
            return f.read()

    def test_matching_token_is_never_swapped(self, monkeypatch):
        """A racer that publishes while we generate wins outright: our
        copy is discarded and the racer's dir (sentinel intact) stays —
        re-checked immediately before the swap, so no absent-dir window."""
        import shutil

        import ting_data_etl_spark.plans.csv_e2e as E
        import ting_data_etl_spark.sources.csv_gen as G

        shutil.rmtree(E.SCAN_DIR, ignore_errors=True)
        real_gen = G.generate_messy_csvs

        def racing_gen(out_dir, n_files, seed):
            real_gen(out_dir, n_files=n_files, seed=seed)
            # simulate the racing winner: publish a complete corpus with
            # the CURRENT token before our caller reaches the swap
            racer_tmp = E.SCAN_DIR + ".racer"
            shutil.rmtree(racer_tmp, ignore_errors=True)
            real_gen(racer_tmp, n_files=n_files, seed=seed)
            open(os.path.join(racer_tmp, "RACER_SENTINEL"), "w").close()
            os.rename(racer_tmp, E.SCAN_DIR)
            with open(
                os.path.join(E.SCAN_DIR, "_READY"), "w", encoding="utf-8"
            ) as f:
                f.write(f"v1_n8_seed{seed}")

        monkeypatch.setattr(G, "generate_messy_csvs", racing_gen)
        kept = E._stage_scan_corpus()
        assert kept, "staging returned no files"
        assert os.path.exists(
            os.path.join(E.SCAN_DIR, "RACER_SENTINEL")
        ), "winner's freshly published dir was swapped aside"
        # our loser tmp dir was cleaned up
        assert not os.path.exists(f"{E.SCAN_DIR}.tmp.{os.getpid()}")

    def test_stale_token_is_replaced(self):
        """A mismatched token (old revision / retuned seed) IS moved aside
        and replaced; steady-state calls then reuse the publish."""
        import shutil

        import ting_data_etl_spark.plans.csv_e2e as E

        shutil.rmtree(E.SCAN_DIR, ignore_errors=True)
        os.makedirs(E.SCAN_DIR)
        with open(
            os.path.join(E.SCAN_DIR, "_READY"), "w", encoding="utf-8"
        ) as f:
            f.write("v0_obsolete")
        open(os.path.join(E.SCAN_DIR, "stale.csv"), "w").close()
        kept = E._stage_scan_corpus()
        assert kept
        assert self._read_token().startswith("v1_")
        assert not os.path.exists(os.path.join(E.SCAN_DIR, "stale.csv"))
        # steady state: a second call is a no-op on the same publish
        marker = os.path.join(E.SCAN_DIR, "_READY")
        before = os.stat(marker).st_mtime_ns
        assert E._stage_scan_corpus() == kept
        assert os.stat(marker).st_mtime_ns == before
