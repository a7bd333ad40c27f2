"""Dump ``.explain("formatted")`` for named registered queries to files.

Usage: python tools/explain_query.py --out plans/r15 --suffix before q [q ...]
Writes ``<out>/<query>_<suffix>.txt`` per query. The plan is captured AFTER
any staging the query performs (the query function runs to build its
DataFrame; nothing is executed beyond what the builder itself stages).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="plans/r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from ting_data_etl_spark.session import get_spark

    qs = entrymod.queries()
    spark = get_spark(app_name="ting-data-etl-explain")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    for name in args.queries:
        df = qs[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({txt.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
