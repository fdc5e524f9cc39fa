"""Full-registry driver simulation at sf0.01 — the same compare the
grading driver runs (row count + column names + order-insensitive
exact values via tests/oracle_check.compare), but over EVERY
registered query, not just the 50-query sweep window.

Usage: python scripts/driver_sim.py [out.json] [sf_dir] [name ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_path = args.pop(0) if args and args[0].endswith(".json") else None
    sf = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    import duckdb

    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.session import get_spark
    from tests.oracle_check import assert_canonicalizable, compare

    spark = get_spark(extra_conf={"spark.driver.memory": "8g"})
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf, "*.parquet")):
        tbl = os.path.basename(p)[:-8]
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')"
        )
    queries = all_queries()
    names = args or list(queries)
    results: dict[str, dict] = {}
    for name in names:
        q = queries[name]
        t0 = time.time()
        rec: dict = {"ok": False, "mode": "hash"}
        try:
            df = q.fn(spark, sf)
            assert_canonicalizable(df, name)
            if q.oracle:
                stats: dict = {}
                probs = compare(df, con.sql(q.oracle), name, stats=stats)
                rec["rows"] = stats.get("n_rows")
                rec["ok"] = not probs
                rec["problems"] = probs[:3]
            else:
                rec["mode"] = "rows-only"
                rec["rows"] = df.count()
                rec["ok"] = rec["rows"] >= 0
        except Exception as e:  # noqa: BLE001
            rec["problems"] = [str(e).splitlines()[0][:200]]
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        flag = "ok" if rec["ok"] else "FAIL"
        print(f"# {name}: {flag} {rec}", flush=True)
    n_ok = sum(r["ok"] for r in results.values())
    print(f"## {n_ok}/{len(results)} green")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
