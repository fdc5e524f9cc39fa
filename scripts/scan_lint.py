"""Measure per-query file-scan counts on the optimized logical plan.

Emits JSON {query: {"scans": N, "tables": {tbl: count}}} at sf0.001 —
the measurement behind tests/test_scan_lint.py's budgets (VERDICT r9
task 3: the multi-consumer recompute class keeps reappearing because
the lint was manual).

Attribution: each `Relation [...] parquet` line is mapped to its table
by column-name prefix. Lines inside an InMemoryRelation's cached child
(treeString prints innerChildren) still count — a cached stage fills
once, but the scan exists; budgets are set on the measured plan text.

Usage: python scripts/scan_lint.py [out.json] [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from spark_hive_spark.plans.registry import all_queries  # noqa: E402
from spark_hive_spark.session import get_spark  # noqa: E402
from tests.oracle_check import scan_counts  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark(extra_conf={"spark.driver.memory": "8g"})
    results: dict[str, dict] = {}
    for name, q in all_queries().items():
        try:
            df = q.fn(spark, sf_dir)
            tables = scan_counts(df)
            results[name] = {"scans": sum(tables.values()), "tables": tables}
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e).splitlines()[0][:200]}
        print(f"# {name}: {results[name]}", flush=True)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
