"""Driver simulation: r9 sweep window (50) + the 4 not-in-window queries at sf0.01."""
import json, sys, time, traceback
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as entry_mod
from spark_hive_spark.session import get_spark
from spark_hive_spark.plans import registry as R
from spark_hive_spark.tables import TABLES
from tests.oracle_check import compare, assert_canonicalizable

SF = "/root/testdata/sf0.01"
spark = get_spark("verify-r9", extra_conf={"spark.driver.memory": "8g"})

# 1. entry() at sf0.001
edf = entry_mod.entry(spark)
erows = edf.count()
print(f"# entry: {erows} rows, schema {[f.name for f in edf.schema.fields]}", flush=True)
assert erows >= 0

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs = entry_mod.queries()
oracles = entry_mod.oracle_sql()
names = list(R.SWEEP_PRIORITY) + [
    "multimodal_jpeg_420_decode", "snapshot_concurrent_commit_audit",
    "pipeline_image_embedding_knn", "mining_hard_negatives_ann",
]
results = {}
fails = []
for name in names:
    t0 = time.time()
    try:
        df = qs[name](spark, SF)
        assert_canonicalizable(df, name)
        if name in oracles:
            stats = {}
            probs = compare(df, con.sql(oracles[name]), name, stats)
            ok = not probs
            results[name] = {"mode": "hash", "ok": ok, "rows": stats.get("n_rows"), "s": round(time.time()-t0, 1)}
            if not ok:
                fails.append((name, probs[:3]))
        else:
            n = df.count()
            results[name] = {"mode": "rows_only", "ok": n > 0, "rows": n, "s": round(time.time()-t0, 1)}
            if n == 0:
                fails.append((name, ["0 rows"]))
    except Exception as e:
        results[name] = {"mode": "error", "ok": False, "err": str(e).split("\n")[0][:200]}
        fails.append((name, [str(e).split("\n")[0][:200]]))
    tag = "OK" if results[name]["ok"] else "FAIL"
    print(f"# {tag} {name} {results[name]}", flush=True)

ok_n = sum(1 for r in results.values() if r["ok"])
print(f"# TOTAL {ok_n}/{len(names)} ok")
for f in fails:
    print("# FAIL-DETAIL", f)
with open("/root/repo/.verify_r9_sim.json", "w") as fh:
    json.dump(results, fh)
spark.stop()
