"""Driver-emulation preflight: vanilla session, sf0.01, first-50 window."""
import sys, time
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("preflight-vanilla")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
from proyecto_final_de_big_data_spark.queries import QUERIES
from proyecto_final_de_big_data_spark.oracle import run_oracle, compare

SF = "/root/testdata/sf0.01"
fails = 0
for i, (name, q) in enumerate(list(QUERIES.items())[:50], 1):
    t0 = time.perf_counter()
    try:
        df = q.spark_fn(spark, SF)
        if q.oracle is None:
            n = df.count()
            print(f"{i:3d} {name}: rows_only n={n} ({time.perf_counter()-t0:.1f}s)")
            continue
        ok, msg = compare(df, run_oracle(q.oracle, SF))
        status = "OK" if ok else "FAIL"
        if not ok: fails += 1
        print(f"{i:3d} {name}: {status} {msg if not ok else ''} ({time.perf_counter()-t0:.1f}s)")
    except Exception as e:
        fails += 1
        print(f"{i:3d} {name}: ERROR {type(e).__name__}: {str(e)[:200]}")
print("failures:", fails)
sys.exit(1 if fails else 0)
