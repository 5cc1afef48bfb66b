import os, sys, traceback
sys.path.insert(0, "/root/repo")
from mongodb_iceberg_sync_spark.session import get_spark
from mongodb_iceberg_sync_spark.registry import all_specs

spark = get_spark(app_name="empty-sweep", master="local[8]", shuffle_partitions=8)
src = "/root/testdata/sf0.001"
dst = "/tmp/mis_empty_sf"
os.makedirs(dst, exist_ok=True)
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    out = f"{dst}/{t}.parquet"
    if not os.path.exists(out):
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(out)

ok, failed = [], []
for name, spec in all_specs().items():
    try:
        n = spec.func(spark, dst).count()
        ok.append((name, n))
    except Exception as e:
        failed.append((name, type(e).__name__, str(e).split("\n")[0][:120]))
print(f"ok: {len(ok)}  failed: {len(failed)}")
for f in failed:
    print("FAIL", *f)
sys.exit(1 if failed else 0)
