"""One-off parameter sweep for the ANN recall tuning (round 3).

Run: python scripts/ann_sweep.py [sf_dir]
Prints recall@10 + wall time for LSH/IVF parameter combos on the
embeddings table, against the brute-force exact result.
"""
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, ".")
from kafka_cassandra_plugin_spark.operators import similarity as S  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .appName("ann-sweep")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
emb.count()
q = emb.filter(F.col("vec_id") % 10 == 0)
K = 10

exact = S.brute_force_topk(emb, q, k=K).cache()
exact.count()

print("== LSH ==")
for n_planes, n_tables, probe_h in [(6, 16, 1), (6, 12, 1), (6, 8, 2),
                                     (8, 16, 1)]:
    t0 = time.time()
    approx = S.rp_lsh_topk(emb, q, dim=64, k=K, n_planes=n_planes,
                           n_tables=n_tables, multiprobe=True,
                           probe_hamming=probe_h)
    r = S.recall_at_k(approx, exact, K)
    print(f"planes={n_planes} tables={n_tables} probe_h={probe_h}: "
          f"recall={r:.3f} t={time.time()-t0:.1f}s")

print("== IVF (spherical) ==")
for nlist, nprobe in [(16, 4), (16, 6), (16, 8), (32, 8), (32, 12), (8, 4)]:
    t0 = time.time()
    approx = S.ivf_topk(emb, q, k=K, nlist=nlist, nprobe=nprobe)
    r = S.recall_at_k(approx, exact, K)
    print(f"nlist={nlist} nprobe={nprobe}: recall={r:.3f} t={time.time()-t0:.1f}s")

spark.stop()
