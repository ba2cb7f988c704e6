import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import time
from stglib_spark import queries as registry
from stglib_spark.session import get_spark
QS = ["qaqc_diff_rules","ts_asof_atmos_correct","ts_burst_average","dedup_minhash_lsh",
      "dedup_token_jaccard","wave_stats_welch","coord_beam2enu","q1_pricing_summary",
      "dedup_clusters","corpus_pack_sequences","corpus_budget_sample",
      "corpus_remove_boilerplate"]
sf = "/root/repo/.tmp/sf1"
spark=get_spark("scale1"); spark.sparkContext.setLogLevel("ERROR")
registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.01").count()
for q in QS:
    fn=registry.QUERIES[q]
    fn(spark, "/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()  # warm codegen
    best=None
    for _ in range(3):
        t0=time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        dt=time.perf_counter()-t0
        best=dt if best is None else min(best,dt)
    print(f"ROW {q}: {best:.2f}", flush=True)
spark.stop()
