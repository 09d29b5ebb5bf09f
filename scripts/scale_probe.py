"""One scaling-job run in a fresh process: python scripts/scale_probe.py <cores> [advisory]"""
import sys, time

sys.path.insert(0, "/root/repo")
from morph_xr2rml_spark.plans.session import build_session
from bench import replicated_documents, materialization_job, _MEM_CONF

n = int(sys.argv[1])
advisory = sys.argv[2] if len(sys.argv) > 2 else None
conf = dict(_MEM_CONF)
if advisory:
    conf["spark.sql.adaptive.advisoryPartitionSizeInBytes"] = advisory
spark = build_session(f"probe-{n}", master=f"local[{n}]",
                      shuffle_partitions=max(n, 8), extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")
# warm: spin up python workers + JIT
materialization_job(spark, replicated_documents(spark, "/root/testdata/sf0.1", 2))
docs = replicated_documents(spark, "/root/testdata/sf0.1", 24)
t0 = time.time()
triples = materialization_job(spark, docs)
dt = time.time() - t0
print(f"RESULT cores={n} seconds={dt:.2f} triples={triples} tps={triples/dt:.0f}")
spark.stop()
