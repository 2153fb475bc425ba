"""Profile connected_components and rule_cascade at sf0.1 under
different shuffle-partition settings to isolate the r01->r02 regression."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PARTS = os.environ.get("PROF_PARTS", "64")

from aml_entity_resolution_assignment_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

spark = get_spark(
    "profile", master="local[32]",
    extra_conf={"spark.sql.shuffle.partitions": PARTS},
)
spark.sparkContext.setLogLevel("ERROR")
qs = entrymod.queries()

# warm-up: JVM codegen + python workers
qs["dedup_exact"](spark, SF_DIR).count()

for name in ("rule_cascade", "connected_components", "rule_cascade",
             "connected_components"):
    t0 = time.monotonic()
    n = qs[name](spark, SF_DIR).count()
    print(f"parts={PARTS} {name}: {n} rows in {time.monotonic()-t0:.2f}s",
          flush=True)
spark.stop()
