"""Count Spark jobs per declared catalog query (guide §1: structural
evidence — job counts are deterministic under host contention where
wall-clock is not).

Usage: python tools/job_counts.py [query ...]   (default: all)
Prints `name jobs wall_s` per query in catalog order, running each
query once in one warm session with the noop sink.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from databricks_delta_lake_project_spark.queries.catalog import (
    PRODUCTION_OVERRIDES,
    QUERIES,
)
from databricks_delta_lake_project_spark.session import get_spark


def main() -> None:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="job_counts")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the session the way bench.py does
    try:
        list(QUERIES.values())[0][0](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:  # noqa: BLE001
        pass

    for name, (fn, _) in QUERIES.items():
        if only and name not in only:
            continue
        fn = PRODUCTION_OVERRIDES.get(name, fn)
        jobs0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        jobs1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        print(f"{name} {jobs1 - jobs0} {wall:.2f}", flush=True)


if __name__ == "__main__":
    main()
