#!/usr/bin/env python
"""Run one end-to-end validation at a given parallelism; print JSON.

Usage: python BENCH/_validate_once.py <docs_parquet> <catalog_parquet> <cpus>
Run in a fresh process so each parallelism level gets its own JVM.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    docs_path, cat_path, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sys.path.insert(0, ".")
    from automatic_data_validator_spark.session import get_spark
    from automatic_data_validator_spark.validate import run_validation

    spark = get_spark(f"advs-scale-{cpus}", parallelism=cpus,
                      shuffle_partitions=max(cpus * 2, 64))
    docs = spark.read.parquet(docs_path)
    catalog = spark.read.parquet(cat_path)
    n_docs = docs.count()  # warm the file listing; not part of timed run

    t0 = time.perf_counter()
    res = run_validation(spark, docs, catalog=catalog, with_profile=True)
    # production sink: write all outputs (each violation plan runs once)
    out = docs_path.rstrip("/") + f"_out{cpus}"
    res.violations.write.mode("overwrite").parquet(out + "/violations")
    res.verdicts.write.mode("overwrite").parquet(out + "/verdicts")
    res.metrics.write.mode("overwrite").parquet(out + "/metrics")
    res.lineage.write.mode("overwrite").parquet(out + "/lineage")
    dt = time.perf_counter() - t0
    n_viol = spark.read.parquet(out + "/violations").count()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": n_docs,
                "seconds": round(dt, 3),
                "docs_per_sec": round(n_docs / dt, 1),
                "violation_rows": n_viol,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
