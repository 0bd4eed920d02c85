#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Design notes (SURVEY.md §6):
- ONE SparkSession reused across all queries — JVM startup would
  otherwise dominate at sf0.1.
- Each plan is executed via the ``noop`` sink: full execution of every
  operator without driver-side result serialization, so the timing is
  the distributed plan, not ``collect()`` overhead.
- A warm-up query is run (untimed) to absorb first-job costs (codegen
  compilation, parquet footer reads, block-manager init) that a
  long-running cluster would amortize.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def _execute(df) -> None:
    """Run the whole plan without shipping rows to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from spendinganalysisetl_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench", cpus=CPUS)
    qs = entrymod.queries()

    # Warm-up: one cheap aggregate per table touches the IO + scan-codegen
    # paths (parquet footers, vectorized reader setup, block-manager init)
    # that a long-running cluster amortizes across queries.
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        _execute(spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).groupBy().count())

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        _execute(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
