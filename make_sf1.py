#!/usr/bin/env python
"""Regenerate the sf1 sidecar testdata at /tmp/testdata_sf1.

The grading driver materializes sf{0.001,0.01,0.1} only (TESTDATA.md);
the sf1 sidecar benches (BENCH_SF1*.json) run over a 10× replication
of sf0.1 built with scale_probe's replicator: facts (lineitem, orders,
events, documents, embeddings) replicate with per-replica key shifts so
key cardinality scales with the data, documents get the bijective
character-translation perturbation (replicas are NOT near-duplicates of
their originals — the corpus-wide near-dup RATE stays at the
original's), and dimensions (region/nation/customer/supplier/part)
copy through fixed, exactly how a warehouse scales.

Earlier rounds kept this script in /tmp, where it evaporated between
rounds (VERDICT r6 "what's missing" #3); it now lives in the repo.
Regenerate BEFORE any sf1 comparison — numbers from differently
generated sf1 corpora are not comparable across rounds.

Usage: python make_sf1.py [dest_dir]   (default /tmp/testdata_sf1)
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def main() -> None:
    from scale_probe import SF_DIR, _replicate
    from spendinganalysisetl_spark.session import get_spark

    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
    spark = get_spark(app_name="make_sf1")
    _replicate(spark, SF_DIR, dest, 10)
    # The rewrite invalidates any quantizer-training sample this
    # process already collected over the old files (ADVICE r8 #3) —
    # clear it so a same-process follow-up retrains on the new corpus.
    from spendinganalysisetl_spark.operators.similarity import (
        clear_sample_cache,
    )

    clear_sample_cache()
    print(f"sf1 testdata written to {dest}")
    spark.stop()


if __name__ == "__main__":
    main()
