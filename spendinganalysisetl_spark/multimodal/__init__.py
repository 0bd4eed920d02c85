"""Multimodal column plumbing (north_star requirement).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs; decode/feature steps run as Arrow-batched
``mapInPandas`` operators. The codec libraries aren't in this container,
so the decode kernel is a deterministic fake behind the same interface
(clearly marked) — the Spark-side contract (schema, batch shape,
partitioning) is real and tested.
"""

from spendinganalysisetl_spark.multimodal.ops import (  # noqa: F401
    MEDIA_SCHEMA,
    extract_features,
    fake_media_table,
    ingest_media_dir,
    sample_frames,
)
