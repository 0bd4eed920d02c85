"""Per-operator hot-intermediate cache registry.

Operators that RETURN lazy plans over an internally persisted
intermediate cannot unpersist it before the caller executes — and an
eager checkpoint materializes the intermediate outside the final-stage
path (measured 2.5× slower for PageRank). So each such operator pins
its LAST call's caches here and releases them on the next call with
DIFFERENT inputs:

- same inputs (``sameSemantics`` on every key frame): Spark's
  CacheManager dedups the new ``persist`` onto the existing entry, so
  nothing is released and repeat invocations stay warm;
- different inputs: every previous entry is released first — EXCEPT a
  previous frame whose plan survives into the new call (sameSemantics
  with a new cache): the new persist deduped onto the same CacheManager
  entry, so unpersisting the old handle would evict the new pin too
  (e.g. one edge cache under a seeds loop, or under bfs_reach_report ↔
  bfs_reach_deep alternation).

Net: at most ONE input set pinned per operator key instead of
accumulating per bench/catalog invocation. ``sameSemantics`` is TRUE
for two separate ``spark.read.parquet(same path)`` plans but FALSE for
two separate ``createDataFrame`` calls with identical rows — the
dedup reasoning only holds for file-backed (or shared-object) plans.
Not thread-safe — matches the one-session bench/driver model; call
sites interleaving inputs across threads should unpersist explicitly.
"""

from __future__ import annotations

_LAST_CACHES: dict[str, tuple[list, list]] = {}


def swap_caches(op: str, keys: list, new: list) -> None:
    """Pin ``new`` caches for operator ``op``; release the previous
    call's caches unless the inputs (``keys``) are plan-identical."""
    prev = _LAST_CACHES.get(op)
    if prev is not None:
        prev_keys, prev_caches = prev
        try:
            same = len(prev_keys) == len(keys) and all(
                p.sameSemantics(k) for p, k in zip(prev_keys, keys)
            )
        except Exception:
            same = False
        if not same:
            for c in prev_caches:
                try:
                    # Shared-plan guard: a prev cache that is
                    # sameSemantics with a NEW cache occupies the same
                    # CacheManager entry the new call just re-pinned —
                    # skip it (see module docstring).
                    if any(c.sameSemantics(n) for n in new):
                        continue
                except Exception:
                    pass
                try:
                    c.unpersist()
                except Exception:
                    pass
    _LAST_CACHES[op] = (keys, new)
