"""Small runtime helpers."""

from __future__ import annotations

from typing import Any, Callable

# Per-worker-process object cache: lets a *task-based* map_batches stage
# amortize cheap construction (compiled hashers, color tables) the way an
# actor's __init__ would, while keeping Ray free to schedule the stage as
# ordinary fused tasks on warm workers.  Use actors instead when the
# state is genuinely heavy (broadcast geometry, models, indexes).
_PROCESS_CACHE: dict[Any, Any] = {}
_PROCESS_CACHE_MAX = 64  # bounded: per-run keys (ObjectRef-derived) would
# otherwise accumulate one state object per historical job in every
# long-lived worker process


def process_cached(key: Any, factory: Callable[[], Any]) -> Any:
    obj = _PROCESS_CACHE.get(key)
    if obj is None:
        obj = factory()
        while len(_PROCESS_CACHE) >= _PROCESS_CACHE_MAX:
            _PROCESS_CACHE.pop(next(iter(_PROCESS_CACHE)))  # evict oldest
        _PROCESS_CACHE[key] = obj
    else:
        # refresh LRU position
        _PROCESS_CACHE.pop(key, None)
        _PROCESS_CACHE[key] = obj
    return obj


def narrow_partials(ds, blocks: int | None = None):
    """Coalesce pre-aggregated partial blocks before a bounded-key
    groupby.

    A combiner (`map_batches` partial aggregate) emits one small block
    per input block; the sort exchange behind ``groupby`` then pays a
    fixed cost per (in-block, out-block) pair while the key-space is
    only a few thousand values.  Coalescing the partials to
    ~cpus/2 blocks keeps the merge parallel but removes the dead
    exchange width — same lever as the bundled-distinct ledger
    (``stages/distinct.py``: 2.45 s -> 1.85 s at sf0.1).  Only use on
    PARTIAL tables whose row count is (blocks x keys)-scale, never on
    row-scale data.
    """
    if blocks is None:
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 16))
        except Exception:  # pragma: no cover - no cluster yet
            cpus = 16
        blocks = max(8, cpus // 2)
    return ds.repartition(blocks, shuffle=False)
