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
