"""Per-worker-process cache for broadcast objects.

``ray.get`` on a plasma ref is already zero-copy for numpy, but the
call itself has per-invocation overhead; stateless ``map_batches``
tasks calling it once per batch would pay that repeatedly.  This
module-level cache resolves a ref once per worker process — giving
plain tasks the same amortization an actor's ``__init__`` provides,
without paying actor-pool construction (~seconds) per pipeline stage.
"""

from __future__ import annotations

import ray

_CACHE: dict[bytes, object] = {}


def get_cached(ref: "ray.ObjectRef"):
    key = ref.binary()
    out = _CACHE.get(key)
    if out is None:
        out = ray.get(ref)
        _CACHE[key] = out
        if len(_CACHE) > 64:  # bound the cache; old broadcasts die with it
            _CACHE.pop(next(iter(_CACHE)))
    return out
