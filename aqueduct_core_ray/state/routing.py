"""ST2 — the location→clusters routing cache, with expiry/invalidation.

Reference semantics (ClusterStorage.java:40-65): routing entries carry a
validity flag and an expiry; reads within the window hit the cache, an
expired or concurrently-invalidated entry is reloaded from the source of
truth before the next read. Round 1 shipped ST2 as a static closure
capture — correct within one wave, but with no between-waves refresh.

Ray-native shape: the routing table is loaded DRIVER-side (it is tiny —
the reference's is one row per store location) and broadcast once per
generation via ``ray.put``; every map task reads the current ref
zero-copy from the object store. ``get()`` is the between-waves hook:
called at wave start, it re-validates and re-broadcasts only when the
entry expired or was explicitly invalidated, so an unchanged table costs
one clock read per wave and zero data movement.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import ray


class RoutingCache:
    """Expiring, invalidatable broadcast cache for a small lookup table.

    loader:   () -> picklable table/mapping (the source-of-truth read).
    ttl_s:    validity window; <=0 means every ``get()`` reloads.
    clock:    injectable for tests.
    """

    def __init__(self, loader: Callable[[], Any], ttl_s: float = 300.0,
                 clock: Callable[[], float] = time.monotonic):
        self._loader = loader
        self._ttl_s = ttl_s
        self._clock = clock
        self._ref = None
        self._loaded_at: float | None = None
        self._valid = False
        self.version = 0            # bumps on every actual reload
        self.loads = 0              # diagnostics: loader invocations

    def _expired(self) -> bool:
        return (self._loaded_at is None
                or self._clock() - self._loaded_at >= self._ttl_s)

    def get(self) -> "ray.ObjectRef":
        """The current broadcast ref; reloads first when the entry is
        missing, expired, or invalidated (the reference's
        concurrent-invalidation path: invalidate() between two get()s
        forces the second to re-read the source of truth)."""
        if self._ref is None or not self._valid or self._expired():
            value = self._loader()
            self._ref = ray.put(value)
            self._loaded_at = self._clock()
            self._valid = True
            self.version += 1
            self.loads += 1
        return self._ref

    def invalidate(self) -> None:
        """Mark stale (reference: the valid flag flipped by a writer);
        the broadcast stays readable for in-flight tasks — only the NEXT
        get() reloads, so running waves never see a torn table."""
        self._valid = False
