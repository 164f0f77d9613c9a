"""Request coalescing: concurrent searches merge into one device pass.

Rebuilds the dead path's ``BatchProcessor`` (src/core/feature_extractor.py:
261-354 — futures-based coalescing with size/timeout flush, which the live
path never used) as a serving-side feature: concurrent ``/api/search``
requests that arrive within a small window are batched into a single
text-encode + fused-scan device call. On TPU this is close to free — the
scan cost is dominated by the one HBM read of the matrix, which a batch of
queries shares.

Design: a daemon worker blocks on a queue; on wake it drains up to
``max_batch`` requests for up to ``max_wait_ms``, groups them by ``k``, and
answers each group with one ``engine.search_batch`` call. A lone request
therefore pays at most ``max_wait_ms`` extra latency.
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import Future
from typing import Dict, List, Tuple

logger = logging.getLogger(__name__)


class SearchCoalescer:
    # Width comes from EngineConfig.coalesce_width (default 64); every
    # width up to 512 is covered by a text bucket
    # (models/clip/embedder.py TEXT_BUCKETS). Wider amortizes the scan's
    # one HBM matrix read over more queries — measured 0.47 ms/query at
    # 32-way → 0.154 at 64-way over a 2M-frame corpus, and the scan
    # alone 0.135 → 0.073 ms/query going 64 → 256-way (round-3 probe).
    def __init__(self, engine, max_batch: int = 64,
                 max_wait_ms: float = 2.0):
        self._engine = engine
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._queue: "queue.Queue[Tuple[str, int, Future]]" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="search-coalescer")
        self._closed = False
        self._worker.start()

    def close(self) -> None:
        self._closed = True
        self._queue.put(None)  # wake the worker

    # ------------------------------------------------------------------

    def search_ex(self, query: str, k: int = 5, use_cache: bool = True
                  ) -> Tuple[List[Dict], bool]:
        """Blocking search through the coalescing path; returns
        ``(results, from_cache)``."""
        engine = self._engine
        cache_on = use_cache and engine.config.api.cache_search
        if cache_on:
            hit = engine.query_cache.get_text(query, k)
            if hit is not None:
                engine.metrics.inc("search_cache_hits")
                engine.metrics.inc("searches")
                return [dict(r) for r in hit], True
        fut: Future = Future()
        self._queue.put((query, k, fut))
        results = fut.result()
        if cache_on:
            engine.query_cache.put_text(query, k,
                                        [dict(r) for r in results])
        return results, False

    def search(self, query: str, k: int = 5, use_cache: bool = True
               ) -> List[Dict]:
        return self.search_ex(query, k, use_cache)[0]

    # ------------------------------------------------------------------

    def _run(self) -> None:
        while not self._closed:
            try:
                first = self._queue.get(timeout=1.0)
            except queue.Empty:
                continue
            if first is None:
                break
            batch = [first]
            deadline = self.max_wait
            try:
                while len(batch) < self.max_batch:
                    item = self._queue.get(timeout=deadline)
                    if item is None:
                        self._closed = True
                        break
                    batch.append(item)
            except queue.Empty:
                pass
            self._process(batch)

    def _process(self, batch) -> None:
        engine = self._engine
        engine.metrics.observe("coalesced_batch_size", len(batch))
        by_k: Dict[int, List] = {}
        for query, k, fut in batch:
            by_k.setdefault(k, []).append((query, fut))
        for k, items in by_k.items():
            queries = [q for q, _ in items]
            try:
                results = engine.search_batch(queries, k=k)
                for (_, fut), res in zip(items, results):
                    fut.set_result(res)
            except Exception as e:  # propagate to all waiters
                logger.exception("coalesced search failed")
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
