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
answers each group with one fused device dispatch. A lone request
therefore pays at most ``max_wait_ms`` extra latency.

The flush path is PIPELINED (depth ``VQT_COALESCE_PIPELINE``, default 2):
JAX dispatch is asynchronous, so the worker tokenizes + dispatches batch
N+1 while a resolver thread is still materializing batch N's device
results and building response rows. The two phases hand the engine's
shared read lock across threads (acquired by the dispatcher, released by
the resolver) so no index mutation can move rows under in-flight candidate
indices — see DeviceVideoIndex.search_batch_fused_async. On a
remote-tunnel TPU the result fetch alone is tens of milliseconds per
flush; overlapping it with the next flush's host work converts the serving
loop from sum-of-stages to max-of-stages.

Resolution runs on a small thread POOL (``VQT_COALESCE_RESOLVERS``,
default = pipeline depth): the per-flush result fetch is latency-bound
(tens of milliseconds of transport RTT for a few hundred KB), so a
single resolver serializes one RTT per flush no matter how far ahead
the dispatcher runs — the pool overlaps the fetches so the serving
cadence is set by max(dispatch host work, fetch RTT / pool size,
device time) instead of the bare RTT. Futures are per-request and each
flush's lock hand-off is self-contained, so cross-flush resolve order
doesn't matter. On a co-located TPU host the fetch is cheap and the
extra threads simply idle.

Only FULL batches dispatch ahead. A partial batch whose window expired
waits until nothing is in flight: the in-flight flush's threads are
about to resubmit, and flushing early splits what would have been one
full batch into fragments that each pay the full per-flush cost
(tokenize bucket + dispatch + result-fetch RTT). Measured on the
engine-true serving bench at threads == width (256): eager partial
flushes collapsed the batch p50 from 256 to 45 and throughput from
2,406 to 2,111 searches/s; with the full-batch gate, closed load keeps
the non-pipelined cadence and pipelining engages exactly when offered
load exceeds the width (e.g. 512 threads at width 256 — two full
batches in flight).
"""

from __future__ import annotations

import logging
import os
import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Tuple

from video_quierer_tpu.utils import stageprof

logger = logging.getLogger(__name__)


class SearchCoalescer:
    # Width comes from EngineConfig.coalesce_width (default 64); every
    # width up to 512 is covered by a text bucket
    # (models/clip/embedder.py TEXT_BUCKETS). Wider amortizes the scan's
    # one HBM matrix read over more queries — measured 0.47 ms/query at
    # 32-way → 0.154 at 64-way over a 2M-frame corpus, and the scan
    # alone 0.135 → 0.073 ms/query going 64 → 256-way (round-3 probe).
    def __init__(self, engine, max_batch: int = 64,
                 max_wait_ms: float = 2.0,
                 pipeline_depth: int | None = None):
        self._engine = engine
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        if pipeline_depth is None:
            pipeline_depth = int(os.environ.get("VQT_COALESCE_PIPELINE",
                                                "2"))
        self.pipeline_depth = max(0, pipeline_depth)
        self._queue: "queue.Queue[Tuple[str, int, Future]]" = queue.Queue()
        self._closed = False
        self._resolve_q: "queue.Queue" = queue.Queue(
            maxsize=max(1, self.pipeline_depth))
        # pipelined flushes dispatched but not yet resolved (guarded by
        # _inflight_lock; read by the collection loop's partial-batch gate)
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        n_resolvers = int(os.environ.get("VQT_COALESCE_RESOLVERS", "0")) \
            or self.pipeline_depth
        self._resolvers = []
        if self.pipeline_depth:
            for i in range(max(1, n_resolvers)):
                t = threading.Thread(
                    target=self._resolve_loop, daemon=True,
                    name=f"search-coalescer-resolve-{i}")
                t.start()
                self._resolvers.append(t)
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="search-coalescer")
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
            while len(batch) < self.max_batch and not self._closed:
                try:
                    item = self._queue.get(timeout=self.max_wait)
                except queue.Empty:
                    # window expired: flush the partial batch only when
                    # nothing is in flight — an in-flight flush's
                    # threads are about to resubmit and fill this batch,
                    # and eager partial flushes fragment the load (see
                    # module docstring: 2,406 → 2,111 searches/s)
                    with self._inflight_lock:
                        inflight = self._inflight
                    if inflight == 0:
                        break
                    continue
                if item is None:
                    self._closed = True
                    break
                batch.append(item)
            self._process(batch)
        for _ in self._resolvers:   # let each resolver drain, then exit
            self._resolve_q.put(None)

    def _process(self, batch) -> None:
        engine = self._engine
        engine.metrics.observe("coalesced_batch_size", len(batch))
        by_k: Dict[int, List] = {}
        for query, k, fut in batch:
            by_k.setdefault(k, []).append((query, fut))
        for k, items in by_k.items():
            queries = [q for q, _ in items]
            engine.metrics.inc("searches", len(queries))
            t0 = time.perf_counter()
            # dispatch under the engine read lock; on the pipelined path
            # the RESOLVER releases it (in-flight device indices must not
            # see index rows move — utils/locks.py documents the
            # cross-thread hand-off)
            with stageprof.span("lock_wait"):
                engine.lock.acquire_read()
            try:
                resolve = (engine._dispatch_batch_fused(queries, k)
                           if self.pipeline_depth else None)
            except Exception:
                logger.exception("coalesced dispatch failed — serial path")
                resolve = None
            if resolve is None:
                # serial path (pipelining off, fused path unavailable, or
                # dispatch error): complete the batch under the lock we
                # already hold
                try:
                    batches = engine._search_batch_impl(queries, k)
                    results = [engine._format(r) for r in batches]
                    for (_, fut), res in zip(items, results):
                        fut.set_result(res)
                except Exception as e:  # propagate to all waiters
                    logger.exception("coalesced search failed")
                    for _, fut in items:
                        if not fut.done():
                            fut.set_exception(e)
                finally:
                    engine.lock.release_read()
                    engine.metrics.observe(
                        "batch_search_latency_ms",
                        (time.perf_counter() - t0) * 1000.0)
                continue
            # hand (items, read lock) to the resolver; blocks when
            # pipeline_depth flushes are already in flight
            engine.metrics.inc("pipelined_flushes")
            with self._inflight_lock:
                self._inflight += 1
            self._resolve_q.put((items, queries, k, resolve, t0))

    def _resolve_loop(self) -> None:
        engine = self._engine
        while True:
            item = self._resolve_q.get()
            if item is None:
                break
            items, queries, k, resolve, t0 = item
            try:
                try:
                    with stageprof.span("resolve"):
                        batches = resolve()
                    with stageprof.span("format"):
                        results = [engine._format(r) for r in batches]
                except Exception:
                    # exotic (dispatch already succeeded): retry the whole
                    # group serially under the lock we still hold
                    logger.exception(
                        "pipelined resolve failed — serial retry")
                    engine.metrics.inc("fused_search_fallbacks")
                    batches = engine._search_batch_impl(queries, k)
                    results = [engine._format(r) for r in batches]
                with stageprof.span("deliver"):
                    for (_, fut), res in zip(items, results):
                        fut.set_result(res)
            except Exception as e:  # propagate to all waiters
                logger.exception("coalesced resolve failed")
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
            finally:
                engine.lock.release_read()
                with self._inflight_lock:
                    self._inflight -= 1
                engine.metrics.observe(
                    "batch_search_latency_ms",
                    (time.perf_counter() - t0) * 1000.0)
