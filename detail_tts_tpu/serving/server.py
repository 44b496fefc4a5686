"""Microbatching request server around :class:`TTSEngine`.

The reference has no serving layer (api.py is a one-shot script); production
TPU serving wants batched dispatch: the engine's throughput at batch 8 is
~an order of magnitude above batch 1, so concurrent requests should ride one
program launch.  This module provides the standard microbatcher:

* requests enqueue (text, prompt_wav) and get a Future;
* a single dispatch thread drains the queue, groups up to ``max_batch``
  requests — waiting at most ``max_wait_ms`` for stragglers once the first
  request of a batch arrives — and runs ONE ``synthesize_batch`` call;
* voice conditioning stays per-item deterministic (serving/pipeline.py pads
  prompts per item and masks); the sampling noise stream folds all seeds of
  the batch, so exact sample-level reproducibility needs a batch-1 direct
  engine call.

Single dispatch thread == single in-flight program per engine: the TPU is
serially occupied anyway, and jit caches are not thread-safe to grow
concurrently.  Within that one thread the loop double-buffers: batch N+1 is
prepared and DISPATCHED (all stages enqueue to the device FIFO) before batch
N's wavs are fetched, so the device never idles on host prep/D2H between
batches (``TTSEngine.dispatch_batch`` / ``finalize_batch``).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class _Request:
    text: str
    prompt_wav: np.ndarray
    seed: int
    vq_only: bool
    future: Future = field(default_factory=Future)


class TTSServer:
    """Threaded microbatching front-end for a TTSEngine.

    Usage::

        server = TTSServer(engine, max_batch=8, max_wait_ms=20)
        server.start()
        fut = server.submit("ni3 hao3", prompt_wav, seed=0)
        wav = fut.result()
        server.stop()
    """

    def __init__(self, engine, max_batch: int = 8, max_wait_ms: float = 20.0):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self.batches_dispatched = 0
        self.requests_served = 0

    # ------------------------------------------------------------------ api

    def submit(self, text: str, prompt_wav: np.ndarray, seed: int = 0,
               vq_only: bool = False) -> Future:
        """Enqueue a request; returns a Future resolving to the wav.

        Validates per-request here (raises ValueError) so one malformed
        request cannot poison a whole dispatched batch: a sub-hop prompt
        would make ``prepare_prompt`` throw inside the single batched
        engine call and fail every grouped request's future.
        """
        if not self._running:
            raise RuntimeError("server not started")
        if not isinstance(text, str) or not text.strip():
            raise ValueError("text must be a non-empty string")
        wav = np.asarray(prompt_wav, np.float32)
        if wav.ndim != 1:
            raise ValueError(f"prompt_wav must be 1-D mono, got shape "
                             f"{wav.shape}")
        hop = int(self.engine.cfg.data.hop_length)
        if wav.shape[0] < hop:
            raise ValueError(f"prompt_wav too short: {wav.shape[0]} samples "
                             f"< one hop of {hop}")
        if not np.isfinite(wav).all():
            raise ValueError("prompt_wav contains non-finite samples")
        req = _Request(text, wav, seed, vq_only)
        self._queue.put(req)
        return req.future

    def synthesize(self, text: str, prompt_wav: np.ndarray, seed: int = 0,
                   timeout: Optional[float] = None) -> np.ndarray:
        """Blocking convenience wrapper."""
        return self.submit(text, prompt_wav, seed).result(timeout=timeout)

    def start(self) -> "TTSServer":
        if self._running:
            return self
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="tts-dispatch")
        self._thread.start()
        return self

    def stop(self, timeout: float = 30.0) -> None:
        if not self._running:
            return
        self._running = False
        self._queue.put(None)  # wake the dispatcher
        if self._thread is not None:
            self._thread.join(timeout=timeout)
            self._thread = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # ------------------------------------------------------------- internals

    def _collect(self, block: bool = True) -> List[_Request]:
        """Block for the first request, then drain stragglers until the
        batch deadline (max_wait_ms after the first arrival) or max_batch.

        ``block=False`` (a dispatched batch is pending finalize): wait only
        one batching window for the first request, so the pending batch's
        futures resolve promptly when traffic pauses."""
        import time

        try:
            first = self._queue.get(
                timeout=None if block else self.max_wait_ms / 1000.0)
        except queue.Empty:
            return []
        if first is None:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait_ms / 1000.0
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)  # re-post the stop sentinel
                break
            batch.append(nxt)
        return batch

    def _loop(self) -> None:
        # Cross-batch pipelining (double-buffer): dispatch batch N+1's host
        # prep + AR decode BEFORE fetching batch N's wavs, so the device
        # FIFO never drains between batches.  Correctness is free — stages
        # are separate jit calls and the device executes them in dispatch
        # order.  The dispatch is split in two phases around batch N's
        # finalize (engine dispatch_decode / dispatch_tail): the tail's
        # decode-length host sync blocks until N+1's generate completes on
        # device, which runs AFTER all of N's queued work — finalizing N
        # first keeps the overlap without charging a whole generate stage
        # to every request's latency.
        inflight = None  # (group, InflightBatch)
        while self._running:
            batch = self._collect(block=inflight is None)
            if not batch:
                if inflight is not None:
                    self._finalize(*inflight)
                    inflight = None
                continue
            for vq_only in (False, True):
                group = [r for r in batch if r.vq_only == vq_only]
                if not group:
                    continue
                if vq_only:
                    # different pipeline (no async handle): drain first
                    if inflight is not None:
                        self._finalize(*inflight)
                        inflight = None
                    self._dispatch_vq(group)
                else:
                    pending = self._dispatch_decode(group)
                    if inflight is not None:
                        self._finalize(*inflight)
                        inflight = None
                    if pending is not None:
                        handle = self._dispatch_tail(group, pending)
                        if handle is not None:
                            inflight = (group, handle)
        if inflight is not None:
            self._finalize(*inflight)

    def _batch_rng(self, group: List[_Request]):
        import jax

        rng = jax.random.PRNGKey(len(group))
        for r in group:
            rng = jax.random.fold_in(rng, r.seed & 0x7FFFFFFF)
        return rng

    def _dispatch_decode(self, group: List[_Request]):
        """Phase 1: enqueue prep + AR decode; no host sync (PendingDecode)."""
        try:
            texts = [r.text for r in group]
            prompts = [r.prompt_wav for r in group]
            return self.engine.dispatch_decode(texts, prompts,
                                               rng=self._batch_rng(group))
        except Exception as e:
            for r in group:
                if not r.future.done():
                    r.future.set_exception(e)
            return None

    def _dispatch_tail(self, group: List[_Request], pending):
        """Phase 2: decode-length sync + diffuse/vocode dispatches."""
        try:
            return self.engine.dispatch_tail(pending)
        except Exception as e:
            for r in group:
                if not r.future.done():
                    r.future.set_exception(e)
            return None

    def _finalize(self, group: List[_Request], handle) -> None:
        try:
            outs = self.engine.finalize_batch(handle)
            # counters BEFORE resolving futures: a client unblocked by
            # set_result may read them immediately (observable-state race)
            self.batches_dispatched += 1
            self.requests_served += len(group)
            for r, wav in zip(group, outs):
                r.future.set_result(wav)
        except Exception as e:
            for r in group:
                if not r.future.done():
                    r.future.set_exception(e)

    def _dispatch_vq(self, group: List[_Request]) -> None:
        """One batched vq-only engine call for the group (gpt eval path).

        rng: all request seeds fold into one batch key.  Voice conditioning
        is per-item deterministic by construction (serving/pipeline.py), but
        the SAMPLING noise stream depends on batch composition — for exact
        (text, prompt, seed) reproducibility call the engine directly at
        batch 1.
        """
        try:
            texts = [r.text for r in group]
            prompts = [r.prompt_wav for r in group]
            outs = self.engine.synthesize_vq_batch(
                texts, prompts, rng=self._batch_rng(group))
            self.batches_dispatched += 1
            self.requests_served += len(group)
            for r, wav in zip(group, outs):
                r.future.set_result(wav)
        except Exception as e:  # per-batch failure must not kill the server
            for r in group:
                if not r.future.done():
                    r.future.set_exception(e)
