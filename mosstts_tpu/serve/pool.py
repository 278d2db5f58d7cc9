"""Serving pool: concurrent request threads -> one continuous-batching
server.

The HTTP front end (serve/http_server.py) is a ThreadingHTTPServer; without
a pool every concurrent /tts request runs its own solo batch-1 generate —
the chip time-slices between them. The pool gives the process ONE
DelayBatchServer and a background decode thread; request threads submit and
block on a completion event, so concurrent requests share batch slots
(mid-flight admission, per-request sampling) instead of competing.

``DelayServingPool.generate`` is engine-signature-compatible (same args,
same [(start_length, tokens)] return), so serve/pipelines._generate_and_
decode uses it as a drop-in engine replacement when the backend carries a
pool (http_server --pool-slots).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np


class DelayServingPool:
    """Thread-safe façade over DelayBatchServer.

    One background thread owns the decode loop; any number of request
    threads call :meth:`generate`. All server mutation happens under one
    lock — JAX dispatch itself is quick (enqueue), so the lock is held for
    host bookkeeping plus dispatch, never for device round-trips beyond the
    server's own poll cadence.
    """

    def __init__(self, params, config, *, slots: int = 4, idle_wait: float = 0.02,
                 **server_kw):
        from ..engine.batch_server import DelayBatchServer

        self.server = DelayBatchServer(params, config, slots=slots, **server_kw)
        self._lock = threading.Lock()
        self._results: Dict[int, object] = {}
        self._events: Dict[int, threading.Event] = {}
        self._abandoned: set = set()  # timed-out rids; results dropped on arrival
        self._wake = threading.Event()
        self._stop = False
        self._error: Optional[BaseException] = None
        self._idle_wait = idle_wait
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="mosstts-serving-pool")
        self._thread.start()

    def supports(self, *, text_top_k: int, audio_top_k: int) -> bool:
        """top-k widths are SERVER-STATIC compile knobs (one program per
        width); a request needing different widths must use the solo
        engine — pipelines falls back automatically."""
        return (text_top_k == self.server.top_k_text
                and audio_top_k == self.server.top_k_audio)

    # ------------------------------------------------------------------
    def warmup(self, **kw):
        with self._lock:
            self.server.warmup(**kw)

    def close(self):
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------
    def _loop(self):
        while not self._stop:
            try:
                with self._lock:
                    busy = bool(self.server._active or self.server._queue)
                    # one poll window per dispatch (step_block): per-step
                    # dispatch pays the fixed launch floor every step and
                    # caps pool throughput at slots/floor (measured 34 ms vs
                    # the ~3 ms device-bound step at 16 slots)
                    done = self.server.step_block() if busy else []
            except BaseException as e:  # noqa: BLE001 - surfaced to callers
                # a dead decode thread must FAIL every pending and future
                # generate() loudly, not hang them on their events forever.
                # Under _lock so a generate() registering events either sees
                # _error right after registering or gets its events set here.
                with self._lock:
                    self._error = e
                    for ev in list(self._events.values()):
                        ev.set()
                    self._events.clear()
                return
            for c in done:
                with self._lock:
                    if c.request_id in self._abandoned:
                        self._abandoned.discard(c.request_id)
                        continue  # waiter timed out; drop, don't leak
                    self._results[c.request_id] = c
                    ev = self._events.pop(c.request_id, None)
                if ev is not None:
                    ev.set()
            if not busy:
                self._wake.wait(self._idle_wait)
                self._wake.clear()

    # ------------------------------------------------------------------
    def generate(
        self,
        input_ids: np.ndarray,  # (B, T, C) left-padded
        attention_mask: Optional[np.ndarray] = None,
        *,
        max_new_tokens: int = 1000,
        text_temperature: float = 1.5,
        text_top_p: float = 1.0,
        text_top_k: int = 50,  # must match the pool's server-static widths
        audio_top_k: int = 25,  # (see supports(); pipelines gates on it)
        audio_temperature: float = 1.7,
        audio_top_p: float = 0.8,
        audio_repetition_penalty: float = 1.0,
        audio_rp_cross_batch: bool = False,
        seed: int = 0,  # folded into each row's request rng (reproducible)
        on_device: bool = False,  # accepted for parity; pool decode is stepwise
        poll_every: int = 8,
        timeout: Optional[float] = None,
    ) -> List[Tuple[int, np.ndarray]]:
        """Engine-compatible batched generate THROUGH the shared pool: each
        row becomes one pool request (its left-pads stripped — the server
        re-pads to its prompt bucket), carrying this call's sampling as its
        per-request config. Blocks until all rows complete.

        ``seed`` is folded into each row's rng as hash((seed, row)) so a
        seeded pool call reproduces across calls/process restarts like the
        solo engine (the server would otherwise derive rng from its
        monotonically increasing request id)."""
        del on_device, poll_every
        if not self.supports(text_top_k=text_top_k, audio_top_k=audio_top_k):
            raise ValueError(
                f"pool compiled with top_k=({self.server.top_k_text}, "
                f"{self.server.top_k_audio}) but the request asked "
                f"({text_top_k}, {audio_top_k}); use the solo engine "
                "(pipelines falls back automatically)")
        if audio_rp_cross_batch:
            raise ValueError(
                "audio_rp_cross_batch ties rows of ONE batch together; pool "
                "requests are independent — use the solo engine for exact-"
                "reference repetition-penalty runs")
        input_ids = np.asarray(input_ids, np.int64)
        B, T, C = input_ids.shape
        if attention_mask is None:
            attention_mask = np.ones((B, T), bool)
        sampling = dict(
            text_temperature=text_temperature, text_top_p=text_top_p,
            audio_temperature=audio_temperature, audio_top_p=audio_top_p,
            audio_repetition_penalty=audio_repetition_penalty,
        )
        rids, events = [], []
        with self._lock:
            if self._error is not None:
                raise RuntimeError(
                    "serving pool decode thread died") from self._error
            for b in range(B):
                valid = np.nonzero(attention_mask[b])[0]
                grid = input_ids[b, valid[0]:] if len(valid) else input_ids[b, -1:]
                rid = self.server.submit(grid, max_new_tokens=max_new_tokens,
                                         sampling=sampling,
                                         seed=hash((seed, b)) & 0x7FFFFFFF)
                ev = threading.Event()
                self._events[rid] = ev
                rids.append(rid)
                events.append(ev)
        self._wake.set()
        for ev in events:
            if not ev.wait(timeout):
                # unregister the whole call so late results are dropped in
                # _loop instead of leaking in _results/_events forever (the
                # requests still run to completion server-side — slots free
                # naturally at their max_new_tokens bound)
                with self._lock:
                    for rid in rids:
                        if self._events.pop(rid, None) is not None or \
                                self._results.pop(rid, None) is None:
                            self._abandoned.add(rid)
                raise TimeoutError("pool generate timed out")
        if self._error is not None:
            raise RuntimeError("serving pool decode thread died") from self._error
        out = []
        for rid in rids:
            c = self._results.pop(rid)
            out.append((c.start_length, c.tokens))
        return out


class RealtimeStreamHandle:
    """Consumer side of one pooled streaming conversation: iterate
    :meth:`frames` to receive np.ndarray frame blocks as they decode;
    iteration ends when the conversation completes. :meth:`result` blocks
    and returns all frames concatenated (solo-engine-shaped)."""

    def __init__(self, request_id: int):
        self.request_id = request_id
        self._q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue()
        self._emitted = 0  # frames already shipped (pool-thread side)
        self._error: Optional[BaseException] = None

    def frames(self, timeout: Optional[float] = None):
        while True:
            try:
                block = self._q.get(timeout=timeout)
            except queue.Empty:
                raise TimeoutError(
                    f"no frame within {timeout}s (stream "
                    f"{self.request_id})") from None
            if block is None:
                if self._error is not None:
                    raise RuntimeError(
                        "realtime pool decode thread died") from self._error
                return
            yield block

    def result(self, timeout: Optional[float] = None) -> np.ndarray:
        blocks = list(self.frames(timeout=timeout))
        if not blocks:
            return np.zeros((0, 0), np.int64)
        return np.concatenate(blocks, axis=0)


class RealtimeServingPool:
    """Concurrent HTTP /stream sessions share ONE RealtimeBatchServer: each
    stream becomes a pool conversation (mid-flight admission, per-request
    sampling), and frames ship incrementally through
    RealtimeBatchServer.partial_frames() — wav chunks start flowing while
    the conversation is still decoding, at continuous-batching throughput
    instead of a solo engine per HTTP thread.
    """

    def __init__(self, params, config, *, slots: int = 4,
                 fetch_every: int = 4, idle_wait: float = 0.02, **server_kw):
        from ..engine.realtime_batch_server import RealtimeBatchServer

        self.server = RealtimeBatchServer(params, config, slots=slots,
                                          **server_kw)
        self.fetch_every = max(1, fetch_every)
        self._lock = threading.Lock()
        self._handles: Dict[int, RealtimeStreamHandle] = {}
        self._wake = threading.Event()
        self._stop = False
        self._error: Optional[BaseException] = None
        self._idle_wait = idle_wait
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="mosstts-rt-pool")
        self._thread.start()

    def supports(self, *, top_k: int) -> bool:
        """top-k is a SERVER-STATIC compile knob; a stream needing a
        different width must use the solo session (http_server falls back
        automatically)."""
        return top_k == self.server.top_k

    def warmup(self, **kw):
        with self._lock:
            self.server.warmup(**kw)

    def close(self):
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=5)
        # release any consumer still blocked in frames(): the loop thread
        # is gone, so no sentinel would ever arrive. Mark the stream as
        # errored — it is truncated, not complete.
        with self._lock:
            for h in self._handles.values():
                if h._error is None:
                    h._error = RuntimeError("pool closed mid-stream")
                h._q.put(None)
            self._handles.clear()

    # ------------------------------------------------------------------
    def open_stream(self, grid: np.ndarray, text_ids, *,
                    max_new_tokens: int = 128, prefill_text_len: int = 12,
                    sampling: Optional[dict] = None) -> RealtimeStreamHandle:
        """Submit one conversation turn; returns a handle whose
        :meth:`RealtimeStreamHandle.frames` yields frame blocks live."""
        with self._lock:
            if self._error is not None:
                raise RuntimeError(
                    "realtime pool decode thread died") from self._error
            rid = self.server.submit(
                grid, list(text_ids), max_new_tokens=max_new_tokens,
                prefill_text_len=prefill_text_len, sampling=sampling)
            handle = RealtimeStreamHandle(rid)
            self._handles[rid] = handle
        self._wake.set()
        return handle

    def cancel(self, handle: RealtimeStreamHandle) -> bool:
        """Abort a pooled stream (client disconnected): frees the server
        slot immediately instead of decoding the abandoned conversation to
        its frame budget. Idempotent; safe against the conversation
        completing concurrently."""
        with self._lock:
            found = self.server.cancel(handle.request_id)
            if self._handles.pop(handle.request_id, None) is not None:
                handle._q.put(None)  # release a consumer blocked in frames()
        return found

    # ------------------------------------------------------------------
    def _ship(self, handle: RealtimeStreamHandle, frames: np.ndarray):
        if len(frames) > handle._emitted:
            handle._q.put(frames[handle._emitted:].copy())
            handle._emitted = len(frames)

    def _loop(self):
        while not self._stop:
            try:
                with self._lock:
                    busy = bool(self.server._active or self.server._queue)
                    done = self.server.step() if busy else []
                    fetch = busy and (
                        self.server.total_steps % self.fetch_every == 0)
                    partial = self.server.partial_frames() if fetch else {}
            except BaseException as e:  # noqa: BLE001 - surfaced to callers
                with self._lock:
                    self._error = e
                    for h in self._handles.values():
                        h._error = e
                        h._q.put(None)
                    self._handles.clear()
                return
            for rid, frames in partial.items():
                h = self._handles.get(rid)
                if h is not None:
                    self._ship(h, frames)
            for c in done:
                h = self._handles.pop(c.request_id, None)
                if h is not None:
                    self._ship(h, c.frames)
                    h._q.put(None)
            if not busy:
                self._wake.wait(self._idle_wait)
                self._wake.clear()
