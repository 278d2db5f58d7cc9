"""Serving-UX streaming utilities: prebuffer, backpressure, encode LRU
(reference moss_tts_realtime/app.py:182-200,257-261,364-390,481-512)."""
import time

import numpy as np

from mosstts_tpu.engine.streaming import (
    AudioTokenCache,
    BufferedAudioTracker,
    stream_with_prebuffer,
)


def test_buffered_audio_tracker():
    tr = BufferedAudioTracker(sample_rate=24000)
    assert tr.buffered_seconds() == 0.0
    tr.add(np.zeros(24000, np.float32))  # 1 s of audio just emitted
    assert 0.9 < tr.buffered_seconds() <= 1.0
    tr.add(np.zeros(0, np.float32))  # empty chunks don't start the clock


def test_prebuffer_holds_then_releases():
    sr = 1000
    chunks = [np.full(300, i, np.float32) for i in range(4)]  # 0.3 s each

    seen = []
    t0 = time.monotonic()
    emit_times = []
    for c in stream_with_prebuffer(iter(chunks), sr, prebuffer_seconds=0.5):
        seen.append(c[0])
        emit_times.append(time.monotonic() - t0)
    assert seen == [0.0, 1.0, 2.0, 3.0]  # order preserved, nothing dropped
    # the first two chunks (0.6 s banked >= 0.5 s) are released together
    assert emit_times[1] - emit_times[0] < 0.05


def test_prebuffer_flushes_short_stream():
    sr = 1000
    chunks = [np.ones(100, np.float32)]  # 0.1 s total, target 1 s
    out = list(stream_with_prebuffer(iter(chunks), sr, prebuffer_seconds=1.0))
    assert len(out) == 1 and out[0].size == 100


def test_backpressure_paces_emission():
    sr = 1000
    chunks = [np.ones(100, np.float32) for _ in range(3)]  # 0.1 s each
    t0 = time.monotonic()
    out = list(stream_with_prebuffer(iter(chunks), sr,
                                     buffer_threshold_seconds=0.02))
    elapsed = time.monotonic() - t0
    assert len(out) == 3
    # each chunk banks 0.1 s; with a 0.02 s threshold the 2nd and 3rd wait
    # ~0.08 s each for playback to drain
    assert elapsed > 0.12


def test_audio_token_cache(tmp_path):
    p = tmp_path / "a.wav"
    p.write_bytes(b"fake")
    calls = []

    def encode(path):
        calls.append(path)
        return np.arange(6).reshape(2, 3)

    cache = AudioTokenCache(max_entries=2)
    a = cache.get_or_encode(str(p), encode)
    b = cache.get_or_encode(str(p), encode)
    assert len(calls) == 1 and cache.hits == 1
    np.testing.assert_array_equal(a, b)

    # different encode kwargs -> different entry
    cache.get_or_encode(str(p), encode, {"chunk_duration": 8})
    assert len(calls) == 2

    # mtime bump invalidates
    import os
    os.utime(p, ns=(1, 1))
    cache.get_or_encode(str(p), encode)
    assert len(calls) == 3

    # LRU eviction at max_entries=2
    q = tmp_path / "b.wav"
    q.write_bytes(b"fake2")
    cache.get_or_encode(str(q), encode)
    assert len(cache._store) == 2
