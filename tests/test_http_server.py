"""HTTP serving surface: health, streaming PCM, metrics, error paths.
Runs the server in-process on a random port with demo (tiny) backends."""
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer

    from mosstts_tpu.serve import http_server as hs

    class Args:
        model_path = None
        codec_path = None

    hs._STATE["args"] = Args()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), hs.Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post(url, body, timeout=600):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), method="POST",
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=timeout)


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["ok"] is True


def test_stream_pcm_and_metrics(server):
    with _post(server + "/stream", {
        "text": "Hello streaming world, this is a test sentence.",
        "temperature": 0, "chunk_frames": 4,
    }) as r:
        assert r.headers["X-Sample-Rate"] == "24000"
        pcm = r.read()
    assert len(pcm) > 0 and len(pcm) % 2 == 0
    wav = np.frombuffer(pcm, "<i2")
    assert np.isfinite(wav.astype(np.float32)).all()
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m.get("audio_s", 0) > 0
    assert m.get("ttfa_s") is not None


def test_tts_error_path(server):
    # demo random weights never emit audio_start in Direct mode -> clean 400
    try:
        _post(server + "/tts", {"text": "hi", "max_new_tokens": 6})
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        body = json.loads(e.read())
        assert e.code == 400 and "error" in body
    assert raised


def test_unknown_route(server):
    try:
        _post(server + "/nope", {})
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_stream_with_prebuffer_and_voice_prompt(server, tmp_path):
    from mosstts_tpu.utils.audio import write_wav

    wav_path = tmp_path / "prompt.wav"
    rng = np.random.default_rng(0)
    write_wav(str(wav_path), (rng.standard_normal(4800) * 0.1).astype(np.float32), 24000)

    body = {
        "text": "Prebuffered streaming test sentence goes here.",
        "temperature": 0, "chunk_frames": 4,
        "prebuffer_seconds": 0.2, "buffer_threshold_seconds": 5.0,
        "voice_prompt": str(wav_path),
    }
    with _post(server + "/stream", body) as r:
        pcm = r.read()
    assert len(pcm) > 0 and len(pcm) % 2 == 0

    # second request hits the voice-prompt LRU
    from mosstts_tpu.serve import http_server as hs
    cache = hs._token_cache()
    before = cache.hits
    with _post(server + "/stream", body) as r:
        assert len(r.read()) > 0
    assert cache.hits == before + 1


def test_player_page(server):
    """GET /player serves the self-contained Web Audio streaming player
    (reference app.py:559-805 parity: scheduled AudioBuffers + edge fades +
    live TTFB/RTF)."""
    for path in ("/player", "/"):
        with urllib.request.urlopen(server + path, timeout=30) as r:
            assert r.headers.get("Content-Type", "").startswith("text/html")
            html = r.read().decode()
        assert "AudioContext" in html
        assert "/stream" in html and "/metrics" in html
        assert "fadeEdges" in html  # edge-fade parity with the reference


def test_stream_pooled_concurrent():
    """--rt-pool-slots routes /stream through RealtimeServingPool: two
    CONCURRENT greedy streams must both complete through the shared
    continuous-batching server with identical PCM (same request ->
    deterministic output regardless of slot/admission order), and the
    solo path must still work with the pool disabled.

    Token-level pooled==solo-engine equality is pinned in
    tests/test_serving_pool.py::test_realtime_pool_concurrent_streams_
    match_solo; byte-equality of the full PCM against the solo SESSION is
    deliberately not asserted — the session bridge's drop-rest-of-fetch-
    group behavior on invalid frames (a quirk inherited from the
    reference, streaming_mossttsrealtime.py:978-990) only manifests with
    random demo weights."""
    from http.server import ThreadingHTTPServer

    from mosstts_tpu.serve import http_server as hs

    class Args:
        model_path = None
        codec_path = None
        rt_pool_slots = 2

    body = {"text": "Pooled streaming parity sentence for the test.",
            "temperature": 0, "chunk_frames": 4, "seed": 3}

    old_args, old_pool = hs._STATE["args"], hs._STATE.get("rt_pool")
    hs._STATE["args"], hs._STATE["rt_pool"] = Args(), None
    try:
        srv = ThreadingHTTPServer(("127.0.0.1", 0), hs.Handler)
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        threading.Thread(target=srv.serve_forever, daemon=True).start()

        results, errors = {}, []

        def fetch(i):
            try:
                with _post(url + "/stream", dict(body)) as r:
                    assert r.headers.get("X-Pooled") == "1"
                    results[i] = r.read()
            except Exception as e:  # noqa: BLE001
                errors.append((i, e))

        threads = [threading.Thread(target=fetch, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        assert results[0] == results[1]  # same greedy request, same PCM
        pcm = np.frombuffer(results[0], "<i2")
        assert pcm.size > 0 and np.isfinite(pcm.astype(np.float32)).all()

        # solo (no pool) path still works when the pool is disabled
        Args.rt_pool_slots = 0
        with _post(url + "/stream", dict(body)) as r:
            assert r.headers.get("X-Pooled") is None
            solo = r.read()
        assert len(solo) > 0
        srv.shutdown()
    finally:
        pool = hs._STATE.get("rt_pool")
        if pool is not None:
            pool.close()
        hs._STATE["args"], hs._STATE["rt_pool"] = old_args, old_pool
