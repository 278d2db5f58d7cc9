"""DelayServingPool: concurrent request threads share one continuous-
batching server; each caller's greedy output equals the solo engine."""
import threading

import numpy as np
import jax
import jax.numpy as jnp

from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
from mosstts_tpu.engine.delay_engine import DelayEngine
from mosstts_tpu.models.delay import init_delay_params, make_sampling
from mosstts_tpu.serve.pool import DelayServingPool

CFG = DelayConfig(language_config=tiny_qwen3(), n_vq=4)


def _grid(rng, T):
    g = rng.integers(0, 500, (T, CFG.channels))
    g[1, 0] = CFG.im_start_token_id
    g[-1, 0] = CFG.audio_assistant_gen_slot_token_id
    return g


def test_pool_concurrent_callers_match_solo():
    params = init_delay_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    grids = [_grid(rng, 8 + i) for i in range(5)]

    pool = DelayServingPool(
        params, CFG, slots=2, cache_len=256, out_capacity=32,
        prompt_bucket=16, dtype=jnp.float32,
        sampling=make_sampling(text_temperature=0.0, audio_temperature=0.0))
    try:
        results = [None] * len(grids)
        errors = []

        def call(i):
            try:
                ids = grids[i][None]
                results[i] = pool.generate(
                    ids, np.ones((1, ids.shape[1]), bool),
                    max_new_tokens=12, text_temperature=0.0,
                    audio_temperature=0.0, timeout=600)
            except Exception as e:  # surface into the main thread
                errors.append(e)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(grids))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors

        engine = DelayEngine(params, CFG, dtype=jnp.float32, cache_bucket=32)
        for i, grid in enumerate(grids):
            solo = engine.generate(
                grid[None], np.ones((1, grid.shape[0]), bool),
                max_new_tokens=12, text_temperature=0.0,
                audio_temperature=0.0)[0]
            start, toks = results[i][0]
            assert start == solo[0]
            T = min(len(toks), len(solo[1]))
            np.testing.assert_array_equal(toks[:T], solo[1][:T],
                                          err_msg=f"caller {i}")
    finally:
        pool.close()


def test_pool_dead_thread_surfaces_error():
    """If the decode thread dies, pending and future generate() calls must
    raise (not hang forever on their events)."""
    params = init_delay_params(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
    pool = DelayServingPool(
        params, CFG, slots=2, cache_len=128, out_capacity=16,
        prompt_bucket=16, dtype=jnp.float32)
    try:
        def boom(*a, **kw):
            raise RuntimeError("injected step failure")

        pool.server.step_block = boom  # the method the decode loop drives
        rng = np.random.default_rng(1)
        ids = _grid(rng, 8)[None]
        import pytest
        with pytest.raises((RuntimeError, TimeoutError)):
            pool.generate(ids, max_new_tokens=4, timeout=30)
        with pytest.raises(RuntimeError):
            pool.generate(ids, max_new_tokens=4, timeout=30)
    finally:
        pool.close()


def test_pool_rejects_mismatched_top_k():
    params = init_delay_params(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
    pool = DelayServingPool(
        params, CFG, slots=2, cache_len=128, out_capacity=16,
        prompt_bucket=16, dtype=jnp.float32)
    try:
        assert pool.supports(text_top_k=50, audio_top_k=25)
        assert not pool.supports(text_top_k=50, audio_top_k=50)
        rng = np.random.default_rng(3)
        import pytest
        with pytest.raises(ValueError):
            pool.generate(_grid(rng, 8)[None], max_new_tokens=4,
                          audio_top_k=50)
    finally:
        pool.close()


def test_pool_backend_pipeline_integration():
    """pipelines._generate_and_decode routes through backend.pool: the
    synthesize flow completes end-to-end via the shared server (demo
    random weights need the app's sampled defaults to emit audio, so this
    checks the route + decode contract; token-level pool==engine equality
    is pinned by test_pool_concurrent_callers_match_solo)."""
    from mosstts_tpu.processing.delay_processor import DelayProcessor
    from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer
    from mosstts_tpu.serve.backend import load_codec
    from mosstts_tpu.serve.pipelines import DelayBackend, synthesize

    codec = load_codec(None)
    cfg = DelayConfig(language_config=tiny_qwen3(hidden_size=128),
                      n_vq=codec.config.n_q)
    engine = DelayEngine.random_init(seed=0, config=cfg, dtype=jnp.float32)
    proc = DelayProcessor(ByteFallbackTokenizer(), audio_tokenizer=codec,
                          config=cfg)
    pool = DelayServingPool(
        engine.params, cfg, slots=2, cache_len=512, out_capacity=64,
        prompt_bucket=16, dtype=jnp.float32)
    try:
        pool_backend = DelayBackend(engine=engine, processor=proc,
                                    sample_rate=cfg.sampling_rate, demo=True,
                                    pool=pool)
        sr, wav, status = synthesize(pool_backend, "pool parity",
                                     mode="Direct", max_new_tokens=48,
                                     duration_tokens=8)
        assert sr == cfg.sampling_rate
        assert wav.size > 0 and np.isfinite(wav).all()
        assert pool.server.total_steps > 0  # it really went through the pool
    finally:
        pool.close()


def test_pool_timeout_cleans_up_and_recovers():
    """A timed-out generate must unregister its events and drop late
    results (no leak), and the pool must keep serving afterwards."""
    params = init_delay_params(jax.random.PRNGKey(4), CFG, dtype=jnp.float32)
    pool = DelayServingPool(
        params, CFG, slots=2, cache_len=256, out_capacity=32,
        prompt_bucket=16, dtype=jnp.float32,
        sampling=make_sampling(text_temperature=0.0, audio_temperature=0.0))
    try:
        import pytest
        rng = np.random.default_rng(5)
        ids = _grid(rng, 8)[None]
        with pytest.raises(TimeoutError):
            pool.generate(ids, max_new_tokens=24, text_temperature=0.0,
                          audio_temperature=0.0, timeout=1e-6)
        # a fresh call still completes (slots free at max_new_tokens bound)
        out = pool.generate(ids, max_new_tokens=8, text_temperature=0.0,
                            audio_temperature=0.0, timeout=600)
        assert len(out) == 1
        # late results of the abandoned request were dropped, not leaked
        import time
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline and (
                pool.server._active or pool.server._queue):
            time.sleep(0.05)
        with pool._lock:
            assert not pool._events and not pool._results
            assert not pool._abandoned  # consumed when the result arrived
    finally:
        pool.close()


def test_pool_seed_reproducible_across_calls():
    """Explicit seeds must survive the pool: the server's monotonically
    increasing request id must not perturb a seeded sampling stream."""
    params = init_delay_params(jax.random.PRNGKey(6), CFG, dtype=jnp.float32)
    pool = DelayServingPool(
        params, CFG, slots=2, cache_len=256, out_capacity=32,
        prompt_bucket=16, dtype=jnp.float32)
    try:
        rng = np.random.default_rng(7)
        ids = _grid(rng, 8)[None]
        kw = dict(max_new_tokens=12, text_temperature=1.0,
                  audio_temperature=1.0, timeout=600)
        a = pool.generate(ids, seed=123, **kw)
        b = pool.generate(ids, seed=123, **kw)  # later rids, same seed
        c = pool.generate(ids, seed=124, **kw)
        np.testing.assert_array_equal(a[0][1], b[0][1])
        assert a[0][1].shape != c[0][1].shape or \
            not np.array_equal(a[0][1], c[0][1])
    finally:
        pool.close()


# ---------------------------------------------------------------------------
# RealtimeServingPool: >=2 concurrent streams through one continuous-
# batching server, frames token-equal to the solo engine (VERDICT r3 #6).
# ---------------------------------------------------------------------------

def _rt_cfg():
    from mosstts_tpu.core.config import RealtimeConfig, RealtimeLocalConfig

    rvq = 4
    return RealtimeConfig(
        language_config=tiny_qwen3(hidden_size=32, num_attention_heads=2,
                                   num_key_value_heads=2, head_dim=16,
                                   intermediate_size=64),
        local_config=RealtimeLocalConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=2, head_dim=16,
            rvq=rvq, max_position_embeddings=rvq + 1),
        rvq=rvq,
    )


def test_realtime_pool_concurrent_streams_match_solo():
    from mosstts_tpu.engine.realtime_engine import RealtimeEngine
    from mosstts_tpu.models.realtime import init_realtime_params, make_rt_sampling
    from mosstts_tpu.processing.realtime_processor import RealtimeProcessor
    from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer
    from mosstts_tpu.serve.pool import RealtimeServingPool

    cfg = _rt_cfg()
    rvq = cfg.rvq
    params = init_realtime_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    proc = RealtimeProcessor(ByteFallbackTokenizer(), channels=rvq)
    rng = np.random.default_rng(0)
    reqs = []
    for i in range(3):
        grid = proc.make_ensemble(rng.integers(0, 1024, (6 + i, rvq)))
        text = [int(t) for t in rng.integers(200, 5000, 16 + 3 * i)]
        reqs.append((grid, text))
    max_news = [10, 14, 9]

    pool = RealtimeServingPool(
        params, cfg, slots=2, cache_len=640, max_frames=64, prompt_bucket=16,
        dtype=jnp.float32, fetch_every=2,
        sampling=make_rt_sampling(temperature=0.0, top_p=0.6,
                                  repetition_penalty=1.1, do_sample=False))
    try:
        results = [None] * len(reqs)
        chunk_counts = [0] * len(reqs)
        errors = []

        def run(i):
            try:
                grid, text = reqs[i]
                h = pool.open_stream(grid, text, max_new_tokens=max_news[i])
                blocks = []
                for block in h.frames(timeout=600):
                    blocks.append(block)
                    chunk_counts[i] += 1
                results[i] = np.concatenate(blocks, axis=0)
            except Exception as e:
                errors.append((i, e))

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors

        for i, (grid, text) in enumerate(reqs):
            eng = RealtimeEngine(params, cfg, dtype=jnp.float32, cache_len=640,
                                 max_length=64, prefill_bucket=16)
            solo = eng.generate([grid], [text], max_length=max_news[i] - 1,
                                temperature=0.0, top_p=0.6, top_k=30,
                                repetition_penalty=1.1, do_sample=False)[0]
            got = results[i]
            T = min(len(got), len(solo))
            np.testing.assert_array_equal(got[:T], np.asarray(solo)[:T],
                                          err_msg=f"stream {i}")
            assert abs(len(got) - len(solo)) <= 1, (len(got), len(solo))
        # the streaming contract: frames arrived incrementally, not as one
        # end-of-conversation block
        assert any(c > 1 for c in chunk_counts), chunk_counts
    finally:
        pool.close()


def test_realtime_pool_cancel_frees_slot():
    """A cancelled stream (HTTP client disconnect) releases its slot so a
    queued conversation gets admitted, instead of the abandoned stream
    decoding to its max_new_tokens budget."""
    from mosstts_tpu.models.realtime import init_realtime_params, make_rt_sampling
    from mosstts_tpu.processing.realtime_processor import RealtimeProcessor
    from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer
    from mosstts_tpu.serve.pool import RealtimeServingPool

    cfg = _rt_cfg()
    rvq = cfg.rvq
    params = init_realtime_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    proc = RealtimeProcessor(ByteFallbackTokenizer(), channels=rvq)
    rng = np.random.default_rng(0)
    grid = proc.make_ensemble(rng.integers(0, 1024, (6, rvq)))
    text = [int(t) for t in rng.integers(200, 5000, 16)]

    pool = RealtimeServingPool(
        params, cfg, slots=1, cache_len=640, max_frames=128, prompt_bucket=16,
        dtype=jnp.float32, fetch_every=2,
        sampling=make_rt_sampling(temperature=0.0, top_p=0.6,
                                  repetition_penalty=1.1, do_sample=False))
    try:
        # a long conversation occupies the single slot...
        long_h = pool.open_stream(grid, text, max_new_tokens=120)
        it = long_h.frames(timeout=600)
        next(it)  # in flight (at least one frame block arrived)
        # ...a second conversation queues behind it
        short_h = pool.open_stream(grid, text, max_new_tokens=6)

        assert pool.cancel(long_h) is True
        # cancelled consumer unblocks promptly (no error: truncated stream)
        rest = list(it)
        assert all(isinstance(b, np.ndarray) for b in rest)
        # the queued stream is admitted into the freed slot and completes
        short = short_h.result(timeout=600)
        assert len(short) >= 5, len(short)
        # idempotent / unknown rid
        assert pool.cancel(long_h) is False
    finally:
        pool.close()


def test_realtime_server_cancel_queued_and_unknown():
    from mosstts_tpu.engine.realtime_batch_server import RealtimeBatchServer
    from mosstts_tpu.models.realtime import init_realtime_params, make_rt_sampling
    from mosstts_tpu.processing.realtime_processor import RealtimeProcessor
    from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer

    cfg = _rt_cfg()
    params = init_realtime_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    proc = RealtimeProcessor(ByteFallbackTokenizer(), channels=cfg.rvq)
    rng = np.random.default_rng(1)
    grid = proc.make_ensemble(rng.integers(0, 1024, (6, cfg.rvq)))
    text = [int(t) for t in rng.integers(200, 5000, 16)]

    srv = RealtimeBatchServer(
        params, cfg, slots=1, cache_len=640, max_frames=32, prompt_bucket=16,
        dtype=jnp.float32,
        sampling=make_rt_sampling(temperature=0.0, top_p=0.6,
                                  repetition_penalty=1.1, do_sample=False))
    r1 = srv.submit(grid, text, max_new_tokens=8)
    r2 = srv.submit(grid, text, max_new_tokens=8)  # queued behind r1
    assert srv.cancel(r2) is True          # still queued: dropped outright
    assert srv.cancel(r2) is False         # already gone
    assert srv.cancel(12345) is False      # unknown
    done = srv.run(max_steps=200)
    assert [c.request_id for c in done] == [r1]
