"""RealtimeBatchServer: continuous batching for streaming conversations.

The oracle is the solo (batch-1) RealtimeEngine.generate path: under greedy
sampling every admitted conversation must produce EXACTLY the frames the
solo engine produces for the same grid/text, regardless of which slot it
lands in, what else shares the batch, or whether it was admitted mid-flight.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mosstts_tpu.core.config import RealtimeConfig, RealtimeLocalConfig, tiny_qwen3
from mosstts_tpu.processing.realtime_processor import RealtimeProcessor
from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer

RVQ = 4
CFG = RealtimeConfig(
    language_config=tiny_qwen3(hidden_size=32, num_attention_heads=2,
                               num_key_value_heads=2, head_dim=16,
                               intermediate_size=64),
    local_config=RealtimeLocalConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, head_dim=16, rvq=RVQ,
        max_position_embeddings=RVQ + 1,
    ),
    rvq=RVQ,
)

SAMPLING = dict(temperature=0.0, top_p=0.6, top_k=30,
                repetition_penalty=1.1, do_sample=False)


def _requests(rng, n):
    proc = RealtimeProcessor(ByteFallbackTokenizer(), channels=RVQ)
    reqs = []
    for i in range(n):
        tokens = rng.integers(0, 1024, (6 + i, RVQ))
        grid = proc.make_ensemble(tokens)
        text = [int(t) for t in rng.integers(200, 5000, 16 + 3 * i)]
        reqs.append((grid, text))
    return reqs


def _solo_frames(params, grid, text, max_new):
    from mosstts_tpu.engine.realtime_engine import RealtimeEngine

    eng = RealtimeEngine(params, CFG, dtype=jnp.float32, cache_len=640,
                         max_length=64, prefill_bucket=16)
    out = eng.generate([grid], [text], max_length=max_new - 1, **SAMPLING)
    return out[0]


def _make_server(params, **over):
    from mosstts_tpu.engine.realtime_batch_server import RealtimeBatchServer
    from mosstts_tpu.models.realtime import make_rt_sampling

    kw = dict(slots=2, cache_len=640, max_frames=64, prompt_bucket=16,
              dtype=jnp.float32,
              sampling=make_rt_sampling(temperature=0.0, top_p=0.6,
                                        repetition_penalty=1.1,
                                        do_sample=False))
    kw.update(over)
    return RealtimeBatchServer(params, CFG, **kw)


def test_realtime_server_matches_solo_engine():
    from mosstts_tpu.models.realtime import init_realtime_params

    params = init_realtime_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    reqs = _requests(rng, 4)
    max_news = [10, 14, 9, 12]

    server = _make_server(params)
    rids = [server.submit(g, t, max_new_tokens=mn)
            for (g, t), mn in zip(reqs, max_news)]
    done = {c.request_id: c for c in server.run(max_steps=400)}
    assert set(done) == set(rids)

    for rid, (grid, text), mn in zip(rids, reqs, max_news):
        ref = _solo_frames(params, grid, text, mn)
        got = done[rid].frames
        # the server may carry a few post-budget poll-slack frames; the
        # agreed prefix must be the solo frames exactly
        n = min(len(ref), len(got), mn)
        assert n >= mn - 1, (len(ref), len(got), mn)
        np.testing.assert_array_equal(got[:n], ref[:n],
                                      err_msg=f"request {rid}")


def test_realtime_server_midflight_admission():
    """A request submitted while the pool is mid-decode lands in the freed
    slot and still matches solo output."""
    from mosstts_tpu.models.realtime import init_realtime_params

    params = init_realtime_params(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    reqs = _requests(rng, 3)

    server = _make_server(params)
    r0 = server.submit(*reqs[0], max_new_tokens=8)
    r1 = server.submit(*reqs[1], max_new_tokens=12)
    done = []
    for _ in range(6):
        done.extend(server.step())
    # submit the third mid-flight
    r2 = server.submit(*reqs[2], max_new_tokens=10)
    for _ in range(200):
        done.extend(server.step())
        if not server._active and not server._queue:
            break
    done = {c.request_id: c for c in done}
    assert set(done) == {r0, r1, r2}

    for rid, (grid, text), mn in zip((r0, r1, r2), reqs, (8, 12, 10)):
        ref = _solo_frames(params, grid, text, mn)
        got = done[rid].frames
        n = min(len(ref), len(got), mn)
        assert n >= mn - 1
        np.testing.assert_array_equal(got[:n], ref[:n])


def test_realtime_server_block_mode_matches_solo():
    """run(block=4) pipelines 4 frames per host round; outputs stay
    token-exact vs solo under greedy."""
    from mosstts_tpu.models.realtime import init_realtime_params

    params = init_realtime_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    reqs = _requests(rng, 3)
    max_news = [10, 7, 13]

    server = _make_server(params)
    rids = [server.submit(g, t, max_new_tokens=mn)
            for (g, t), mn in zip(reqs, max_news)]
    done = {c.request_id: c for c in server.run(max_steps=400, block=4)}
    assert set(done) == set(rids)
    for rid, (grid, text), mn in zip(rids, reqs, max_news):
        ref = _solo_frames(params, grid, text, mn)
        got = done[rid].frames
        n = min(len(ref), len(got), mn)
        assert n >= mn - 1
        np.testing.assert_array_equal(got[:n], ref[:n])


def test_realtime_server_block_respects_budget():
    """Block mode must not return more frames than max_new_tokens (the
    block breaks early on a hit budget and _collect clamps)."""
    from mosstts_tpu.models.realtime import init_realtime_params

    params = init_realtime_params(jax.random.PRNGKey(5), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    (grid, text), = _requests(rng, 1)
    server = _make_server(params)
    rid = server.submit(grid, text, max_new_tokens=6)
    done = {c.request_id: c for c in server.run(max_steps=100, block=8)}
    assert len(done[rid].frames) <= 6


def test_realtime_server_per_request_sampling():
    """A greedy conversation must match solo output exactly while its slot
    neighbor decodes hot under a per-request override, and a reused slot
    resets to defaults."""
    from mosstts_tpu.models.realtime import init_realtime_params

    params = init_realtime_params(jax.random.PRNGKey(4), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    reqs = _requests(rng, 3)

    server = _make_server(params)  # defaults: greedy
    r0 = server.submit(*reqs[0], max_new_tokens=10)
    r1 = server.submit(*reqs[1], max_new_tokens=10, sampling=dict(
        temperature=1.5, top_p=0.95, repetition_penalty=1.3))
    done = {c.request_id: c for c in server.run(max_steps=300)}
    # reuse a slot with a default request afterwards
    r2 = server.submit(*reqs[2], max_new_tokens=9)
    done.update({c.request_id: c for c in server.run(max_steps=300)})
    assert set(done) == {r0, r1, r2}

    for rid, i, mn in ((r0, 0, 10), (r2, 2, 9)):
        ref = _solo_frames(params, *reqs[i], mn)
        got = done[rid].frames
        n = min(len(ref), len(got), mn)
        assert n >= mn - 1
        np.testing.assert_array_equal(got[:n], ref[:n])

    with pytest.raises(ValueError):
        server.submit(*reqs[0], sampling={"top_k": 5})  # unknown key


def test_realtime_server_submit_validation():
    from mosstts_tpu.models.realtime import init_realtime_params

    params = init_realtime_params(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
    server = _make_server(params, cache_len=128)
    with pytest.raises(ValueError):
        server.submit(np.zeros((4, 2)), [1, 2, 3])  # wrong channel count
    with pytest.raises(ValueError):
        server.submit(np.zeros((4, RVQ + 1), np.int64), [])  # no text
    with pytest.raises(ValueError):  # prompt + budget exceeds the cache
        server.submit(np.zeros((100, RVQ + 1), np.int64),
                      [1] * 12, max_new_tokens=64)


def test_realtime_server_batched_admission_mixed_buckets():
    """Simultaneous admissions go through ONE fused prefill+splice program
    per prompt bucket: requests straddling two buckets (grouped admission),
    and a group whose size is not a power of two (k=3 -> kb=4, the last
    admission replicated into the padding row), must all still match the
    solo engine exactly."""
    from mosstts_tpu.models.realtime import init_realtime_params

    params = init_realtime_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    reqs = _requests(rng, 3)

    # mixed buckets in one admission pass: short text prefix -> Tb=16,
    # default prefix -> Tb=32 (grid rows are 8-10 here)
    server = _make_server(params, slots=3)
    r0 = server.submit(*reqs[0], max_new_tokens=8, prefill_text_len=2)
    r1 = server.submit(*reqs[1], max_new_tokens=10)
    r2 = server.submit(*reqs[2], max_new_tokens=9)
    done = {c.request_id: c for c in server.run(max_steps=400)}
    # k=3 same-bucket group -> kb=4 padded admission
    r3 = server.submit(*reqs[0], max_new_tokens=8)
    r4 = server.submit(*reqs[1], max_new_tokens=10)
    r5 = server.submit(*reqs[2], max_new_tokens=9)
    done.update({c.request_id: c for c in server.run(max_steps=400)})
    assert set(done) == {r0, r1, r2, r3, r4, r5}

    cases = [(r0, 0, 8, 2), (r1, 1, 10, 12), (r2, 2, 9, 12),
             (r3, 0, 8, 12), (r4, 1, 10, 12), (r5, 2, 9, 12)]
    for rid, i, mn, ptl in cases:
        grid, text = reqs[i]
        from mosstts_tpu.engine.realtime_engine import RealtimeEngine

        eng = RealtimeEngine(params, CFG, dtype=jnp.float32, cache_len=640,
                             max_length=64, prefill_bucket=16)
        ref = eng.generate([grid], [text], max_length=mn - 1,
                           prefill_text_len=ptl, **SAMPLING)[0]
        got = done[rid].frames
        n = min(len(ref), len(got), mn)
        assert n >= mn - 1, (rid, len(ref), len(got), mn)
        np.testing.assert_array_equal(got[:n], np.asarray(ref)[:n],
                                      err_msg=f"request {rid}")


def test_realtime_server_sampled_padded_admission_deterministic():
    """kb-padding rows must not corrupt real slots under SAMPLING: the
    padded duplicate draws different per-row noise, so a duplicate-index
    scatter would be nondeterministic (review finding; fixed with
    mode='drop' out-of-range padding). Two identical servers running the
    same 3-way sampled admission (k=3 -> kb=4) must produce identical
    frames."""
    from mosstts_tpu.models.realtime import init_realtime_params, make_rt_sampling
    from mosstts_tpu.engine.realtime_batch_server import RealtimeBatchServer

    params = init_realtime_params(jax.random.PRNGKey(5), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    reqs = _requests(rng, 3)

    def run_once():
        server = RealtimeBatchServer(
            params, CFG, slots=3, cache_len=640, max_frames=64,
            prompt_bucket=16, dtype=jnp.float32,
            sampling=make_rt_sampling(temperature=0.8, do_sample=True))
        rids = [server.submit(g, t, max_new_tokens=10) for g, t in reqs]
        done = {c.request_id: c for c in server.run(max_steps=300)}
        return [done[r].frames for r in rids]

    a, b = run_once(), run_once()
    for i, (fa, fb) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(fa, fb, err_msg=f"stream {i}")
        assert fa.shape[0] > 0


def test_realtime_server_pipelined_poll_matches_sequential():
    """run(pipelined=True) snapshots the stop flags on device and resolves
    them one block late (hiding the poll's host round trip behind device
    work). Per-request frames must be identical to the sequential poll —
    only completion-detection timing may differ, and any extra lag frames
    are post-EOS/post-budget slack the trim already discards."""
    from mosstts_tpu.models.realtime import init_realtime_params

    params = init_realtime_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    reqs = _requests(rng, 5)
    max_news = [10, 14, 9, 12, 11]

    def run_mode(pipelined):
        server = _make_server(params, poll_every=3)
        rids = [server.submit(g, t, max_new_tokens=mn)
                for (g, t), mn in zip(reqs, max_news)]
        done = {c.request_id: c for c in server.run(max_steps=500,
                                                    pipelined=pipelined)}
        assert set(done) == set(rids)
        return rids, done

    rids, seq = run_mode(False)
    _, pipe = run_mode(True)
    for rid, mn in zip(rids, max_news):
        a, b = seq[rid].frames, pipe[rid].frames
        n = min(len(a), len(b), mn)
        assert n >= mn - 1, (len(a), len(b), mn)
        np.testing.assert_array_equal(a[:n], b[:n], err_msg=f"request {rid}")


def test_hist_buckets_exponential_and_warmed():
    """partial_frames' on-device history slice must use EXPONENTIAL frame
    buckets (bounded program count) and warmup() must precompile every
    bucket — a linear 64-frame bucket compiled a new program every 64
    frames, a seconds-long remote compile landing mid-serve under the
    pool lock."""
    from mosstts_tpu.models.realtime import init_realtime_params

    params = init_realtime_params(jax.random.PRNGKey(0), CFG,
                                  dtype=jnp.float32)
    srv = _make_server(params, max_frames=256)
    assert srv._hist_bucket(1) == 64
    assert srv._hist_bucket(64) == 64
    assert srv._hist_bucket(65) == 128
    assert srv._hist_bucket(129) == 256
    assert srv._hist_bucket(1000) == 256  # clamped to max_frames

    srv.warmup(prompt_lens=(16,), attend_upto=128)
    want = {("hist_slice", nb) for nb in (64, 128, 256)}
    assert want <= set(srv._jit), sorted(k for k in srv._jit
                                         if k[0] == "hist_slice")


def test_realtime_server_event_run_matches_windowed():
    """run_events() (device-side stop-flag polling) must reproduce run()'s
    frame streams exactly, with mixed budgets so budget exits and
    mid-flight admission fire inside event blocks, and strictly fewer
    dispatches than frames."""
    from mosstts_tpu.models.realtime import init_realtime_params

    params = init_realtime_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    reqs = _requests(rng, 5)
    max_news = [10, 22, 9, 15, 12]

    def serve(events):
        srv = _make_server(params)
        rids = [srv.submit(g, t, max_new_tokens=mn)
                for (g, t), mn in zip(reqs, max_news)]
        run = srv.run_events if events else srv.run
        done = {c.request_id: c for c in run(max_steps=600)}
        assert set(done) == set(rids)
        return [done[r] for r in rids]

    ref = serve(events=False)
    got = serve(events=True)
    for a, b, mn in zip(ref, got, max_news):
        n = min(len(a.frames), len(b.frames))
        np.testing.assert_array_equal(a.frames[:n], b.frames[:n])
        # event blocks exit exactly at the budget: no overshoot frames
        assert b.steps <= mn
