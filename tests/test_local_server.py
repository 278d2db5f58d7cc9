"""LocalBatchServer: continuous batching for the depth-transformer family.

Oracle: the solo LocalEngine under greedy (do_samples all False), fed the
SAME bucket-padded grid (Local positions are absolute slot indices, so the
oracle must see identical padding — start_length and the from-audio_start
token slice are pad-invariant)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mosstts_tpu.core.config import LocalConfig, tiny_qwen3
from mosstts_tpu.engine.local_batch_server import LocalBatchServer
from mosstts_tpu.engine.local_engine import LocalEngine
from mosstts_tpu.models.local import init_local_params

CFG = LocalConfig(
    language_config=tiny_qwen3(vocab_size=512),
    n_vq=4,
    additional_mlp_ffn_hidden_size=32,
    local_ffn_hidden_size=48,
    local_hidden_size=24,
    local_num_layers=2,
)
BUCKET = 32
GREEDY = dict(do_samples=[False] * CFG.channels)


def _grid(rng, T):
    g = rng.integers(0, 500, (T, CFG.channels)).astype(np.int64)
    g[..., 1:] = rng.integers(0, 1024, (T, CFG.n_vq))
    g[2, 0] = CFG.audio_start_token_id
    return g


def _pad(grid):
    T = grid.shape[0]
    Tb = ((T + BUCKET - 1) // BUCKET) * BUCKET
    ids = np.full((1, Tb, CFG.channels), CFG.audio_pad_code, np.int64)
    ids[..., 0] = CFG.pad_token_id
    ids[0, Tb - T:] = grid
    mask = np.zeros((1, Tb), bool)
    mask[0, Tb - T:] = True
    return ids, mask


def _solo(params, grid, max_new):
    engine = LocalEngine(params, CFG, dtype=jnp.float32, cache_bucket=64)
    ids, mask = _pad(grid)
    return engine.generate(ids, mask, max_new_tokens=max_new, **GREEDY)[0]


def test_local_server_matches_solo():
    params = init_local_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    grids = [_grid(rng, 8 + 3 * i) for i in range(4)]
    max_news = [10, 14, 9, 12]

    server = LocalBatchServer(
        params, CFG, slots=2, cache_len=256, out_capacity=32,
        prompt_bucket=BUCKET, dtype=jnp.float32, **GREEDY)
    rids = [server.submit(g, max_new_tokens=mn)
            for g, mn in zip(grids, max_news)]
    done = {c.request_id: c for c in server.run(max_steps=400)}
    assert set(done) == set(rids)
    assert server.utilization == 0.0

    for rid, grid, mn in zip(rids, grids, max_news):
        start, toks = _solo(params, grid, mn)
        got = done[rid]
        assert got.start_length == start
        T = min(len(got.tokens), len(toks))
        np.testing.assert_array_equal(got.tokens[:T], toks[:T],
                                      err_msg=f"request {rid}")


def test_local_server_midflight_and_reuse():
    params = init_local_params(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    grids = [_grid(rng, 9 + 2 * i) for i in range(3)]

    server = LocalBatchServer(
        params, CFG, slots=2, cache_len=256, out_capacity=32,
        prompt_bucket=BUCKET, dtype=jnp.float32, **GREEDY)
    r0 = server.submit(grids[0], max_new_tokens=8)
    r1 = server.submit(grids[1], max_new_tokens=12)
    done = []
    for _ in range(5):
        done.extend(server.step())
    r2 = server.submit(grids[2], max_new_tokens=10)  # mid-flight
    for _ in range(300):
        done.extend(server.step())
        if not server._active and not server._queue:
            break
    done = {c.request_id: c for c in done}
    assert set(done) == {r0, r1, r2}
    for rid, grid, mn in zip((r0, r1, r2), grids, (8, 12, 10)):
        start, toks = _solo(params, grid, mn)
        got = done[rid]
        assert got.start_length == start
        T = min(len(got.tokens), len(toks))
        np.testing.assert_array_equal(got.tokens[:T], toks[:T])


def test_local_server_submit_validation():
    params = init_local_params(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
    server = LocalBatchServer(params, CFG, slots=2, cache_len=128,
                              out_capacity=32, dtype=jnp.float32)
    with pytest.raises(ValueError):
        server.submit(np.zeros((4, 2)))  # wrong channels
    with pytest.raises(ValueError):
        server.submit(np.zeros((120, CFG.channels), np.int64),
                      max_new_tokens=32)  # exceeds cache


def test_local_server_pipelined_poll_matches_sequential():
    """Pipelined (lagged) polling must reproduce the sequential poll's
    per-request tokens; readmitted slots must not inherit stale flags."""
    rng = np.random.default_rng(11)
    params = init_local_params(jax.random.PRNGKey(11), CFG, dtype=jnp.float32)
    grids = [_grid(rng, int(rng.integers(8, 24))) for _ in range(5)]
    max_news = [6, 9, 5, 8, 7]

    def run_mode(pipelined):
        server = LocalBatchServer(
            params, CFG, slots=2, cache_len=128, out_capacity=32,
            prompt_bucket=BUCKET, dtype=jnp.float32, poll_every=3, **GREEDY)
        rids = [server.submit(g, max_new_tokens=mn)
                for g, mn in zip(grids, max_news)]
        done = {c.request_id: c for c in server.run(max_steps=500,
                                                    pipelined=pipelined)}
        assert set(done) == set(rids)
        return rids, done

    rids, seq = run_mode(False)
    _, pipe = run_mode(True)
    for rid in rids:
        a, b = seq[rid].tokens, pipe[rid].tokens
        n = min(len(a), len(b))
        np.testing.assert_array_equal(a[:n], b[:n], err_msg=f"request {rid}")


def test_local_server_event_run_matches_windowed():
    """run_events() (device-side stop-flag polling) must reproduce run()'s
    outputs exactly under mixed budgets, with exact budget step counts."""
    params = init_local_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    rng = np.random.default_rng(21)
    grids = [_grid(rng, 8 + 3 * i) for i in range(5)]
    budgets = [12, 7, 15, 9, 11]

    def serve(events):
        srv = LocalBatchServer(
            params, CFG, slots=2, cache_len=128, out_capacity=32,
            prompt_bucket=BUCKET, dtype=jnp.float32, **GREEDY)
        rids = [srv.submit(g, max_new_tokens=mn)
                for g, mn in zip(grids, budgets)]
        run = srv.run_events if events else srv.run
        done = {c.request_id: c for c in run(max_steps=600)}
        assert sorted(done) == sorted(rids)
        return [done[r] for r in rids]

    ref = serve(events=False)
    got = serve(events=True)
    for a, b, mn in zip(ref, got, budgets):
        np.testing.assert_array_equal(a.tokens, b.tokens)
        assert b.steps <= mn
