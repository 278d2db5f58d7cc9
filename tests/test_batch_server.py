"""Continuous batching server: mid-flight admission, per-slot isolation,
equivalence with solo generation."""
import numpy as np
import jax.numpy as jnp
import pytest

from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
from mosstts_tpu.engine.batch_server import DelayBatchServer
from mosstts_tpu.engine.delay_engine import DelayEngine
from mosstts_tpu.models.delay import init_delay_params, make_sampling
from mosstts_tpu.processing.delay_processor import DelayProcessor
from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer

import jax

CFG = DelayConfig(language_config=tiny_qwen3(), n_vq=4)


def _continuation_grid(proc, text, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 1024, (6, CFG.n_vq)).astype(np.int64)
    conv = [
        proc.build_user_message(text=text),
        proc.build_assistant_message([codes]),
    ]
    batch = proc([conv], mode="continuation")
    return batch["input_ids"][0]


@pytest.fixture(scope="module")
def setup():
    params = init_delay_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    proc = DelayProcessor(ByteFallbackTokenizer(), None, CFG)
    server = DelayBatchServer(
        params, CFG, slots=2, cache_len=256, out_capacity=64,
        prompt_bucket=32, dtype=jnp.float32,
        sampling=make_sampling(text_temperature=0.0, audio_temperature=0.0),
    )
    return params, proc, server


def test_continuous_admission_and_equivalence(setup):
    params, proc, server = setup
    # 4 requests into 2 slots: the last two must be admitted mid-flight
    grids = [_continuation_grid(proc, f"text number {i}", seed=i) for i in range(4)]
    rids = [server.submit(g, max_new_tokens=20) for g in grids]
    done = server.run(max_steps=500)
    assert sorted(c.request_id for c in done) == sorted(rids)
    assert server.utilization == 0.0

    # solo reference: same model through the synchronized engine, greedy
    engine = DelayEngine(params, CFG, dtype=jnp.float32, cache_bucket=32)
    by_id = {c.request_id: c for c in done}
    for rid, grid in zip(rids, grids):
        solo = engine.generate(
            grid[None], np.ones((1, grid.shape[0]), bool),
            max_new_tokens=20, text_temperature=0.0, audio_temperature=0.0,
        )[0]
        got = by_id[rid]
        assert got.start_length == solo[0]
        T = min(len(got.tokens), len(solo[1]))
        np.testing.assert_array_equal(
            got.tokens[:T], solo[1][:T],
            err_msg=f"request {rid} diverged from solo generation",
        )


def test_per_request_sampling(setup):
    """Multi-tenant generation configs: two requests with DIFFERENT sampling
    share the pool; the greedy one must match the solo greedy engine exactly
    even while its neighbor decodes hot, and a sampled request in a reused
    slot must not perturb a later greedy occupant (slot sampling resets on
    admission)."""
    params, proc, server = setup
    g0 = _continuation_grid(proc, "greedy tenant", seed=41)
    g1 = _continuation_grid(proc, "hot tenant", seed=42)
    # server defaults are greedy (fixture); request 1 overrides to sampled
    r0 = server.submit(g0, max_new_tokens=16)
    r1 = server.submit(g1, max_new_tokens=16, sampling=dict(
        audio_temperature=2.0, audio_top_p=0.95, text_temperature=1.5,
        audio_repetition_penalty=1.3))
    done = {c.request_id: c for c in server.run(max_steps=400)}
    assert set(done) == {r0, r1}

    engine = DelayEngine(params, CFG, dtype=jnp.float32, cache_bucket=32)
    solo = engine.generate(g0[None], np.ones((1, g0.shape[0]), bool),
                           max_new_tokens=16, text_temperature=0.0,
                           audio_temperature=0.0)[0]
    got = done[r0]
    assert got.start_length == solo[0]
    T = min(len(got.tokens), len(solo[1]))
    np.testing.assert_array_equal(got.tokens[:T], solo[1][:T])

    # reuse the hot request's slot with a default (greedy) request: output
    # must be byte-identical to a fresh greedy run of the same grid
    r2 = server.submit(g0, max_new_tokens=16)
    done2 = {c.request_id: c for c in server.run(max_steps=400)}
    T2 = min(len(done2[r2].tokens), len(solo[1]))
    np.testing.assert_array_equal(done2[r2].tokens[:T2], solo[1][:T2])

    with pytest.raises(ValueError):
        server.submit(g0, sampling={"temperature": 1.0})  # unknown key


def test_slot_reuse_isolation(setup):
    """A request admitted into a reused slot must not see the previous
    occupant's repetition history or cache."""
    params, proc, server = setup
    g = _continuation_grid(proc, "isolation check", seed=99)
    r1 = server.submit(g, max_new_tokens=12)
    out1 = server.run()
    r2 = server.submit(g, max_new_tokens=12)
    out2 = server.run()
    a = next(c for c in out1 if c.request_id == r1)
    b = next(c for c in out2 if c.request_id == r2)
    np.testing.assert_array_equal(a.tokens, b.tokens)


def test_batch_server_kv_quant_runs():
    """Continuous batching over the int8 KV cache (QuantKVCache): the
    fieldwise slot splice and the quant decode path must compose."""
    params = init_delay_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    proc = DelayProcessor(ByteFallbackTokenizer(), None, CFG)
    server = DelayBatchServer(
        params, CFG, slots=2, cache_len=256, out_capacity=32,
        prompt_bucket=32, dtype=jnp.float32, kv_quant=True,
        sampling=make_sampling(text_temperature=0.0, audio_temperature=0.0),
    )
    grids = [_continuation_grid(proc, f"quant text {i}", seed=10 + i)
             for i in range(3)]
    rids = [server.submit(g, max_new_tokens=12) for g in grids]
    done = server.run(max_steps=200)
    assert sorted(c.request_id for c in done) == sorted(rids)
    for c in done:
        assert c.tokens.shape[1] == CFG.channels
        assert np.isfinite(c.tokens).all()
    # the device-resident drain scheduler must compose with the quant
    # cache too (bench's batch-server section serves kv_quant=True): same
    # requests again, greedy -> identical grids to the windowed run
    rids2 = [server.submit(g, max_new_tokens=12) for g in grids]
    done2 = {c.request_id: c for c in server.run_drain()}
    for r1, r2 in zip(rids, rids2):
        a = next(c for c in done if c.request_id == r1)
        np.testing.assert_array_equal(a.tokens, done2[r2].tokens)
    # the server must stay serviceable after a drain (the drain's donated
    # carry must not consume the server's own sampling buffers): another
    # drain AND another windowed run on the same instance
    rids3 = [server.submit(g, max_new_tokens=12) for g in grids]
    done3 = {c.request_id: c for c in server.run_drain()}
    rids4 = [server.submit(g, max_new_tokens=12) for g in grids]
    done4 = {c.request_id: c for c in server.run(max_steps=200)}
    for r1, r3, r4 in zip(rids, rids3, rids4):
        a = next(c for c in done if c.request_id == r1)
        np.testing.assert_array_equal(a.tokens, done3[r3].tokens)
        np.testing.assert_array_equal(a.tokens, done4[r4].tokens)


def test_paged_server_matches_linear():
    """paged=True must reproduce the linear server's greedy outputs exactly
    (the page pool relocates physical storage only), across enough
    sequential waves that pages get recycled between requests."""
    params = init_delay_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    proc = DelayProcessor(ByteFallbackTokenizer(), None, CFG)
    kw = dict(slots=2, cache_len=256, out_capacity=64, prompt_bucket=32,
              dtype=jnp.float32,
              sampling=make_sampling(text_temperature=0.0, audio_temperature=0.0))
    lin = DelayBatchServer(params, CFG, **kw)
    pgd = DelayBatchServer(params, CFG, paged=True, page_size=64, **kw)
    assert pgd.num_pages < 1 + 2 * (256 // 64), "pool must be < linear footprint"

    grids = [_continuation_grid(proc, f"paged wave {i}", seed=40 + i)
             for i in range(5)]
    for wave in (grids[:3], grids[3:]):  # second wave reuses freed pages
        rl = [lin.submit(g, max_new_tokens=24) for g in wave]
        rp = [pgd.submit(g, max_new_tokens=24) for g in wave]
        dl = {c.request_id: c for c in lin.run(max_steps=500)}
        dp = {c.request_id: c for c in pgd.run(max_steps=500)}
        assert sorted(dl) == sorted(rl) and sorted(dp) == sorted(rp)
        for a, b in zip(rl, rp):
            np.testing.assert_array_equal(
                dl[a].tokens, dp[b].tokens,
                err_msg="paged decode diverged from linear")
    assert not pgd._free_pages or len(pgd._free_pages) == pgd.num_pages - 1


def test_paged_preemption_recovers():
    """A pool sized for ~one stream forces recompute preemption under two
    concurrent requests; both must still complete with valid grids."""
    params = init_delay_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    proc = DelayProcessor(ByteFallbackTokenizer(), None, CFG)
    server = DelayBatchServer(
        params, CFG, slots=2, cache_len=256, out_capacity=64,
        prompt_bucket=32, dtype=jnp.float32, paged=True, page_size=32,
        # continuation prompt is 185 rows -> bucketed 192 -> 6 pages/stream
        # at admit, growing to 8 by pos 240. 14 usable pages admit both
        # (12) but cannot cover 2x8, so the streams MUST collide at a page
        # boundary and one gets recompute-preempted
        num_pages=1 + 14,
        sampling=make_sampling(text_temperature=0.0, audio_temperature=0.0))
    grids = [_continuation_grid(proc, f"preempt me {i}", seed=60 + i)
             for i in range(2)]
    rids = [server.submit(g, max_new_tokens=48) for g in grids]
    done = server.run(max_steps=2000)
    assert sorted(c.request_id for c in done) == sorted(rids)
    for c in done:
        assert c.tokens.shape[1] == CFG.channels
        assert np.isfinite(c.tokens).all()
    # pool fully drained back after completion, and preemption really fired
    assert len(server._free_pages) == server.num_pages - 1
    assert server.total_preemptions >= 1


def test_warmup_then_serve_unchanged():
    """warmup() precompiles the serving programs on dummy traffic; outputs
    of real requests after a warmup must match a never-warmed server
    (idle-row steps during warmup must not leak into admitted slots)."""
    params = init_delay_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    proc = DelayProcessor(ByteFallbackTokenizer(), None, CFG)
    kw = dict(slots=2, cache_len=256, out_capacity=64, prompt_bucket=32,
              dtype=jnp.float32,
              sampling=make_sampling(text_temperature=0.0, audio_temperature=0.0))
    grids = [_continuation_grid(proc, f"warm {i}", seed=60 + i) for i in range(3)]

    for paged in (False, True):
        pkw = dict(kw, paged=True, page_size=64) if paged else kw
        cold = DelayBatchServer(params, CFG, **pkw)
        warm = DelayBatchServer(params, CFG, **pkw)
        warm.warmup(prompt_lens=(32, 64), attend_upto=256)
        assert not warm._active and not warm._queue
        rc = [cold.submit(g, max_new_tokens=24) for g in grids]
        rw = [warm.submit(g, max_new_tokens=24) for g in grids]
        dc = {c.request_id: c for c in cold.run(max_steps=500)}
        dw = {c.request_id: c for c in warm.run(max_steps=500)}
        for a, b in zip(rc, rw):
            np.testing.assert_array_equal(
                dc[a].tokens, dw[b].tokens,
                err_msg=f"warmup changed outputs (paged={paged})")


def test_linear_submit_rejects_overflow(setup):
    """Linear mode must reject prompts + budgets that exceed cache_len
    instead of silently dropping KV writes past the end (ADVICE r3)."""
    _, proc, server = setup
    grid = _continuation_grid(proc, "overflow check", seed=99)
    with pytest.raises(ValueError):
        # cache_len=256: a 32-bucketed prompt + 64 (out_capacity cap) fits,
        # so grow the prompt past the boundary instead
        big = np.tile(grid, (256 // grid.shape[0] + 1, 1))
        server.submit(big, max_new_tokens=64)


def test_delay_server_pipelined_poll_matches_sequential(setup):
    """run(pipelined=True) resolves stop flags one block late (hiding the
    poll round trip behind device work). Token output per request must be
    identical to the sequential poll; a slot freed + readmitted inside the
    lag window must not inherit the old occupant's frozen flag."""
    params, proc, _ = setup
    grids = [_continuation_grid(proc, f"pipelined {i}", seed=40 + i)
             for i in range(5)]
    max_news = [8, 12, 7, 10, 9]

    def run_mode(pipelined):
        server = DelayBatchServer(
            params, CFG, slots=2, cache_len=256, out_capacity=64,
            prompt_bucket=32, dtype=jnp.float32, poll_every=3,
            sampling=make_sampling(text_temperature=0.0,
                                   audio_temperature=0.0),
        )
        rids = [server.submit(g, max_new_tokens=mn)
                for g, mn in zip(grids, max_news)]
        done = {c.request_id: c for c in server.run(max_steps=500,
                                                    pipelined=pipelined)}
        assert set(done) == set(rids)
        return rids, done

    rids, seq = run_mode(False)
    _, pipe = run_mode(True)
    for rid, mn in zip(rids, max_news):
        a, b = seq[rid].tokens, pipe[rid].tokens
        n = min(len(a), len(b))
        np.testing.assert_array_equal(a[:n], b[:n], err_msg=f"request {rid}")


def test_event_driven_run_matches_windowed():
    """run_events() (device-side stop-flag polling: one dispatch per
    scheduling event) must reproduce run()'s outputs exactly — same
    request->tokens map and exact budget step counts — for both the linear
    and paged servers, under mixed budgets so budget exits, EOS exits and
    mid-flight admission all fire inside event blocks."""
    params = init_delay_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    proc = DelayProcessor(ByteFallbackTokenizer(), None, CFG)
    grids = [_continuation_grid(proc, f"event wave {i}", seed=80 + i)
             for i in range(5)]
    budgets = [24, 9, 17, 31, 12]  # mixed: forces staggered budget events

    def serve(paged, events):
        kw = dict(slots=2, cache_len=256, out_capacity=64, prompt_bucket=32,
                  dtype=jnp.float32,
                  sampling=make_sampling(text_temperature=0.0,
                                         audio_temperature=0.0))
        if paged:
            kw.update(paged=True, page_size=64)
        srv = DelayBatchServer(params, CFG, **kw)
        rids = [srv.submit(g, max_new_tokens=mn)
                for g, mn in zip(grids, budgets)]
        run = srv.run_events if events else srv.run
        done = {c.request_id: c for c in run(max_steps=800)}
        assert sorted(done) == sorted(rids)
        return [done[r] for r in rids], srv

    ref, _ = serve(paged=False, events=False)
    for paged in (False, True):
        got, srv = serve(paged=paged, events=True)
        for a, b, mn in zip(ref, got, budgets):
            np.testing.assert_array_equal(
                a.tokens, b.tokens,
                err_msg=f"event-driven diverged (paged={paged})")
            assert b.steps <= mn
        assert not srv._active and not srv._queue


def test_drain_run_matches_windowed():
    """run_drain() (the WHOLE scheduler — admit via lax.switch prefill,
    decode, collect — compiled into one device while_loop) must reproduce
    run()'s outputs exactly: same request->tokens map and step counts,
    under mixed budgets/prompt-buckets and per-request sampling overrides
    so admission, EOS/budget exits and slot reuse all happen inside the
    device loop. Also checks the dispatch count collapses to O(attend
    buckets), the point of the device-resident scheduler."""
    params = init_delay_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    proc = DelayProcessor(ByteFallbackTokenizer(), None, CFG)
    grids = [_continuation_grid(proc, f"drain wave {i}" + " pad" * (6 * (i % 2)),
                                seed=90 + i)
             for i in range(5)]
    budgets = [24, 9, 17, 31, 12]
    overrides = [None, {"audio_temperature": 0.9, "audio_top_p": 0.8},
                 None, {"text_temperature": 0.7}, None]
    seeds = [None, 7, None, 11, None]

    def serve(drain):
        srv = DelayBatchServer(
            params, CFG, slots=2, cache_len=512, out_capacity=64,
            prompt_bucket=32, dtype=jnp.float32,
            sampling=make_sampling(text_temperature=0.0,
                                   audio_temperature=0.0))
        rids = [srv.submit(g, max_new_tokens=mn, sampling=ov, seed=sd)
                for g, mn, ov, sd in zip(grids, budgets, overrides, seeds)]
        run = srv.run_drain if drain else srv.run
        done = {c.request_id: c for c in run(max_steps=800)}
        assert sorted(done) == sorted(rids)
        return [done[r] for r in rids], srv

    ref, _ = serve(drain=False)
    got, srv = serve(drain=True)
    for a, b, mn in zip(ref, got, budgets):
        np.testing.assert_array_equal(a.tokens, b.tokens,
                                      err_msg="drain diverged")
        assert a.steps == b.steps <= mn
    assert not srv._active and not srv._queue
    assert srv.total_dispatches <= 3  # one per attend bucket, not per poll


def test_drain_rejects_paged_and_busy():
    params = init_delay_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    srv = DelayBatchServer(params, CFG, slots=2, cache_len=256,
                           out_capacity=64, prompt_bucket=32,
                           dtype=jnp.float32, paged=True, page_size=64)
    with pytest.raises(ValueError, match="linear"):
        srv.run_drain()
