"""Realtime model tests: processor grids, engine prefill/step/finish,
multi-turn cache reuse, streaming session + bridge."""
import numpy as np
import jax.numpy as jnp
import pytest

from mosstts_tpu.core.config import RealtimeConfig, RealtimeLocalConfig, tiny_qwen3
from mosstts_tpu.engine.realtime_engine import RealtimeEngine
from mosstts_tpu.engine.streaming import (
    AudioStreamDecoder,
    RealtimeStreamingSession,
    TextDeltaTokenizer,
    sanitize_audio_tokens,
)
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


@pytest.fixture(scope="module")
def proc():
    return RealtimeProcessor(ByteFallbackTokenizer(), channels=RVQ)


@pytest.fixture(scope="module")
def engine():
    return RealtimeEngine.random_init(
        seed=0, config=CFG, dtype=jnp.float32, max_length=64, cache_len=512,
        prefill_bucket=1,
    )


def test_make_ensemble_voice_clone(proc):
    tokens = np.arange(RVQ * 5).reshape(5, RVQ) % 1024
    grid = proc.make_ensemble(tokens)
    assert grid.shape[1] == RVQ + 1
    rows = np.where(grid[:, 0] == proc.audio_pad_token_id)[0]
    assert len(rows) == 5
    np.testing.assert_array_equal(grid[rows, 1:], tokens)
    # without a prompt, all audio channels are pad
    grid2 = proc.make_ensemble(None)
    assert (grid2[:, 1:] == proc.audio_channel_pad).all()


def test_make_user_prompt_text_leads_audio(proc):
    text = "hello world this is a much longer sentence for the test"
    audio = np.ones((6, RVQ), np.int64) * 7
    grid = proc.make_user_prompt(text, audio)
    prefill = "<|im_end|>\n<|im_start|>user\n"
    start = len(proc.tokenizer.encode(prefill))
    a0 = start + proc.delay_tokens_len
    # audio bos marker just before, eos just after (reference :149-153)
    assert grid[a0 - 1, 1] == proc.audio_bos_token
    np.testing.assert_array_equal(grid[a0 : a0 + 6, 1:], audio)
    assert grid[a0 + 6, 1] == proc.audio_eos_token
    # trailing begin-of-response rows
    tail = proc.tokenizer.decode(list(grid[-12:, 0]))
    assert tail.endswith("<|im_start|>assistant\n")


def test_prefill_step_finish(engine, proc):
    user_audio = np.random.default_rng(0).integers(0, 1024, (8, RVQ))
    sys_grid = proc.make_ensemble(None)
    user_grid = proc.make_user_prompt("hello streaming world", user_audio)
    turn = np.concatenate([sys_grid, user_grid], axis=0)

    engine.reset_generation_state(keep_cache=False)
    text_ids = proc.tokenizer.encode("this is the reply text")
    frame = engine.prefill([turn], [text_ids[:6]], do_sample=False, temperature=0.0)
    assert frame.shape == (1, RVQ)
    f2 = engine.step(text_ids[6], do_sample=False, temperature=0.0)
    assert f2.shape == (1, RVQ)
    outs = engine.finish(max_steps=4, do_sample=False, temperature=0.0)
    assert len(outs) <= 4
    assert len(engine.generated_tokens) >= 2


def test_multi_turn_cache_reuse(engine, proc):
    engine.reset_generation_state(keep_cache=False)
    user_audio = np.random.default_rng(1).integers(0, 1024, (4, RVQ))
    turn1 = np.concatenate(
        [proc.make_ensemble(None), proc.make_user_prompt("turn one", user_audio)], axis=0
    )
    engine.prefill([turn1], [proc.tokenizer.encode("reply one")[:4]],
                   do_sample=False, temperature=0.0)
    used_after_t1 = int(np.asarray(engine.state.cur_len))
    engine.step(None, do_sample=False, temperature=0.0)

    # turn 2 keeps the cache: cursor continues past turn 1
    engine.reset_generation_state(keep_cache=True)
    turn2 = proc.make_user_prompt("turn two", user_audio)
    engine.prefill([turn2], [proc.tokenizer.encode("reply two")[:4]],
                   do_sample=False, temperature=0.0)
    used_after_t2 = int(np.asarray(engine.state.cur_len))
    assert used_after_t2 > used_after_t1 + turn2.shape[0] - 1

    # reset_cache=False then True
    engine.reset_generation_state(keep_cache=False)
    assert engine.state is None


def test_deterministic_greedy(engine, proc):
    user_audio = np.random.default_rng(2).integers(0, 1024, (4, RVQ))
    turn = np.concatenate(
        [proc.make_ensemble(None), proc.make_user_prompt("determinism", user_audio)], axis=0
    )
    frames = []
    for _ in range(2):
        engine.reset_generation_state(keep_cache=False)
        f = engine.prefill([turn], [proc.tokenizer.encode("say this")[:4]],
                           do_sample=False, temperature=0.0)
        f2 = engine.step(None, do_sample=False, temperature=0.0)
        frames.append((f.copy(), f2.copy()))
    np.testing.assert_array_equal(frames[0][0], frames[1][0])
    np.testing.assert_array_equal(frames[0][1], frames[1][1])


def test_sanitize_audio_tokens():
    t = np.array([[1, 2], [1026, 0], [3, 4]])
    out, stop = sanitize_audio_tokens(t, codebook_size=1024, audio_eos_token=1026)
    assert stop and out.shape[0] == 1
    t2 = np.array([[1, 2], [3, 2000]])
    out2, stop2 = sanitize_audio_tokens(t2, codebook_size=1024, audio_eos_token=1026)
    assert stop2 and out2.shape[0] == 1
    t3 = np.array([[1, 2], [3, 4]])
    out3, stop3 = sanitize_audio_tokens(t3, codebook_size=1024, audio_eos_token=1026)
    assert not stop3 and out3.shape[0] == 2


def test_text_delta_tokenizer_stability():
    tok = ByteFallbackTokenizer()
    tdt = TextDeltaTokenizer(tok, hold_back=3)
    full = "hello world, this is a delta streaming test."
    ids = []
    for i in range(0, len(full), 5):
        ids.extend(tdt.push_delta(full[i : i + 5]))
    ids.extend(tdt.flush())
    assert ids == tok.encode(full)


def test_stream_decoder_crossfade_lengths():
    class FakeCodec:
        codebook_size = 1024

        def decode(self, tokens, chunk_duration=None, **kw):
            # 10 samples per frame
            T = np.asarray(tokens).shape[1]
            return {"audio": [np.ones(T * 10, np.float32)]}

    dec = AudioStreamDecoder(FakeCodec(), chunk_frames=4, overlap_frames=1)
    dec.push_tokens(np.zeros((9, RVQ), np.int64))
    chunks = list(dec.audio_chunks())
    assert len(chunks) == 2
    # first chunk passes through; second merges with the 10-sample tail
    assert chunks[0].size == 40
    assert chunks[1].size == 40  # tail(10) + chunk(40) - overlap(10)
    tailwav = dec.flush()
    assert tailwav is not None


def test_batch_generate_nonstreaming(engine, proc):
    """Non-streaming batch path (reference inferencer.py:178-297 analogue)."""
    rng = np.random.default_rng(5)
    grids, text_ids = [], []
    for t in ["reply one", "a longer reply two"]:
        user_audio = rng.integers(0, 1024, (4, RVQ))
        grid = np.concatenate(
            [proc.make_ensemble(None), proc.make_user_prompt("q", user_audio)], axis=0
        )
        grids.append(grid)
        text_ids.append(proc.tokenizer.encode(t))
    frames = engine.generate(grids, text_ids, max_length=12, prefill_text_len=4,
                             do_sample=False, temperature=0.0)
    assert len(frames) == 2
    for f in frames:
        assert f.ndim == 2 and f.shape[1] == RVQ
        # trimmed at EOS if any
        if f.shape[0]:
            assert (f[:, 0] != engine.config.audio_eos_token).all()


def test_cache_growth_toward_max_context(proc):
    """A conversation exceeding the initial cache grows toward max_context."""
    eng = RealtimeEngine.random_init(
        seed=0, config=CFG, dtype=jnp.float32, max_length=64,
        cache_len=128, prefill_bucket=1,
    )
    eng.max_context = 512
    rng = np.random.default_rng(0)
    user_audio = rng.integers(0, 1024, (30, RVQ))
    turn = np.concatenate(
        [proc.make_ensemble(None), proc.make_user_prompt("grow the cache please", user_audio)],
        axis=0,
    )
    eng.prefill([turn], [proc.tokenizer.encode("reply")[:4]],
                do_sample=False, temperature=0.0)
    start_len = eng.cache_len
    for _ in range(80):
        if eng.is_finished:
            break
        eng.step(None, do_sample=False, temperature=0.0)
    used = int(np.asarray(eng.state.cur_len))
    if used > 128:
        assert eng.cache_len > start_len or start_len >= used
    assert eng.cache_len <= eng.max_context


def test_stream_decoder_crossfade_golden():
    """Exact-value pin for the chunked crossfade contract (reference
    streaming_mossttsrealtime.py:679-804): the oracle below is written
    out inline so any restructuring of AudioStreamDecoder must reproduce
    it sample-for-sample, including the proportional-overlap flush and
    the re-emitted head of the previous tail."""
    class SeqCodec:
        codebook_size = 1024

        def __init__(self):
            self.calls = 0

        def decode(self, tokens, chunk_duration=None, **kw):
            T = np.asarray(tokens).shape[1]
            self.calls += 1
            wav = 100.0 * self.calls + np.arange(T * 5, dtype=np.float32)
            return {"audio": [wav]}

    dec = AudioStreamDecoder(SeqCodec(), chunk_frames=4, overlap_frames=2)
    dec.push_tokens(np.zeros((5, RVQ), np.int64))
    dec.push_tokens(np.zeros((6, RVQ), np.int64))  # split pushes: 11 frames
    chunks = list(dec.audio_chunks())
    assert len(chunks) == 2
    tail = dec.flush()

    w1 = 100.0 + np.arange(20, dtype=np.float32)
    w2 = 200.0 + np.arange(20, dtype=np.float32)
    w3 = 300.0 + np.arange(15, dtype=np.float32)

    def blend(prev_tail, wav, ov):
        fade_out = np.linspace(1.0, 0.0, ov, dtype=np.float32)
        cross = prev_tail[-ov:] * fade_out + wav[:ov] * (1.0 - fade_out)
        return np.concatenate([prev_tail[:-ov], cross, wav[ov:]])

    ov = 10  # 20 samples * overlap/chunk = 20 * 2/4
    np.testing.assert_allclose(chunks[0], w1, rtol=1e-6)
    np.testing.assert_allclose(chunks[1], blend(w1[-ov:], w2, ov), rtol=1e-6)
    # flush: 15-sample final chunk -> overlap int(15*2/4)=7 against the
    # retained 10-sample tail; the 3 unfaded tail samples re-emit
    np.testing.assert_allclose(tail, blend(w2[-ov:], w3, 7), rtol=1e-6)
    assert tail.size == 18


def test_text_delta_tokenizer_incremental_golden():
    """Pin the per-delta emission schedule, not just the concatenation:
    each delta re-encodes the accumulated text and may only emit up to
    len(ids) - hold_back, monotonically (reference :807-851)."""
    tok = ByteFallbackTokenizer()
    tdt = TextDeltaTokenizer(tok, hold_back=3)
    full = "incremental delta emission schedule pin."
    emitted, batches = 0, []
    for i in range(0, len(full), 7):
        out = tdt.push_delta(full[i:i + 7])
        ids_now = tok.encode(full[:i + 7], add_special_tokens=False)
        stable = max(emitted, len(ids_now) - 3)
        assert out == ids_now[emitted:stable]
        emitted = stable
        batches.append(out)
    rest = tdt.flush()
    ids_all = tok.encode(full, add_special_tokens=False)
    assert rest == ids_all[emitted:]
    assert sum(batches, []) + rest == ids_all
    assert tdt.push_delta("") == []


def test_stream_decoder_first_chunk_frames():
    """TTFA lever: first_chunk_frames emits the opening window early (one
    frame), then settles into uniform chunk_frames windows; seams stay
    proportional to each window's size."""
    class SeqCodec:
        codebook_size = 1024

        def decode(self, tokens, chunk_duration=None, **kw):
            T = np.asarray(tokens).shape[1]
            return {"audio": [np.ones(T * 10, np.float32)]}

    dec = AudioStreamDecoder(SeqCodec(), chunk_frames=4, overlap_frames=0,
                             first_chunk_frames=1)
    dec.push_tokens(np.zeros((1, RVQ), np.int64))
    first = list(dec.audio_chunks())
    assert len(first) == 1 and first[0].size == 10  # 1 frame, immediately
    dec.push_tokens(np.zeros((8, RVQ), np.int64))
    rest = list(dec.audio_chunks())
    assert [c.size for c in rest] == [40, 40]
    assert dec.flush() is None
    # default (None) keeps the old uniform behavior
    dec2 = AudioStreamDecoder(SeqCodec(), chunk_frames=4, overlap_frames=0)
    dec2.push_tokens(np.zeros((1, RVQ), np.int64))
    assert list(dec2.audio_chunks()) == []
