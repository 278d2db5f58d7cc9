"""Delay-pattern + decode state machine tests.

The oracle below re-implements, in plain numpy and straight from the spec in
SURVEY.md S3.1 / the reference's documented semantics, the per-step decisions
of MossTTSDelayModel.generate (greedy). Our jitted lattice must match it
step-for-step on scripted logits.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
from mosstts_tpu.ops.delay import apply_delay_pattern, apply_de_delay_pattern
from mosstts_tpu.models.delay import (
    DelayGenState,
    SENTINEL,
    _delay_sample_and_update,
    make_sampling,
)
from mosstts_tpu.nn.qwen3 import init_kv_cache

CFG = DelayConfig(language_config=tiny_qwen3(), n_vq=4)
INF = 10**9


def test_delay_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 1024, size=(11, 4)).astype(np.int64)
    d = apply_delay_pattern(codes, 1024)
    assert d.shape == (14, 4)
    # diagonal shift: column k starts after k pads
    for k in range(4):
        assert (d[:k, k] == 1024).all()
        assert (d[k : k + 11, k] == codes[:, k]).all()
        assert (d[k + 11 :, k] == 1024).all()
    back = apply_de_delay_pattern(d)
    np.testing.assert_array_equal(back, codes)


def _oracle(cfg: DelayConfig, text_logit_seq, audio_logit_seq):
    """Greedy single-sample oracle of the reference decode state machine."""
    V = text_logit_seq[0].shape[-1]
    n_vq = cfg.n_vq
    pad_code = cfg.audio_pad_code
    is_stopping = False
    is_audio = False
    audio_len = 0
    delayed = INF
    frames = []
    for t, (tl, al) in enumerate(zip(text_logit_seq, audio_logit_seq)):
        tl = tl.copy()
        al = al.copy()
        if is_stopping:
            next_text = cfg.pad_token_id
        elif delayed < n_vq:
            next_text = cfg.audio_assistant_delay_slot_token_id
        elif delayed == n_vq:
            next_text = cfg.audio_end_token_id
            is_audio = False
        else:
            if not is_audio:
                tl[
                    [
                        cfg.pad_token_id,
                        cfg.audio_assistant_gen_slot_token_id,
                        cfg.audio_assistant_delay_slot_token_id,
                        cfg.audio_end_token_id,
                    ]
                ] = -np.inf
            else:
                keep = np.full(V, -np.inf)
                keep[cfg.audio_assistant_gen_slot_token_id] = tl[
                    cfg.audio_assistant_gen_slot_token_id
                ]
                keep[cfg.audio_assistant_delay_slot_token_id] = tl[
                    cfg.audio_assistant_delay_slot_token_id
                ]
                tl = keep
            if t == 0:
                tl[cfg.audio_assistant_delay_slot_token_id] = -np.inf
            if t <= n_vq:
                tl[cfg.im_end_token_id] = -np.inf
            next_text = int(np.argmax(tl))
        if next_text == cfg.audio_start_token_id:
            is_audio = True
        if next_text == cfg.im_end_token_id:
            is_stopping = True

        ks = np.arange(n_vq)
        pre = audio_len > ks
        post = np.ones(n_vq, bool) if delayed == INF else (ks > delayed - 1)
        samp = pre & post
        al[..., -1] = -np.inf
        next_audio = np.where(samp, np.argmax(al, axis=-1), pad_code)

        if next_text in (
            cfg.audio_start_token_id,
            cfg.audio_assistant_gen_slot_token_id,
            cfg.audio_assistant_delay_slot_token_id,
        ):
            audio_len += 1
        if next_text == cfg.audio_end_token_id:
            audio_len = 0
        if delayed == INF and next_text == cfg.audio_assistant_delay_slot_token_id:
            delayed = 0
        if delayed != INF:
            delayed += 1
        if delayed > n_vq:
            delayed = INF
        frames.append((next_text, next_audio))
    return frames


def test_state_machine_matches_oracle():
    cfg = CFG
    n_vq = cfg.n_vq
    V = cfg.language_config.vocab_size
    Va = cfg.audio_emb_vocab
    rng = np.random.default_rng(7)
    n_steps = 16

    # Scripted greedy preferences: step0 audio_start, then gen x4,
    # then delay (starts flush), then whatever; audio logits random.
    text_seq, audio_seq = [], []
    for t in range(n_steps):
        tl = rng.standard_normal(V).astype(np.float32)
        tl[151640:151670] -= 100.0  # keep special ids out of generic argmax
        if t == 0:
            tl[cfg.audio_start_token_id] = 200.0
        elif t <= 4:
            tl[cfg.audio_assistant_gen_slot_token_id] = 200.0
            tl[cfg.audio_assistant_delay_slot_token_id] = 150.0
        else:
            tl[cfg.audio_assistant_delay_slot_token_id] = 200.0
            tl[cfg.im_end_token_id] = 190.0
        text_seq.append(tl)
        audio_seq.append(rng.standard_normal((n_vq, Va)).astype(np.float32))

    want = _oracle(cfg, text_seq, audio_seq)

    # Drive our jitted lattice with the same logits.
    B = 1
    state = DelayGenState(
        cache=init_kv_cache(cfg.language_config, B, 8, dtype=jnp.float32),
        kv_valid=jnp.zeros((B, 8), jnp.bool_),
        cur_ids=jnp.zeros((B, 1, cfg.channels), jnp.int32),
        pos=jnp.zeros((B,), jnp.int32),
        step=jnp.zeros((B,), jnp.int32),
        rng=jax.random.PRNGKey(0),
        is_stopping=jnp.zeros((B,), jnp.bool_),
        is_audio=jnp.zeros((B,), jnp.bool_),
        audio_lengths=jnp.zeros((B,), jnp.int32),
        delayed=jnp.full((B,), SENTINEL, jnp.int32),
        seen=jnp.zeros((B, n_vq, Va), jnp.bool_),
        out=jnp.zeros((B, n_steps, cfg.channels), jnp.int32),
        out_valid=jnp.zeros((B, n_steps), jnp.bool_),
    )
    sampling = make_sampling(text_temperature=0.0, audio_temperature=0.0)
    step_fn = jax.jit(
        lambda st, tl, al: _delay_sample_and_update(
            st, cfg, sampling, 50, 25, tl, al
        )
    )
    for t in range(n_steps):
        state = step_fn(
            state, jnp.asarray(text_seq[t])[None], jnp.asarray(audio_seq[t])[None]
        )

    out = np.asarray(state.out)[0]  # (n_steps, C)
    for t, (wt, wa) in enumerate(want):
        assert out[t, 0] == wt, f"step {t}: text {out[t,0]} != oracle {wt}"
        np.testing.assert_array_equal(out[t, 1:], wa, err_msg=f"step {t} audio")

    # Grammar sanity: exactly n_vq delay slots then audio_end then im_end.
    texts = out[:, 0].tolist()
    n_delay = texts.count(cfg.audio_assistant_delay_slot_token_id)
    assert n_delay == n_vq
    assert cfg.audio_end_token_id in texts
    assert cfg.im_end_token_id in texts
    end_i = texts.index(cfg.audio_end_token_id)
    # all channels pad from the audio_end step onward
    assert (out[end_i, 1:] == cfg.audio_pad_code).all()


def test_repetition_penalty_cross_batch_mode():
    """Exact-mode rp reproduces the reference's cross-batch union semantics
    (inference_utils.py:62-108 flattens prev_tokens[..., h] over the batch);
    default mode keeps penalties per-sample."""
    cfg = CFG
    n_vq, Va = cfg.n_vq, cfg.audio_emb_vocab
    V = cfg.language_config.vocab_size
    B = 2

    def fresh_state(n_steps=1):
        return DelayGenState(
            cache=init_kv_cache(cfg.language_config, B, 8, dtype=jnp.float32),
            kv_valid=jnp.zeros((B, 8), jnp.bool_),
            cur_ids=jnp.zeros((B, 1, cfg.channels), jnp.int32),
            pos=jnp.zeros((B,), jnp.int32),
            step=jnp.zeros((B,), jnp.int32),
            rng=jax.random.PRNGKey(0),
            is_stopping=jnp.zeros((B,), jnp.bool_),
            is_audio=jnp.ones((B,), jnp.bool_),
            audio_lengths=jnp.full((B,), n_vq, jnp.int32),  # all channels live
            delayed=jnp.full((B,), SENTINEL, jnp.int32),
            # row 0 has already emitted token 5 on every channel; row 1 nothing
            seen=jnp.zeros((B, n_vq, Va), jnp.bool_).at[0, :, 5].set(True),
            out=jnp.zeros((B, 4, cfg.channels), jnp.int32),
            out_valid=jnp.zeros((B, 4), jnp.bool_),
        )

    # greedy; token 5 slightly beats token 3 unless penalized
    audio_logits = np.full((B, n_vq, Va), -10.0, np.float32)
    audio_logits[..., 5] = 1.0
    audio_logits[..., 3] = 0.5
    text_logits = np.full((B, V), -10.0, np.float32)
    text_logits[:, cfg.audio_assistant_gen_slot_token_id] = 10.0

    def run(cross_batch):
        sampling = make_sampling(
            text_temperature=0.0, audio_temperature=0.0,
            audio_repetition_penalty=100.0, audio_rp_cross_batch=cross_batch,
        )
        st = _delay_sample_and_update(
            fresh_state(), cfg, sampling, 50, 25,
            jnp.asarray(text_logits), jnp.asarray(audio_logits),
        )
        return np.asarray(st.out)[:, 0, 1:]  # (B, n_vq) audio tokens

    per_sample = run(False)
    assert (per_sample[0] == 3).all()   # row 0 saw 5 -> penalized
    assert (per_sample[1] == 5).all()   # row 1 did not -> unpenalized

    exact = run(True)
    assert (exact[0] == 3).all()
    assert (exact[1] == 3).all()        # union over batch penalizes row 1 too


def test_lazy_text_sampling_matches_full_path():
    """decode-step text sampling with the head behind lax.cond
    (_sample_text_lazy) must produce the same greedy tokens as projecting
    the full 152k-vocab logits — both in audio blocks (2-column branch) and
    in free text (full branch)."""
    import jax
    from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
    from mosstts_tpu.models.delay import (
        _delay_sample_and_update, delay_forward, delay_prefill,
        init_delay_params, make_sampling,
    )

    cfg = DelayConfig(language_config=tiny_qwen3(), n_vq=4)
    params = init_delay_params(jax.random.PRNGKey(7), cfg, dtype=jnp.float32)
    sampling = make_sampling(text_temperature=0, audio_temperature=0)
    rng = np.random.default_rng(7)
    B, T = 3, 12
    ids = rng.integers(0, 500, (B, T, cfg.channels))
    ids[:, 2, 0] = cfg.im_start_token_id
    ids[:, 4, 0] = cfg.audio_start_token_id
    # row 0/1 in an open audio block (cheap branch); row 2 free text
    ids[:2, -1, 0] = cfg.audio_assistant_gen_slot_token_id
    mask = np.ones((B, T), bool)

    state = delay_prefill(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                          max_new_tokens=8, cache_len=64,
                          rng=jax.random.PRNGKey(1), sampling=sampling,
                          dtype=jnp.float32)
    for _ in range(5):
        positions = state.pos[:, None].astype(jnp.int32)
        hidden, audio_logits, cache = delay_forward(
            params, cfg, state.cur_ids, positions=positions,
            kv_valid=state.kv_valid, cache=state.cache,
            cache_offset=state.pos, attend_len=64, text_lazy=True)
        text_logits = jnp.einsum("btd,dv->btv", hidden,
                                 params["text_head"]).astype(jnp.float32)
        st = state._replace(cache=cache, pos=state.pos + 1)
        st_lazy = _delay_sample_and_update(
            st, cfg, sampling, 50, 25, hidden[:, -1], audio_logits[:, -1],
            text_head=params["text_head"])
        st_full = _delay_sample_and_update(
            st, cfg, sampling, 50, 25, text_logits[:, -1], audio_logits[:, -1])
        np.testing.assert_array_equal(
            np.asarray(st_lazy.cur_ids), np.asarray(st_full.cur_ids))
        state = st_lazy
