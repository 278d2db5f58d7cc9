"""MossTTSRealtime — hierarchical text/audio interleaving for incremental
streaming synthesis.

Capability parity: ``/root/reference/moss_tts_realtime/mossttsrealtime/``
(modeling_mossttsrealtime.py:80-187, modeling_mossttsrealtime_local.py,
streaming_mossttsrealtime.py:35-418). TPU-first redesign: the whole frame —
backbone 1-token forward + 16-codebook depth loop + windowed repetition
penalty + sampling — is ONE jitted program (the reference needs
``@torch.compile(fullgraph=True)`` + StaticCache for just the depth loop,
streaming:301-357). The depth transformer reuses the Qwen3 block (RoPE
theta 1e6, QK-norm, GQA) with a 17-slot static cache.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import Qwen3Config, RealtimeConfig, RealtimeLocalConfig
from ..nn.qwen3 import KVCache, init_kv_cache, init_qwen3_params, qwen3_forward
from ..ops.basic import dense
from ..ops.sampling import NEG_INF, apply_repetition_penalty_seen, window_seen_mask

REP_WINDOW = 50  # reference default repetition_window (streaming:136)


def local_qwen_cfg(lc: RealtimeLocalConfig) -> Qwen3Config:
    return Qwen3Config(
        vocab_size=1,
        hidden_size=lc.hidden_size,
        intermediate_size=lc.intermediate_size,
        num_hidden_layers=lc.num_hidden_layers,
        num_attention_heads=lc.num_attention_heads,
        num_key_value_heads=lc.num_key_value_heads,
        head_dim=lc.head_dim,
        rms_norm_eps=lc.rms_norm_eps,
        rope_theta=lc.rope_theta,
        max_position_embeddings=lc.max_position_embeddings,
    )


def init_realtime_params(rng: jax.Array, cfg: RealtimeConfig, dtype=jnp.float32):
    lc = cfg.language_config
    loc = cfg.local_config
    ks = jax.random.split(rng, 6)
    std = cfg.initializer_range

    def nrm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    return {
        "text_emb": nrm(ks[0], (lc.vocab_size, lc.hidden_size)),
        "audio_emb": nrm(ks[1], (cfg.rvq, cfg.audio_vocab_size, lc.hidden_size)),
        "backbone": init_qwen3_params(ks[2], lc, dtype=dtype, with_embed=False),
        "local": init_qwen3_params(ks[3], local_qwen_cfg(loc), dtype=dtype, with_embed=False),
        # depth position i>=1 embeds the previous codebook token with table
        # i-1 (reference modeling_..._local.py:274-276)
        "local_emb": nrm(ks[4], (cfg.rvq - 1, loc.audio_vocab_size, loc.hidden_size)),
        "local_heads": nrm(ks[5], (cfg.rvq, loc.hidden_size, loc.audio_vocab_size)),
    }


def realtime_embed(params, cfg: RealtimeConfig, ids: jax.Array) -> jax.Array:
    """ids (B, T, 1+rvq) -> summed embeddings (reference
    get_input_embeddings :101-109)."""
    Va = cfg.audio_vocab_size
    emb = jnp.take(params["text_emb"], ids[..., 0], axis=0)
    flat = params["audio_emb"].reshape(cfg.rvq * Va, -1)
    offs = (jnp.arange(cfg.rvq, dtype=ids.dtype) * Va)[None, None, :]
    audio = jnp.take(flat, jnp.clip(ids[..., 1:], 0, Va - 1) + offs, axis=0)
    return emb + jnp.sum(audio.astype(emb.dtype), axis=-2)


class RealtimeSampling(NamedTuple):
    temperature: jax.Array
    top_p: jax.Array
    repetition_penalty: jax.Array
    do_sample: jax.Array
    use_penalty: jax.Array


def make_rt_sampling(temperature=0.8, top_p=0.6, repetition_penalty=1.1,
                     do_sample=True) -> RealtimeSampling:
    """Every knob also accepts a (B,) array — one value per batch row
    (RealtimeBatchServer per-request generation configs; align_rows
    broadcasts at the apply sites). temperature 0 means greedy."""
    rp = 1.0 if repetition_penalty is None else repetition_penalty
    t = jnp.asarray(temperature, jnp.float32)
    rp = jnp.asarray(rp, jnp.float32)
    return RealtimeSampling(
        temperature=t,
        top_p=jnp.asarray(top_p, jnp.float32),
        repetition_penalty=rp,
        do_sample=jnp.asarray(do_sample, jnp.bool_) & (t != 0.0),
        use_penalty=rp != 1.0,
    )


def _rt_sample(rng, logits, s: RealtimeSampling, top_k: int):
    """Reference sampling order (streaming:338-356): penalty on RAW logits
    (done by caller), then temperature -> top-k -> top-p -> multinomial."""
    from ..ops.sampling import align_rows

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / align_rows(jnp.maximum(s.temperature, 1e-6), logits.ndim)
    k = min(top_k, logits.shape[-1]) if top_k and top_k > 0 else logits.shape[-1]
    vals, idx = jax.lax.top_k(scaled, k)
    probs = jax.nn.softmax(vals.astype(jnp.float32), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    vals = jnp.where((cum - probs) < align_rows(s.top_p, cum.ndim), vals, NEG_INF)
    choice = jax.random.categorical(rng, vals.astype(jnp.float32), axis=-1)
    sampled = jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)
    return jnp.where(align_rows(s.do_sample, sampled.ndim), sampled, greedy)


def depth_generate_frame(
    params, cfg: RealtimeConfig, rng,
    hidden: jax.Array,  # (B, D) backbone last hidden
    history: jax.Array,  # (B, Hlen, rvq) generated frames (ring not needed; Hlen static)
    hist_len: jax.Array,  # int32 frames generated so far: scalar, or (B,) per row
    sampling: RealtimeSampling,
    *, top_k: int = 30,
) -> jax.Array:
    """16-codebook depth loop as a ``lax.scan`` -> (B, rvq) frame
    (reference generate_local_transformer, streaming:301-357)."""
    loc = cfg.local_config
    lq = local_qwen_cfg(loc)
    B = hidden.shape[0]
    R = cfg.rvq
    Va = loc.audio_vocab_size

    cache = init_kv_cache(lq, B, R, dtype=hidden.dtype)
    kv_valid = jnp.ones((B, R), jnp.bool_)
    rngs = jax.random.split(rng, R)

    # windowed repetition history mask per codebook: (B, rvq, Va)
    H = history.shape[1]
    W = min(REP_WINDOW, H)
    if jnp.ndim(hist_len) == 1:
        # per-row cursors (continuous-batching server): each slot's window
        # ends at its own hist_len
        start = jnp.clip(hist_len - W, 0, max(H - W, 0))  # (B,)
        idx = start[:, None] + jnp.arange(W, dtype=jnp.int32)[None]  # (B, W)
        win = jnp.take_along_axis(
            history, jnp.broadcast_to(idx[:, :, None], (B, W, R)), axis=1)
        valid = jnp.broadcast_to(
            (idx < hist_len[:, None])[:, None, :], (B, R, W))
    else:
        start = jnp.clip(hist_len - W, 0, max(H - W, 0))
        win = jax.lax.dynamic_slice_in_dim(history, start, W, axis=1)  # (B, W, rvq)
        v = (start + jnp.arange(W)) < hist_len  # (W,)
        valid = jnp.broadcast_to(v[None, None], (B, R, W))
    seen = window_seen_mask(jnp.transpose(win, (0, 2, 1)), Va, valid=valid)
    # (B, rvq, Va)

    def step(carry, xs):
        x, cache = carry
        i, rng_i = xs
        h, cache = qwen3_forward(
            params["local"], lq, x[:, None, :],
            positions=jnp.full((B, 1), i, jnp.int32),
            kv_valid=kv_valid & (jnp.arange(R)[None] <= i),
            cache=cache, cache_offset=i,
        )
        heads = params["local_heads"]
        from ..ops.quant import QuantWeight

        if isinstance(heads, QuantWeight):
            logits = jnp.einsum(
                "bd,dv->bv", h[:, 0],
                jnp.take(heads.q, i, axis=0).astype(h.dtype),
                preferred_element_type=jnp.float32,
            ) * jnp.take(heads.scale, i, axis=0)
        else:
            logits = jnp.einsum(
                "bd,dv->bv", h[:, 0], jnp.take(heads, i, axis=0),
                preferred_element_type=jnp.float32,
            )
        seen_i = jax.lax.dynamic_index_in_dim(seen, i, axis=1, keepdims=False)
        rp = jnp.where(sampling.use_penalty, sampling.repetition_penalty, 1.0)
        logits = apply_repetition_penalty_seen(logits, seen_i, rp)
        tok = _rt_sample(rng_i, logits, sampling, top_k)
        # next position's embedding: table i (used at position i+1); at the
        # final i it's unused
        emb_i = jnp.take(params["local_emb"], jnp.minimum(i, R - 2), axis=0)
        x_next = jnp.take(emb_i, jnp.clip(tok, 0, Va - 1), axis=0).astype(x.dtype)
        return (x_next, cache), tok

    (x, cache), toks = jax.lax.scan(
        step, (hidden, cache), (jnp.arange(R, dtype=jnp.int32), rngs)
    )
    return jnp.transpose(toks, (1, 0))  # (B, rvq)


def realtime_loss(
    params, cfg: RealtimeConfig,
    ids: jax.Array,  # (B, T, 1+rvq)
    attention_mask: jax.Array,  # (B, T)
    labels: jax.Array,  # (B, T, 1+rvq), -100 ignore; audio channels trained
    remat: bool = False,
):
    """Training forward (reference modeling_mossttsrealtime.py:149-171):
    backbone runs over the grid; frames whose audio labels are all -100 are
    skipped; the local transformer is teacher-forced per frame with the
    backbone hidden of the PREVIOUS position as depth slot 0; loss is CE over
    the rvq codebooks.

    The reference gathers only the trainable frames; on TPU we keep the
    fixed (B, T) lattice and mask — identical loss, static shapes."""
    lc = cfg.language_config
    loc = cfg.local_config
    lq = local_qwen_cfg(loc)
    B, T, C = ids.shape
    R = cfg.rvq
    Va = loc.audio_vocab_size

    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    embeds = realtime_embed(params, cfg, ids)
    hidden, _ = qwen3_forward(
        params["backbone"], lc, embeds, positions=positions,
        kv_valid=attention_mask, remat=remat,
    )

    audio_labels = labels[..., 1:]  # (B, T, R)
    train_mask = ~jnp.all(audio_labels == -100, axis=-1)  # (B, T)
    # depth slot 0 = hidden at position t-1 (clamped), reference :157
    prev_hidden = jnp.concatenate([hidden[:, :1], hidden[:, :-1]], axis=1)

    # depth inputs: slot 0 prev_hidden; slot i>=1 embeds label codebook i-1
    safe = jnp.where(audio_labels == -100, loc.audio_pad_token, audio_labels)
    safe = jnp.clip(safe, 0, Va - 1)
    chans = [prev_hidden]
    for i in range(R - 1):
        chans.append(jnp.take(params["local_emb"][i], safe[..., i], axis=0))
    blocks = jnp.stack(chans, axis=2).reshape(B * T, R, -1)

    h, _ = qwen3_forward(
        params["local"], lq, blocks,
        positions=jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None], (B * T, R)),
        kv_valid=jnp.ones((B * T, R), jnp.bool_), remat=remat,
    )  # (B*T, R, D)
    logits = jnp.einsum(
        "brd,rdv->brv", h, params["local_heads"], preferred_element_type=jnp.float32
    ).reshape(B, T, R, Va)

    valid = (audio_labels != -100) & train_mask[..., None]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    return nll.sum() / count, {"trained_frames": train_mask.sum()}


class RealtimeState(NamedTuple):
    """Carried decode state for one conversation (multi-turn KV reuse ==
    cache carry + mask concat, reference streaming:78-87,177-179)."""
    cache: KVCache
    kv_valid: jax.Array  # (B, S)
    cur_len: jax.Array  # scalar: cache slots used
    last_audio: jax.Array  # (B, rvq)
    is_stopping: jax.Array  # (B,)
    history: jax.Array  # (B, H, rvq) generated frames for rep-penalty window
    hist_len: jax.Array  # scalar
    rng: jax.Array


def realtime_prefill_step(
    params, cfg: RealtimeConfig, state: RealtimeState,
    input_ids: jax.Array,  # (B, T, 1+rvq) new rows (left-padded)
    row_valid: jax.Array,  # (B, T)
    sampling: RealtimeSampling,
    *, top_k: int = 30, attend_len: Optional[int] = None,
) -> Tuple[RealtimeState, jax.Array]:
    """Feed T new rows at the current cache offset, then decode the first
    frame. Returns (state, frame (B, rvq)).

    ``state.cur_len``/``state.hist_len`` may be (B,) per-row cursors
    (continuous-batching server: slots sit at different conversation
    lengths); that path supports T == 1 only — admission prefills run as a
    batch-k group through the scalar path and are scatter-spliced in."""
    B, T, _ = input_ids.shape
    lc = cfg.language_config
    per_row = jnp.ndim(state.cur_len) == 1
    S = state.kv_valid.shape[1]
    H = state.history.shape[1]
    if per_row:
        if T != 1:
            raise ValueError("per-row-cursor states decode one row at a time")
        pos = state.cur_len  # (B,)
        positions = pos[:, None]
        kv_valid = state.kv_valid.at[
            jnp.arange(B), jnp.clip(pos, 0, S - 1)].set(row_valid[:, 0])
        cache_offset = pos
    else:
        offset = state.cur_len
        positions = (offset + jnp.arange(T, dtype=jnp.int32))[None].repeat(B, axis=0)
        kv_valid = jax.lax.dynamic_update_slice(state.kv_valid, row_valid, (0, offset))
        # single-token steps take the per-row scatter write path. This is
        # SHAPE-DEPENDENT, re-measured 2026-08 with marginal timing: at the
        # realtime frame shape (B=8, 28 layers, fused with the depth scan)
        # the sliced write REGRESSED the frame 19.5 -> 40.9 ms wall, while
        # the delay/local engines at batch 64-128 win 7-44% from the slice
        # (models/delay.py uniform_slots). Keep the scatter here.
        cache_offset = jnp.full((B,), offset, jnp.int32) if T == 1 else offset
    embeds = realtime_embed(params, cfg, input_ids)
    hidden, cache = qwen3_forward(
        params["backbone"], lc, embeds,
        positions=positions, kv_valid=kv_valid, cache=state.cache,
        cache_offset=cache_offset, attend_len=attend_len,
    )
    rng, rng_f = jax.random.split(state.rng)
    frame = depth_generate_frame(
        params, cfg, rng_f, hidden[:, -1], state.history, state.hist_len,
        sampling, top_k=top_k,
    )
    if per_row:
        history = state.history.at[
            jnp.arange(B), jnp.clip(state.hist_len, 0, H - 1)].set(frame)
        # stopped/idle rows freeze their cache cursor (masked writes land on
        # the same never-valid slot instead of burning cache)
        new_cur = pos + row_valid[:, 0].astype(jnp.int32)
    else:
        history = jax.lax.dynamic_update_slice(
            state.history, frame[:, None, :], (0, state.hist_len, 0)
        )
        new_cur = state.cur_len + T
    is_stopping = state.is_stopping | (frame[:, 0] == cfg.audio_eos_token)
    return (
        state._replace(
            cache=cache, kv_valid=kv_valid, cur_len=new_cur,
            last_audio=frame, is_stopping=is_stopping,
            history=history, hist_len=state.hist_len + 1, rng=rng,
        ),
        frame,
    )


def realtime_decode_step(
    params, cfg: RealtimeConfig, state: RealtimeState,
    text_token: jax.Array,  # (B,)
    sampling: RealtimeSampling,
    *, top_k: int = 30, attend_len: Optional[int] = None,
) -> Tuple[RealtimeState, jax.Array]:
    """One frame: input row = [text_token | prev audio frame]; the new row's
    mask bit is ~is_stopping (reference streaming:241-242)."""
    B = text_token.shape[0]
    step_ids = jnp.concatenate(
        [text_token[:, None, None].astype(jnp.int32), state.last_audio[:, None, :]], axis=2
    )
    row_valid = (~state.is_stopping)[:, None]
    new_state, frame = realtime_prefill_step(
        params, cfg, state, step_ids, row_valid, sampling, top_k=top_k,
        attend_len=attend_len,
    )
    # frozen rows keep their last frame (reference returns last tokens when
    # finished, streaming:223-224)
    frame = jnp.where(state.is_stopping[:, None], state.last_audio, frame)
    new_state = new_state._replace(
        last_audio=frame,
        is_stopping=state.is_stopping | (frame[:, 0] == cfg.audio_eos_token),
    )
    return new_state, frame


def init_realtime_state(
    cfg: RealtimeConfig, batch: int, cache_len: int, max_frames: int,
    rng: jax.Array, dtype=jnp.bfloat16,
) -> RealtimeState:
    return RealtimeState(
        cache=init_kv_cache(cfg.language_config, batch, cache_len, dtype=dtype),
        kv_valid=jnp.zeros((batch, cache_len), jnp.bool_),
        cur_len=jnp.int32(0),
        last_audio=jnp.full((batch, cfg.rvq), cfg.audio_pad_token, jnp.int32),
        is_stopping=jnp.zeros((batch,), jnp.bool_),
        history=jnp.zeros((batch, max_frames, cfg.rvq), jnp.int32),
        hist_len=jnp.int32(0),
        rng=rng,
    )


def init_realtime_srv_state(
    cfg: RealtimeConfig, slots: int, cache_len: int, max_frames: int,
    rng: jax.Array, dtype=jnp.bfloat16,
) -> RealtimeState:
    """Per-row-cursor variant for the continuous-batching server: cur_len /
    hist_len are (slots,) arrays and every slot starts IDLE (is_stopping
    frozen) until a request is spliced in."""
    st = init_realtime_state(cfg, slots, cache_len, max_frames, rng, dtype=dtype)
    return st._replace(
        cur_len=jnp.zeros((slots,), jnp.int32),
        hist_len=jnp.zeros((slots,), jnp.int32),
        is_stopping=jnp.ones((slots,), jnp.bool_),
    )
