"""MossTTSDelay — TPU-native multi-head RVQ transformer with delay-pattern
decoding.

Capability parity target: ``/root/reference/moss_tts_delay/modeling_moss_tts.py``
(forward :225-390, generate :392-525). Re-designed for XLA rather than
translated:

  * the 32 audio embedding tables / 33 LM heads are stacked into single
    ``(n_vq, vocab, D)`` / ``(n_vq, D, vocab)`` arrays so embedding-sum and
    head projection are one gather / one einsum per step (reference loops
    over 33 ``nn.Linear``s);
  * ``generate`` becomes a fixed-shape jitted step over a donated carry —
    the per-sample boolean-indexed counters of the reference
    (audio_lengths / delayed_lengths / is_audio / is_stopping,
    :425-513) are ``jnp.where`` lattices; the int64-max sentinel becomes an
    int32 ``SENTINEL`` safely away from overflow;
  * repetition penalty keeps a per-(sample, channel) vocab bitmask rather
    than re-uniquing the growing history every step (see ops/sampling.py).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DelayConfig
from ..nn.qwen3 import (KVCache, init_kv_cache, init_quant_kv_cache,
                        init_qwen3_params, qwen3_forward)
from ..ops.basic import dense
from ..ops.sampling import (
    align_rows,
    apply_repetition_penalty_seen,
    is_key_batch,
    sample_topk_topp,
    seen_mask_update,
    split_keys,
    find_last_equal,
)

# Plain numpy scalar, NOT jnp: a module-level jnp constant dispatches an
# eager convert_element_type onto the default backend at IMPORT time —
# on this environment's remote-TPU tunnel, importing the package with a
# skewed libtpu then dies before any entry point runs (this was the root
# cause of two rounds of red multichip driver artifacts).
SENTINEL = np.int32(1 << 30)
NEG_INF = -1e30


def _audio_head_logits(hidden, heads):
    """(B,T,D) x (n,D,V) -> (B,T,n,V); heads may be int8-quantized."""
    from ..ops.quant import QuantWeight

    if isinstance(heads, QuantWeight):
        logits = jnp.einsum(
            "btd,ndv->btnv", hidden, heads.q.astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        )
        return logits * heads.scale[None, None]
    return jnp.einsum(
        "btd,ndv->btnv", hidden, heads, preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------------
# Params
# --------------------------------------------------------------------------

def init_delay_params(rng: jax.Array, cfg: DelayConfig, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    lc = cfg.language_config
    D = lc.hidden_size
    Va = cfg.audio_emb_vocab
    std = cfg.initializer_range

    def nrm(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    return {
        "backbone": init_qwen3_params(k1, lc, dtype=dtype, with_embed=True),
        "audio_emb": nrm(k2, (cfg.n_vq, Va, D)),
        "text_head": nrm(k3, (D, lc.vocab_size)),
        "audio_heads": nrm(k4, (cfg.n_vq, D, Va)),
    }


def delay_embed(params, cfg: DelayConfig, ids: jax.Array) -> jax.Array:
    """ids (B, T, 1+n_vq) -> summed embeddings (B, T, D).

    Channel 0 uses the backbone text embedding; channels 1..n_vq use the
    stacked audio tables (reference get_input_embeddings :196-213)."""
    Va = cfg.audio_emb_vocab
    emb = jnp.take(params["backbone"]["embed"], ids[..., 0], axis=0)
    flat = params["audio_emb"].reshape(cfg.n_vq * Va, -1)
    offs = (jnp.arange(cfg.n_vq, dtype=ids.dtype) * Va)[None, None, :]
    audio = jnp.take(flat, ids[..., 1:] + offs, axis=0)  # (B, T, n_vq, D)
    return emb + jnp.sum(audio.astype(emb.dtype), axis=-2)


def delay_forward(
    params,
    cfg: DelayConfig,
    ids: jax.Array,  # (B, T, 1+n_vq)
    *,
    positions: jax.Array,
    kv_valid: jax.Array,
    cache: Optional[KVCache] = None,
    cache_offset: jax.Array | int = 0,
    attend_len: Optional[int] = None,
    hidden_out_layers: Optional[list] = None,
    logits_len: Optional[int] = None,
    text_lazy: bool = False,
    remat: bool = False,
    pipeline=None,  # (Mesh with a 'stage' axis, n_micro) — training only
) -> Tuple[jax.Array, jax.Array, Optional[KVCache]]:
    """Returns (text_logits (B,T,V), audio_logits (B,T,n_vq,Va), cache).
    The last audio vocab index (== pad code) is masked to -inf, matching
    reference forward :292-300.

    ``logits_len`` restricts the LM heads to the last ``logits_len``
    positions (prefill only samples from the final position; materializing
    (B, T, 152k) fp32 prompt logits would cost gigabytes at flagship scale).

    ``hidden_out_layers`` optionally sources each head from a different
    backbone layer (MusicGen-style, reference forward :278-289); entry 0 is
    the text head, entries 1..n_vq the audio heads; indices follow HF
    hidden_states (0 = embeddings, -1 = post-final-norm last layer).
    Supported on both the cached (decode) and uncached paths — the backbone
    scan emits per-layer hiddens as scan outputs.

    ``text_lazy=True`` returns the text head's SOURCE hidden state (B, T, D)
    in place of text logits — the decode step then computes the 152k-vocab
    projection only when some batch row actually samples free text
    (inside audio blocks the channel is restricted to the gen/delay slot
    pair; see _sample_text_lazy)."""
    embeds = delay_embed(params, cfg, ids)
    if hidden_out_layers is not None:
        from ..ops.quant import QuantWeight

        if len(hidden_out_layers) != 1 + cfg.n_vq:
            raise ValueError("hidden_out_layers must have 1 + n_vq entries")
        n_hs = cfg.language_config.num_hidden_layers + 1
        idxs = [int(i) % n_hs for i in hidden_out_layers]
        _, (cache, all_hs) = qwen3_forward(
            params["backbone"], cfg.language_config, embeds,
            positions=positions, kv_valid=kv_valid,
            cache=cache, cache_offset=cache_offset, attend_len=attend_len,
            output_hidden_states=True, remat=remat,
        )
        if logits_len is not None:
            all_hs = all_hs[:, :, -logits_len:]
        if text_lazy:
            text_out = all_hs[idxs[0]]
        else:
            text_out = dense(all_hs[idxs[0]], params["text_head"]).astype(jnp.float32)
        # gather the per-head source hiddens once, then one batched einsum
        # over heads (the reference loops 33 nn.Linear's, :294-303)
        audio_hs = all_hs[jnp.asarray(idxs[1:], jnp.int32)]  # (n_vq, B, T, D)
        heads = params["audio_heads"]
        if isinstance(heads, QuantWeight):
            audio_logits = jnp.einsum(
                "nbtd,ndv->btnv", audio_hs, heads.q.astype(audio_hs.dtype),
                preferred_element_type=jnp.float32,
            ) * heads.scale[None, None]
        else:
            audio_logits = jnp.einsum(
                "nbtd,ndv->btnv", audio_hs, heads,
                preferred_element_type=jnp.float32,
            )
        audio_logits = audio_logits.at[..., -1].set(NEG_INF)
        return text_out, audio_logits, cache
    if pipeline is not None:
        # GPipe over the 'stage' mesh axis (parallel/pipeline.py): the
        # embed sum and the 33 heads stay replicated (tiny vs the stack);
        # only the layer scan is staged. No-cache/training path only.
        if cache is not None:
            raise ValueError("pipeline= is a training-path option (no cache)")
        from ..parallel.pipeline import pipelined_qwen3_forward

        pp_mesh, n_micro = pipeline
        hidden = pipelined_qwen3_forward(
            params["backbone"], cfg.language_config, embeds,
            positions=positions, kv_valid=kv_valid,
            mesh=pp_mesh, n_micro=n_micro, remat=remat,
        )
    else:
        hidden, cache = qwen3_forward(
            params["backbone"], cfg.language_config, embeds,
            positions=positions, kv_valid=kv_valid, cache=cache, cache_offset=cache_offset,
            attend_len=attend_len, remat=remat,
        )
    if logits_len is not None:
        hidden = hidden[:, -logits_len:]
    if text_lazy:
        text_out = hidden
    else:
        text_out = dense(hidden, params["text_head"]).astype(jnp.float32)
    audio_logits = _audio_head_logits(hidden, params["audio_heads"])
    audio_logits = audio_logits.at[..., -1].set(NEG_INF)
    return text_out, audio_logits, cache


# --------------------------------------------------------------------------
# Generation state machine
# --------------------------------------------------------------------------

class DelaySampling(NamedTuple):
    """Traced sampling controls (no recompile when values change except the
    static top-k widths)."""
    text_temperature: jax.Array
    text_top_p: jax.Array
    audio_temperature: jax.Array
    audio_top_p: jax.Array
    audio_repetition_penalty: jax.Array
    text_do_sample: jax.Array
    audio_do_sample: jax.Array
    audio_rp_cross_batch: jax.Array


def make_sampling(
    text_temperature=1.5, text_top_p=1.0, audio_temperature=1.7,
    audio_top_p=0.8, audio_repetition_penalty=1.0,
    audio_rp_cross_batch=False,
) -> DelaySampling:
    """temperature <= 0 means greedy (reference generate :406-415).

    ``audio_rp_cross_batch=True`` reproduces the reference's exact
    repetition-penalty semantics: per VQ head, the penalized token set is the
    union of ALL batch rows' histories (inference_utils.py:62-108 flattens
    ``prev_tokens[..., h]`` over the batch). Default keeps the stricter
    per-sample set (identical at batch=1).

    Every knob except ``audio_rp_cross_batch`` also accepts a (B,) array —
    one value PER BATCH ROW (the batch server's per-request generation
    configs; ops.sampling.align_rows broadcasts them at the apply sites).
    temperature <= 0 means greedy for that row."""
    tt = jnp.asarray(text_temperature, jnp.float32)
    at = jnp.asarray(audio_temperature, jnp.float32)
    return DelaySampling(
        text_temperature=jnp.where(tt > 0, tt, 1.0),
        text_top_p=jnp.asarray(text_top_p, jnp.float32),
        audio_temperature=jnp.where(at > 0, at, 1.0),
        audio_top_p=jnp.asarray(audio_top_p, jnp.float32),
        audio_repetition_penalty=jnp.asarray(audio_repetition_penalty,
                                             jnp.float32),
        text_do_sample=tt > 0,
        audio_do_sample=at > 0,
        audio_rp_cross_batch=jnp.bool_(audio_rp_cross_batch),
    )


class DelayGenState(NamedTuple):
    cache: KVCache
    kv_valid: jax.Array  # (B, S)
    cur_ids: jax.Array  # (B, 1, C) token to feed next forward
    pos: jax.Array  # (B,) per-row cache slot where cur_ids will be written
    step: jax.Array  # (B,) per-row decode step counter
    rng: jax.Array
    is_stopping: jax.Array  # (B,)
    is_audio: jax.Array  # (B,)
    audio_lengths: jax.Array  # (B,) int32
    delayed: jax.Array  # (B,) int32, SENTINEL when inactive
    seen: jax.Array  # (B, n_vq, Va) rep-penalty bitmask
    out: jax.Array  # (B, max_new, C) generated frames
    out_valid: jax.Array  # (B, max_new) frame written before stop


def delay_prefill(
    params, cfg: DelayConfig,
    input_ids: jax.Array,  # (B, T, C) left-padded
    attention_mask: jax.Array,  # (B, T) bool
    *,
    max_new_tokens: int,
    cache_len: int,
    rng: jax.Array,
    sampling: DelaySampling,
    top_k_text: int = 50,
    top_k_audio: int = 25,
    dtype=jnp.bfloat16,
    hidden_out_layers: Optional[tuple] = None,
    kv_quant: bool = False,
) -> DelayGenState:
    B, T, C = input_ids.shape
    n_vq = cfg.n_vq
    Va = cfg.audio_emb_vocab
    lc = cfg.language_config

    # kv_quant: int8 cache with per-token/head scales (QuantKVCache) —
    # halves decode HBM traffic; prompt attention stays exact (the prefill
    # attends fresh bf16 k/v, see nn/qwen3.qwen3_forward attend_fresh).
    cache = (init_quant_kv_cache(lc, B, cache_len) if kv_quant
             else init_kv_cache(lc, B, cache_len, dtype=dtype))
    kv_valid = jnp.zeros((B, cache_len), jnp.bool_).at[:, :T].set(attention_mask)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    # one key per row: row b's sampling stream is fully determined by
    # rng[b], so a request keeps its seeded stream when spliced into a
    # continuous-batching slot (callers may pass a scalar key to split, or
    # pre-split (B,) keys for per-request seeds)
    if not is_key_batch(rng):
        rng = jax.random.split(rng, B)

    text_logits, audio_logits, cache = delay_forward(
        params, cfg, input_ids, positions=positions, kv_valid=kv_valid,
        cache=cache, cache_offset=0, logits_len=1,
        hidden_out_layers=hidden_out_layers,
    )

    # continuation init (reference :431-436)
    last_text = input_ids[:, -1, 0]
    is_cont = (last_text == cfg.audio_start_token_id) | (
        last_text == cfg.audio_assistant_gen_slot_token_id
    )
    start_idx = find_last_equal(input_ids[..., 0], cfg.audio_start_token_id)
    audio_start_mask = is_cont & (start_idx != -1)
    audio_lengths = jnp.where(audio_start_mask, T - start_idx, 0).astype(jnp.int32)

    # rep-penalty history includes the prompt's audio channels (reference
    # passes full generation_ids history, :488-503)
    seen = jnp.zeros((B, n_vq, Va), jnp.bool_)
    prompt_audio = jnp.clip(input_ids[:, :, 1:], 0, Va - 1)  # (B, T, n_vq)
    hot = jax.nn.one_hot(prompt_audio, Va, dtype=jnp.bool_)  # (B, T, n_vq, Va)
    hot = jnp.logical_and(hot, attention_mask[:, :, None, None])
    seen = jnp.any(hot, axis=1)

    state = DelayGenState(
        cache=cache,
        kv_valid=kv_valid,
        cur_ids=jnp.zeros((B, 1, C), input_ids.dtype),
        pos=jnp.full((B,), T, jnp.int32),
        step=jnp.zeros((B,), jnp.int32),
        rng=rng,
        is_stopping=jnp.zeros((B,), jnp.bool_),
        is_audio=audio_start_mask,
        audio_lengths=audio_lengths,
        delayed=jnp.full((B,), SENTINEL, jnp.int32),
        seen=seen,
        out=jnp.zeros((B, max_new_tokens, C), jnp.int32),
        out_valid=jnp.zeros((B, max_new_tokens), jnp.bool_),
    )
    # The first "step" samples from the prefill logits directly.
    return _delay_sample_and_update(
        state, cfg, sampling, top_k_text, top_k_audio,
        text_logits[:, -1], audio_logits[:, -1],
    )


def _text_preds(state: DelayGenState, cfg: DelayConfig):
    """State-machine predicates for the text channel — computable BEFORE any
    logits exist (reference generate :438-464 boolean masks)."""
    n_vq = cfg.n_vq
    not_stop = ~state.is_stopping
    forced_delay = not_stop & (state.delayed < n_vq)
    forced_end = not_stop & (state.delayed == n_vq)
    sampling_text = not_stop & (state.delayed > n_vq)  # SENTINEL > n_vq
    is_audio = jnp.where(forced_end, False, state.is_audio)
    first_step = state.step == 0  # per-row step counters
    early = state.step <= n_vq
    return (not_stop, forced_delay, forced_end, sampling_text, is_audio,
            first_step, early)


def _sample_text_full(
    k_text, cfg: DelayConfig, s: DelaySampling, top_k_text: int,
    text_logits: jax.Array,  # (B, V), already temperature-scaled
    is_audio, first_step, early,
) -> jax.Array:
    """Masked full-vocab text sampling (reference generate :451-473)."""
    V = text_logits.shape[-1]
    vocab_ids = jnp.arange(V, dtype=jnp.int32)
    excl0 = (
        (vocab_ids == cfg.pad_token_id)
        | (vocab_ids == cfg.audio_assistant_gen_slot_token_id)
        | (vocab_ids == cfg.audio_assistant_delay_slot_token_id)
        | (vocab_ids == cfg.audio_end_token_id)
    )
    allow1 = (vocab_ids == cfg.audio_assistant_gen_slot_token_id) | (
        vocab_ids == cfg.audio_assistant_delay_slot_token_id
    )
    mask_non_audio = excl0[None, :] & ~is_audio[:, None]
    mask_audio = (~allow1)[None, :] & is_audio[:, None]
    mask_first = first_step[:, None] & (
        vocab_ids == cfg.audio_assistant_delay_slot_token_id)[None, :]
    mask_early = early[:, None] & (vocab_ids == cfg.im_end_token_id)[None, :]
    text_logits = jnp.where(
        mask_non_audio | mask_audio | mask_first | mask_early, NEG_INF, text_logits
    )
    return sample_topk_topp(
        k_text, text_logits, top_k=top_k_text, top_p=s.text_top_p,
        do_sample=s.text_do_sample,
    )


def _sample_text_lazy(
    k_text, cfg: DelayConfig, s: DelaySampling, top_k_text: int,
    hidden: jax.Array,  # (B, D) text-head source hidden
    text_head,  # (D, V) weight, possibly QuantWeight
    sampling_text, is_audio, first_step, early,
) -> jax.Array:
    """Text sampling with the 152k-vocab head behind a ``lax.cond``: inside
    audio blocks the channel is restricted to the {gen_slot, delay_slot}
    pair (reference mask, :461-464), so when NO batch row samples free text
    a 2-column head projection replaces the full GEMV + top-k. Identical
    greedy tokens and identical sampling distribution (all other lanes are
    -inf in the full path).

    MEASURED NET LOSS on v5e, kept only as an option: the conditional
    serializes a region XLA otherwise overlaps with the audio heads and
    sampling, costing ~0.5-0.8 ms/step MORE than the skipped head saves
    (1.7B 10.84 -> 11.34 ms, 8B 21.74 -> 22.51 ms at batch 64). The decode
    step therefore computes the full text logits eagerly; pass
    ``text_head`` to _delay_sample_and_update to opt in."""
    from ..ops.quant import QuantWeight

    need_full = jnp.any(sampling_text & ~is_audio)
    # vocab-ascending order preserves argmax tie-breaking vs the full path
    ids2 = sorted((cfg.audio_assistant_gen_slot_token_id,
                   cfg.audio_assistant_delay_slot_token_id))
    delay_col = ids2.index(cfg.audio_assistant_delay_slot_token_id)
    ids2_arr = jnp.asarray(ids2, jnp.int32)

    def full(h):
        logits = (dense(h, text_head).astype(jnp.float32)
                  / align_rows(s.text_temperature, 2))
        return _sample_text_full(k_text, cfg, s, top_k_text, logits,
                                 is_audio, first_step, early)

    def cheap(h):
        if isinstance(text_head, QuantWeight):
            w2 = text_head.q[:, ids2_arr].astype(h.dtype)
            logits2 = jnp.dot(h, w2, preferred_element_type=jnp.float32)
            logits2 = logits2 * text_head.scale[ids2_arr]
        else:
            logits2 = jnp.dot(h, text_head[:, ids2_arr],
                              preferred_element_type=jnp.float32)
        # replicate dense()'s dtype round-trip so logits match bit-for-bit
        logits2 = (logits2.astype(h.dtype).astype(jnp.float32)
                   / align_rows(s.text_temperature, 2))
        logits2 = jnp.where(
            first_step[:, None]
            & (jnp.arange(2) == delay_col)[None, :], NEG_INF, logits2)
        choice = sample_topk_topp(
            k_text, logits2, top_k=2, top_p=s.text_top_p,
            do_sample=s.text_do_sample,
        )
        return jnp.take(ids2_arr, choice)

    return jax.lax.cond(need_full, full, cheap, hidden)


def _delay_sample_and_update(
    state: DelayGenState, cfg: DelayConfig, s: DelaySampling,
    top_k_text: int, top_k_audio: int,
    text_logits: jax.Array,  # (B, V); or (B, D) hidden when text_head given
    audio_logits: jax.Array,  # (B, n_vq, Va)
    text_head=None,
) -> DelayGenState:
    """One iteration of the delay state machine given this step's logits
    (reference generate :451-513). When ``text_head`` is passed,
    ``text_logits`` is the head's SOURCE hidden and the full projection is
    deferred behind a cond (see _sample_text_lazy)."""
    B = text_logits.shape[0]
    n_vq = cfg.n_vq
    Va = audio_logits.shape[-1]
    # per-row keys (the prefill normalizes to (B,) keys) make a row's
    # sampled stream a function of its own key only — seeded requests
    # reproduce under continuous batching no matter the slot/co-tenants;
    # a legacy scalar key (tests constructing DelayGenState directly)
    # still works batch-shared
    rng, k_text, k_audio = split_keys(state.rng, 3)

    audio_logits = audio_logits / align_rows(s.audio_temperature, 3)

    # ---- text channel -----------------------------------------------------
    (not_stop, forced_delay, forced_end, sampling_text, is_audio,
     first_step, early) = _text_preds(state, cfg)

    if text_head is not None:
        sampled_text = _sample_text_lazy(
            k_text, cfg, s, top_k_text, text_logits, text_head,
            sampling_text, is_audio, first_step, early,
        )
    else:
        sampled_text = _sample_text_full(
            k_text, cfg, s, top_k_text,
            text_logits / align_rows(s.text_temperature, 2),
            is_audio, first_step, early,
        )
    next_text = jnp.full((B,), cfg.pad_token_id, jnp.int32)
    next_text = jnp.where(sampling_text, sampled_text, next_text)
    next_text = jnp.where(forced_delay, cfg.audio_assistant_delay_slot_token_id, next_text)
    next_text = jnp.where(forced_end, cfg.audio_end_token_id, next_text)

    is_audio = is_audio | (next_text == cfg.audio_start_token_id)
    is_stopping = state.is_stopping | (next_text == cfg.im_end_token_id)

    # ---- audio channels ---------------------------------------------------
    ks = jnp.arange(n_vq, dtype=jnp.int32)[None, :]
    pre_mask = state.audio_lengths[:, None] > ks
    post_mask = (ks > state.delayed[:, None] - 1) | (state.delayed[:, None] == SENTINEL)
    sampling_audio = pre_mask & post_mask  # (B, n_vq)

    rp_seen = jnp.where(
        s.audio_rp_cross_batch,
        jnp.any(state.seen, axis=0, keepdims=True),  # union over batch rows
        state.seen,
    )
    audio_logits = apply_repetition_penalty_seen(
        audio_logits, rp_seen, s.audio_repetition_penalty
    )
    sampled_audio = sample_topk_topp(
        k_audio, audio_logits, top_k=top_k_audio, top_p=s.audio_top_p,
        do_sample=s.audio_do_sample,
    )
    next_audio = jnp.where(sampling_audio, sampled_audio, cfg.audio_pad_code).astype(jnp.int32)

    # ---- counters (reference :505-509) ------------------------------------
    starts_audio = (
        (next_text == cfg.audio_start_token_id)
        | (next_text == cfg.audio_assistant_gen_slot_token_id)
        | (next_text == cfg.audio_assistant_delay_slot_token_id)
    )
    audio_lengths = state.audio_lengths + starts_audio.astype(jnp.int32)
    audio_lengths = jnp.where(next_text == cfg.audio_end_token_id, 0, audio_lengths)
    delayed = jnp.where(
        (state.delayed == SENTINEL)
        & (next_text == cfg.audio_assistant_delay_slot_token_id),
        0, state.delayed,
    )
    delayed = jnp.where(delayed != SENTINEL, delayed + 1, delayed)
    delayed = jnp.where(delayed > n_vq, SENTINEL, delayed)

    seen = seen_mask_update(state.seen, next_audio, active=sampling_audio)

    frame = jnp.concatenate([next_text[:, None], next_audio], axis=-1)  # (B, C)
    rows = jnp.arange(B, dtype=jnp.int32)
    # per-row scatter; steps beyond the out buffer drop (stopped rows idling)
    out = state.out.at[rows, state.step].set(frame, mode="drop")
    out_valid = state.out_valid.at[rows, state.step].set(True, mode="drop")
    # the token we just emitted is attendable iff its row hasn't stopped
    kv_valid = state.kv_valid.at[rows, state.pos].set(~is_stopping, mode="drop")

    return state._replace(
        kv_valid=kv_valid,
        cur_ids=frame[:, None, :],
        pos=state.pos + 0,  # pos advances in the *forward* step
        step=state.step + 1,
        rng=rng,
        is_stopping=is_stopping,
        is_audio=is_audio,
        audio_lengths=audio_lengths,
        delayed=delayed,
        seen=seen,
        out=out,
        out_valid=out_valid,
    )


def delay_decode_step(
    params, cfg: DelayConfig, state: DelayGenState, sampling: DelaySampling,
    *, top_k_text: int = 50, top_k_audio: int = 25,
    attend_len: Optional[int] = None,
    hidden_out_layers: Optional[tuple] = None,
    uniform_slots: bool = False,
) -> DelayGenState:
    """Forward the pending frame, then run the state machine once.
    ``attend_len`` (static bucket) caps how much of the cache the attention
    streams from HBM.

    ``uniform_slots`` (static): pass when every row's cache cursor is
    provably equal — true for the solo engine, whose prefill left-pads the
    batch to one length and whose pos advances unconditionally (+1 for all
    rows, stopped or not). The KV write then lowers to a
    dynamic_update_slice instead of a per-row scatter; the scatter costs
    7.7 ms/step on the 8B batch-128 config (measured, tools/
    probe_step_pieces.py era) because TPU scatter is ~6x slower than the
    sliced write for the same bytes. Continuous-batching servers admit
    rows mid-flight at their own cursors and must keep the default."""
    B = state.cur_ids.shape[0]
    positions = state.pos[:, None].astype(jnp.int32)
    text_logits, audio_logits, cache = delay_forward(
        params, cfg, state.cur_ids,
        positions=positions, kv_valid=state.kv_valid,
        cache=state.cache,
        cache_offset=state.pos[0] if uniform_slots else state.pos,
        attend_len=attend_len,
        hidden_out_layers=hidden_out_layers,
    )
    state = state._replace(cache=cache, pos=state.pos + 1)
    return _delay_sample_and_update(
        state, cfg, sampling, top_k_text, top_k_audio,
        text_logits[:, -1], audio_logits[:, -1],
    )


def delay_loss(
    params, cfg: DelayConfig,
    ids: jax.Array,  # (B, T, C)
    attention_mask: jax.Array,  # (B, T)
    labels: jax.Array,  # (B, T, C), -100 = ignore
    channelwise_loss_weight: Optional[jax.Array] = None,  # (C,)
    remat: bool = False,
    pipeline=None,
):
    """Multi-channel CE training loss (reference forward :302-378): summed
    per-sample/per-channel losses normalised by valid-token counts, with
    optional per-channel weights."""
    B, T, C = ids.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    text_logits, audio_logits, _ = delay_forward(
        params, cfg, ids, positions=positions, kv_valid=attention_mask,
        remat=remat, pipeline=pipeline,
    )

    def ce(logits, lab):
        # logits (B,T,V), lab (B,T) with -100 ignore
        valid = lab != -100
        safe = jnp.where(valid, lab, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        return nll.sum(axis=1), valid.sum(axis=1)  # (B,), (B,)

    sums, counts = [], []
    s0, c0 = ce(text_logits, labels[..., 0])
    sums.append(s0)
    counts.append(c0)
    for i in range(cfg.n_vq):
        si, ci = ce(audio_logits[:, :, i], labels[..., i + 1])
        sums.append(si)
        counts.append(ci)
    all_sum = jnp.stack(sums, axis=1)  # (B, C)
    all_cnt = jnp.stack(counts, axis=1)  # (B, C)

    if channelwise_loss_weight is not None:
        w = jnp.asarray(channelwise_loss_weight, jnp.float32)
        ch_loss = all_sum.sum(0) / jnp.clip(all_cnt.sum(0).astype(jnp.float32), 1.0, None)
        loss = (ch_loss * w).sum() / w.sum()
    else:
        ch_loss = all_sum.sum(0) / jnp.clip(all_cnt.sum(0).astype(jnp.float32), 1.0, None)
        loss = all_sum.sum() / jnp.clip(all_cnt.sum().astype(jnp.float32), 1.0, None)
    return loss, {"channel_losses": ch_loss, "token_counts": all_cnt.sum(0)}


def delay_train_step(params, cfg: DelayConfig, batch, lr: float = 1e-4):
    """One SGD step over the multi-channel LM loss — the training-step
    program ``dryrun_multichip`` shards over the ('data','model') mesh."""
    (loss, aux), grads = jax.value_and_grad(
        lambda p: delay_loss(p, cfg, batch["input_ids"], batch["attention_mask"],
                             batch["labels"]),
        has_aux=True,
    )(params)
    new_params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), params, grads)
    return new_params, loss, aux


def delay_decode_until_event(
    params, cfg: DelayConfig, state: DelayGenState, sampling: DelaySampling,
    watch: jax.Array,  # (B,) bool — rows whose completion ends the block
    budget_left: jax.Array,  # (B,) int32 — steps remaining per watched row
    max_steps: jax.Array,  # scalar int32 — dynamic cap (attend bucket bound)
    *, top_k_text: int = 50, top_k_audio: int = 25,
    attend_len: Optional[int] = None,
) -> Tuple[DelayGenState, jax.Array]:
    """Decode until a SCHEDULING EVENT: any watched row stops (EOS) or
    exhausts its token budget, or ``max_steps`` elapse. Returns
    ``(state, steps_executed)``.

    This is the device-side stop-flag polling that lets a continuous-
    batching server cover MANY poll windows with ONE dispatch: instead of
    the host fetching stop flags every ``poll_every`` steps (each fixed-
    size block paying the full program-dispatch floor — ~30-45 ms on a
    tunneled chip, and still real locally), the while_loop's cond watches
    the flags ON DEVICE and the program runs exactly until the scheduler
    has an actionable event (a slot to collect/refill). Dispatch cost then
    scales with the COMPLETION rate, not the step rate. Per-step math is
    identical to ``delay_decode_step``, so tokens are bit-equal to the
    windowed dispatch. ``max_steps`` is a traced scalar (one compiled
    program per attend bucket, not per cap).

    Replaces the host-driven poll loop the reference serves with
    (reference moss_tts_realtime/app.py:951-954 runs one request at a
    time; our windowed fallback is engine/batch_server.py:_dispatch_block).
    """

    def cond(carry):
        st, i = carry
        event = watch & (st.is_stopping | (i >= budget_left))
        return (i < max_steps) & ~jnp.any(event)

    def body(carry):
        st, i = carry
        st = delay_decode_step(
            params, cfg, st, sampling,
            top_k_text=top_k_text, top_k_audio=top_k_audio,
            attend_len=attend_len,
        )
        return st, i + 1

    return jax.lax.while_loop(cond, body, (state, jnp.int32(0)))


def delay_generate_on_device(
    params, cfg: DelayConfig, state: DelayGenState, sampling: DelaySampling,
    *, max_new_tokens: int, top_k_text: int = 50, top_k_audio: int = 25,
    attend_len: Optional[int] = None,
    hidden_out_layers: Optional[tuple] = None,
    uniform_slots: bool = False,
) -> DelayGenState:
    """Decode segment as one ``lax.while_loop`` program — zero host
    round-trips (the TPU equivalent of the reference's per-step python loop
    under tqdm, :442). The engine chains segments with growing
    ``attend_len`` buckets."""

    def cond(st: DelayGenState):
        return (jnp.min(st.step) < max_new_tokens) & ~jnp.all(st.is_stopping)

    def body(st: DelayGenState):
        return delay_decode_step(
            params, cfg, st, sampling,
            top_k_text=top_k_text, top_k_audio=top_k_audio,
            attend_len=attend_len,
            hidden_out_layers=hidden_out_layers,
            uniform_slots=uniform_slots,
        )

    return jax.lax.while_loop(cond, body, state)
