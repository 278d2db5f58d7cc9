"""MossTTSLocal — global temporal transformer + per-frame depth ("local")
transformer, time-synchronous RVQ blocks.

Capability parity: ``/root/reference/moss_tts_local/modeling_moss_tts.py``
(MosiTTSModel :495-565, MossTTSLocalTransformer :178-292, CustomMixin._sample
:315-477). TPU-first redesign:

  * the reference's depth loop re-runs the 4-layer local transformer over a
    growing prefix for every codebook with NO cache — O(Nq^2) per frame
    (its attention asserts past_key_value is None, :149). Ours runs the
    depth pass as single cached steps under one jitted frame program —
    O(Nq), the whole frame is one XLA computation (what the reference would
    have needed torch.compile for);
  * per-channel sampling parameters (``generation_config.layers``) become
    traced arrays indexed inside the scan — one compile for any sampling
    config; dynamic per-channel top-k uses a rank mask inside a static
    top-64 subset;
  * variable-bitrate inference (``n_vq_for_inference``) is a static scan
    width (progressive sequence dropout, moss_tts_local/README.md:33-46).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LocalConfig, Qwen3Config
from ..nn.qwen3 import KVCache, init_kv_cache, init_qwen3_params, qwen3_forward
from ..ops.quant import QuantWeight, take_weight
from ..ops.basic import dense, rms_norm
from ..ops.sampling import NEG_INF, apply_repetition_penalty_seen, seen_mask_update

TOPK_WIDTH = 64  # static top-k working set for dynamic per-channel k


# --------------------------------------------------------------------------
# Params
# --------------------------------------------------------------------------

def _init_mlp(rng, d_in: int, d_ffn: int, d_out: int, n: Optional[int] = None,
              dtype=jnp.float32, std=0.02):
    k1, k2, k3 = jax.random.split(rng, 3)
    lead = () if n is None else (n,)

    def nrm(k, shape):
        return (jax.random.normal(k, lead + shape, jnp.float32) * std).astype(dtype)

    return {"gate": nrm(k1, (d_in, d_ffn)), "up": nrm(k2, (d_in, d_ffn)),
            "down": nrm(k3, (d_ffn, d_out))}


def _mlp(p, x, idx=None):
    """SwiGLU adapter (reference MossTTSMLP :47-95, prenorm off)."""
    if idx is None:
        g, u, d = p["gate"], p["up"], p["down"]
    else:
        # take_weight, NOT [idx]: on a stacked QuantWeight, [idx] would
        # select a NamedTuple FIELD (q/scale), not the idx-th slice
        g, u, d = (take_weight(p["gate"], idx), take_weight(p["up"], idx),
                   take_weight(p["down"], idx))
    h = jax.nn.silu(dense(x, g)) * dense(x, u)
    return dense(h, d)


def init_local_params(rng: jax.Array, cfg: LocalConfig, dtype=jnp.float32):
    lc = cfg.language_config
    dl = cfg.local_hidden_size
    D = lc.hidden_size
    F = cfg.additional_mlp_ffn_hidden_size
    Va = cfg.audio_emb_vocab
    ks = jax.random.split(rng, 10)
    std = cfg.initializer_range

    def nrm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    return {
        "text_emb": nrm(ks[0], (lc.vocab_size, D)),
        "audio_emb": nrm(ks[1], (cfg.n_vq, Va, D)),
        "backbone": init_qwen3_params(ks[2], lc, dtype=dtype, with_embed=False),
        "local": init_qwen3_params(ks[3], cfg.local_transformer_config, dtype=dtype, with_embed=False),
        "mlp_in": _init_mlp(ks[4], D, F, dl, dtype=dtype),
        "mlp_out_text": _init_mlp(ks[5], dl, F, D, dtype=dtype),
        "mlp_out_audio": _init_mlp(ks[6], dl, F, D, n=cfg.n_vq, dtype=dtype),
        "ln_text": jnp.ones((D,), dtype),
        "ln_audio": jnp.ones((cfg.n_vq, D), dtype),
        "text_head": nrm(ks[7], (D, lc.vocab_size)),
        "audio_heads": nrm(ks[8], (cfg.n_vq, D, Va)),
    }


def local_embed(params, cfg: LocalConfig, ids: jax.Array, n_vq_infer: int) -> jax.Array:
    """Sum embeddings over channels 0..n_vq_infer (reference
    _prepare_multi_modal_inputs :515-530 honours the truncation)."""
    Va = cfg.audio_emb_vocab
    emb = jnp.take(params["text_emb"], ids[..., 0], axis=0)
    n = min(cfg.n_vq, n_vq_infer)
    if n > 0:
        flat = params["audio_emb"][:n].reshape(n * Va, -1)
        offs = (jnp.arange(n, dtype=ids.dtype) * Va)[None, None, :]
        audio = jnp.take(flat, jnp.clip(ids[..., 1 : 1 + n], 0, Va - 1) + offs, axis=0)
        emb = emb + jnp.sum(audio.astype(emb.dtype), axis=-2)
    return emb


# --------------------------------------------------------------------------
# Per-channel sampling controls
# --------------------------------------------------------------------------

class LocalSampling(NamedTuple):
    """Per-channel arrays (C,) built from DelayGenerationConfig.layers
    (moss_tts_local/README.md:108-126)."""
    temperature: jax.Array  # (C,) f32
    top_p: jax.Array  # (C,) f32
    top_k: jax.Array  # (C,) int32 (0 => off)
    repetition_penalty: jax.Array  # (C,) f32 (1.0 => off; ch0 always off)
    do_sample: jax.Array  # (C,) bool


def make_local_sampling(layers, do_samples, channels: int) -> LocalSampling:
    def get(i, key, default):
        if layers is None or i >= len(layers):
            return default
        v = layers[i].get(key)
        return default if v is None else v

    temps = [float(get(i, "temperature", 1.0)) for i in range(channels)]
    tps = [float(get(i, "top_p", 1.0)) for i in range(channels)]
    tks = [int(get(i, "top_k", 0) or 0) for i in range(channels)]
    rps = [1.0 if i == 0 else float(get(i, "repetition_penalty", 1.0)) for i in range(channels)]
    ds = [bool(do_samples[i]) if do_samples is not None else True for i in range(channels)]
    return LocalSampling(
        temperature=jnp.asarray(temps, jnp.float32),
        top_p=jnp.asarray(tps, jnp.float32),
        top_k=jnp.asarray(tks, jnp.int32),
        repetition_penalty=jnp.asarray(rps, jnp.float32),
        do_sample=jnp.asarray(ds, jnp.bool_),
    )


def _sample_channel(rng, logits, temp, top_p, top_k, do_sample):
    """HF warper order: temperature -> top-k -> top-p (CustomMixin :356-374),
    with dynamic k inside a static TOPK_WIDTH subset."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temp, 1e-6)
    width = min(TOPK_WIDTH, logits.shape[-1])
    vals, idx = jax.lax.top_k(scaled, width)  # desc
    ranks = jnp.arange(width)
    k_eff = jnp.where(top_k > 0, jnp.minimum(top_k, width), width)
    vals = jnp.where(ranks[None, :] < k_eff, vals, NEG_INF)
    probs = jax.nn.softmax(vals.astype(jnp.float32), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    vals = jnp.where((cum - probs) < top_p, vals, NEG_INF)
    choice = jax.random.categorical(rng, vals.astype(jnp.float32), axis=-1)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
    return jnp.where(do_sample, sampled, greedy)


# --------------------------------------------------------------------------
# Generation
# --------------------------------------------------------------------------

def local_loss(
    params, cfg: LocalConfig,
    ids: jax.Array,  # (B, T, 1+n_vq)
    attention_mask: jax.Array,  # (B, T)
    labels: jax.Array,  # (B, T, 1+n_vq), -100 ignore
    channel_weights: Optional[jax.Array] = None,  # (C,)
    n_vq_infer: Optional[int] = None,
    remat: bool = False,
):
    """Teacher-forced training loss (reference MossTTSDelayModel.forward,
    moss_tts_local/modeling_moss_tts.py:652-743): backbone hidden feeds depth
    position 0; positions 1..C-1 embed the (masked) label channels; the depth
    transformer runs over (B*T, C, Dl) blocks; per-channel CE with weights."""
    B, T, C = ids.shape
    lc = cfg.language_config
    lcfg = cfg.local_transformer_config
    n = n_vq_infer or cfg.n_vq
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    embeds = local_embed(params, cfg, ids, n)
    hidden, _ = qwen3_forward(
        params["backbone"], lc, embeds, positions=positions,
        kv_valid=attention_mask, remat=remat,
    )  # (B, T, D)

    # depth inputs: [g_t, emb_0(lab_0), ..., emb_{C-2}(lab_{C-2})]
    Va = cfg.audio_emb_vocab
    lab = labels
    valid_lab = lab != -100
    safe = jnp.where(valid_lab, lab, 0)
    chans = [hidden]
    text_e = jnp.take(params["text_emb"], safe[..., 0], axis=0)
    chans.append(jnp.where(valid_lab[..., 0:1], text_e, 0.0))
    for i in range(C - 2):
        e = jnp.take(params["audio_emb"][i], jnp.clip(safe[..., i + 1], 0, Va - 1), axis=0)
        chans.append(jnp.where(valid_lab[..., i + 1 : i + 2], e, 0.0))
    blocks = jnp.stack(chans, axis=2)  # (B, T, C, D)
    blocks = _mlp(params["mlp_in"], blocks)  # (B, T, C, Dl)
    flat = blocks.reshape(B * T, C, -1)

    h, _ = qwen3_forward(
        params["local"], lcfg, flat,
        positions=jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None], (B * T, C)),
        kv_valid=jnp.ones((B * T, C), jnp.bool_),
        use_rope=False, remat=remat,
    )  # (B*T, C, Dl)

    def ce(logits, labch):
        valid = labch != -100
        sf = jnp.where(valid, labch, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, sf[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        cnt = jnp.maximum(valid.sum(), 1)
        return nll.sum() / cnt

    losses = []
    y0 = rms_norm(_mlp(params["mlp_out_text"], h[:, 0]), params["ln_text"], lcfg.rms_norm_eps)
    logits0 = dense(y0, params["text_head"])
    losses.append(ce(logits0.reshape(B, T, -1), labels[..., 0]))
    for i in range(C - 1):
        y = _mlp(params["mlp_out_audio"], h[:, i + 1], idx=i)
        y = rms_norm(y, params["ln_audio"][i], lcfg.rms_norm_eps)
        logits = dense(y, take_weight(params["audio_heads"], i))
        losses.append(ce(logits.reshape(B, T, -1), labels[..., i + 1]))
    loss_all = jnp.stack(losses)
    if channel_weights is None:
        w = jnp.ones((C,), jnp.float32)
    else:
        w = jnp.asarray(channel_weights, jnp.float32)
    w = w / w.sum()
    return (loss_all * w).sum(), {"loss_all": loss_all}


class LocalGenState(NamedTuple):
    cache: KVCache
    kv_valid: jax.Array  # (B, S)
    cur_ids: jax.Array  # (B, 1, C)
    pos: jax.Array
    step: jax.Array
    rng: jax.Array
    unfinished: jax.Array  # (B,)
    seen_text: jax.Array  # (B, V) rep-penalty bitmask, text channel
    seen_audio: jax.Array  # (B, n_vq, Va)
    out: jax.Array  # (B, max_new, C)


def _depth_decode(params, cfg: LocalConfig, rng, g: jax.Array,
                  sampling: LocalSampling, seen_text, seen_audio,
                  n_vq_infer: int):
    """One frame's depth pass: text channel + n_vq_infer audio channels,
    each a single cached step of the 4-layer local transformer."""
    lcfg = cfg.local_transformer_config
    B = g.shape[0]
    C_run = 1 + min(cfg.n_vq, n_vq_infer)
    Va = cfg.audio_emb_vocab

    cache = init_kv_cache(lcfg, B, C_run, dtype=g.dtype)
    kv_valid_full = jnp.ones((B, C_run), jnp.bool_)

    def depth_step(x, cache, k: int):
        h, cache = qwen3_forward(
            params["local"], lcfg, x[:, None, :],
            positions=jnp.full((B, 1), k, jnp.int32),
            kv_valid=kv_valid_full & (jnp.arange(C_run)[None] <= k),
            cache=cache, cache_offset=k, use_rope=False,
        )
        return h[:, 0], cache

    rngs = jax.random.split(rng, C_run)
    x0 = _mlp(params["mlp_in"], g)
    h0, cache = depth_step(x0, cache, 0)
    y0 = rms_norm(_mlp(params["mlp_out_text"], h0), params["ln_text"], lcfg.rms_norm_eps)
    logits0 = dense(y0, params["text_head"]).astype(jnp.float32)
    tok0 = _sample_channel(
        rngs[0], logits0, sampling.temperature[0], sampling.top_p[0],
        sampling.top_k[0], sampling.do_sample[0],
    )
    x = _mlp(params["mlp_in"], jnp.take(params["text_emb"], tok0, axis=0))

    # scan over audio channels 1..C_run-1
    def body(carry, xs):
        x, cache = carry
        k, rng_k = xs
        h, cache = depth_step(x, cache, k)

        mo = params["mlp_out_audio"]
        y = (jax.nn.silu(dense(h, take_weight(mo["gate"], k - 1)))
             * dense(h, take_weight(mo["up"], k - 1)))
        y = dense(y, take_weight(mo["down"], k - 1))
        y = rms_norm(y, jnp.take(params["ln_audio"], k - 1, axis=0), lcfg.rms_norm_eps)
        head_k = take_weight(params["audio_heads"], k - 1)
        if isinstance(head_k, QuantWeight):
            logits = jnp.einsum(
                "bd,dv->bv", y, head_k.q.astype(y.dtype),
                preferred_element_type=jnp.float32,
            ) * head_k.scale
        else:
            logits = jnp.einsum(
                "bd,dv->bv", y, head_k, preferred_element_type=jnp.float32,
            )
        logits = logits.at[:, cfg.audio_pad_code].set(NEG_INF)
        seen_k = jax.lax.dynamic_index_in_dim(seen_audio, k - 1, axis=1, keepdims=False)
        do_s = jnp.take(sampling.do_sample, k)
        # processors (incl. penalty) only run on sampled channels
        # (reference CustomMixin :361-363 skips when do_samples[i] is False)
        rp = jnp.where(do_s, jnp.take(sampling.repetition_penalty, k), 1.0)
        logits = apply_repetition_penalty_seen(logits, seen_k, rp)
        tok = _sample_channel(
            rng_k, logits,
            jnp.take(sampling.temperature, k), jnp.take(sampling.top_p, k),
            jnp.take(sampling.top_k, k), do_s,
        )
        Va_ = cfg.audio_emb_vocab
        flat = params["audio_emb"].reshape(cfg.n_vq * Va_, -1)
        emb = jnp.take(flat, tok + (k - 1) * Va_, axis=0)
        x = _mlp(params["mlp_in"], emb)
        return (x, cache), tok

    ks = jnp.arange(1, C_run, dtype=jnp.int32)
    (x, cache), toks = jax.lax.scan(body, (x, cache), (ks, rngs[1:]))
    # toks: (C_run-1, B) -> (B, C_run-1)
    audio_toks = jnp.transpose(toks, (1, 0))
    # channels beyond n_vq_infer zero-filled (reference :425-427)
    if C_run - 1 < cfg.n_vq:
        fill = jnp.zeros((B, cfg.n_vq - (C_run - 1)), jnp.int32)
        audio_toks = jnp.concatenate([audio_toks, fill], axis=1)
    return tok0, audio_toks


def local_frame_step(
    params, cfg: LocalConfig, state: LocalGenState, sampling: LocalSampling,
    *, n_vq_infer: int, eos_token_id: int, attend_len: Optional[int] = None,
) -> LocalGenState:
    B = state.cur_ids.shape[0]
    lc = cfg.language_config
    rng, rng_depth = jax.random.split(state.rng)

    # (B,) per-row cursors = continuous-batching server state (slots sit at
    # different conversation lengths); scalar = the solo/lock-step engines
    per_row = jnp.ndim(state.pos) == 1

    embeds = local_embed(params, cfg, state.cur_ids, n_vq_infer)
    if per_row:
        positions = state.pos[:, None].astype(jnp.int32)
        cache_offset = state.pos
    else:
        positions = jnp.broadcast_to(state.pos[None, None], (B, 1)).astype(jnp.int32)
        # scalar offset -> sliced KV write. An earlier round recorded the
        # per-row scatter as faster, but that was the contaminated fixed-
        # overhead timing (CLAUDE.md): marginal-rate A/B shows the scatter
        # costs several ms/step at serving batches (7.7 ms at 8B/128)
        cache_offset = state.pos
    hidden, cache = qwen3_forward(
        params["backbone"], lc, embeds,
        positions=positions, kv_valid=state.kv_valid,
        cache=state.cache,
        cache_offset=cache_offset,
        attend_len=attend_len,
    )
    g = hidden[:, -1]

    tok0, audio = _depth_decode(
        params, cfg, rng_depth, g, sampling, state.seen_text, state.seen_audio,
        n_vq_infer,
    )
    # finished rows force eos on ch0, pad elsewhere (reference :429-432)
    tok0 = jnp.where(state.unfinished, tok0, eos_token_id)
    audio = jnp.where(state.unfinished[:, None], audio, cfg.audio_pad_code)
    unfinished = state.unfinished & (tok0 != eos_token_id)

    n_act = min(cfg.n_vq, n_vq_infer)
    active = (jnp.arange(cfg.n_vq)[None, :] < n_act) & state.unfinished[:, None]
    seen_audio = seen_mask_update(
        state.seen_audio, jnp.clip(audio, 0, cfg.audio_emb_vocab - 1), active=active
    )
    seen_text = seen_mask_update(state.seen_text, tok0, active=state.unfinished)

    frame = jnp.concatenate([tok0[:, None], audio], axis=1)
    if per_row:
        rows = jnp.arange(B)
        cap = state.out.shape[1]
        S = state.kv_valid.shape[1]
        out = state.out.at[rows, jnp.clip(state.step, 0, cap - 1)].set(frame)
        # only ADVANCING rows validate their next slot — a frozen row's
        # next slot is never written, so marking it valid would attend
        # garbage; stopped/idle rows also freeze their cursor
        adv = state.unfinished
        kv_valid = state.kv_valid.at[
            rows, jnp.clip(state.pos + 1, 0, S - 1)].max(adv)
        pos_next = state.pos + adv.astype(jnp.int32)
        step_next = state.step + adv.astype(jnp.int32)
    else:
        out = jax.lax.dynamic_update_slice(
            state.out, frame[:, None, :], (0, state.step, 0))
        kv_valid = state.kv_valid.at[:, state.pos + 1].set(True)
        pos_next = state.pos + 1
        step_next = state.step + 1

    return state._replace(
        cache=cache, kv_valid=kv_valid, cur_ids=frame[:, None, :],
        pos=pos_next, step=step_next, rng=rng,
        unfinished=unfinished, seen_text=seen_text, seen_audio=seen_audio, out=out,
    )


def local_prefill_split(
    params, cfg: LocalConfig,
    input_ids: jax.Array, attention_mask: jax.Array,
    *, max_new_tokens: int, cache_len: int, rng: jax.Array,
    n_vq_infer: int, dtype=jnp.bfloat16,
) -> LocalGenState:
    """Prefill all but the last prompt row; the last row becomes ``cur_ids``
    so the first decode step produces the first frame."""
    B, T, C = input_ids.shape
    lc = cfg.language_config
    Va = cfg.audio_emb_vocab

    cache = init_kv_cache(lc, B, cache_len, dtype=dtype)
    kv_valid = jnp.zeros((B, cache_len), jnp.bool_).at[:, :T].set(attention_mask)
    positions = jnp.broadcast_to(jnp.arange(T - 1, dtype=jnp.int32)[None], (B, T - 1))
    embeds = local_embed(params, cfg, input_ids[:, : T - 1], n_vq_infer)
    _, cache = qwen3_forward(
        params["backbone"], lc, embeds,
        positions=positions, kv_valid=kv_valid, cache=cache, cache_offset=0,
    )

    # rep-penalty history from the prompt (per-channel, per-sample)
    seen_text = jnp.any(
        jax.nn.one_hot(input_ids[..., 0], lc.vocab_size, dtype=jnp.bool_)
        & attention_mask[:, :, None],
        axis=1,
    )
    hot = jax.nn.one_hot(jnp.clip(input_ids[:, :, 1:], 0, Va - 1), Va, dtype=jnp.bool_)
    seen_audio = jnp.any(hot & attention_mask[:, :, None, None], axis=1)

    return LocalGenState(
        cache=cache,
        kv_valid=kv_valid,
        cur_ids=input_ids[:, T - 1 : T, :],
        pos=jnp.int32(T - 1),
        step=jnp.int32(0),
        rng=rng,
        unfinished=jnp.ones((B,), jnp.bool_),
        seen_text=seen_text,
        seen_audio=seen_audio,
        out=jnp.zeros((B, max_new_tokens, C), jnp.int32),
    )
