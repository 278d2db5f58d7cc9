"""Qwen3-family decoder backbone as pure functions over a param pytree.

Design (TPU-first, not a torch translation):
  * layer params are stacked on a leading L axis and the forward runs a
    single ``lax.scan`` over layers -> one compiled layer body, fast compiles
    and natural pipelining;
  * the KV cache is a preallocated static-shape buffer written with
    ``dynamic_update_slice`` (the engine donates it across decode steps), in
    place of HF DynamicCache concatenation
    (reference moss_tts_delay/modeling_moss_tts.py:264-276 uses HF
    Qwen3Model + Cache);
  * positions are absolute slot indices; left-padding semantics from the
    reference processors are preserved exactly via the ``kv_valid`` mask
    (reference computes RoPE positions as arange over slots regardless of
    padding, so parity requires the same here).

Weight layout matches HF ``Qwen3Model`` modulo transposition; see
``mosstts_tpu.utils.hf_loader`` for the safetensors name mapping.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import Qwen3Config
from ..ops.basic import apply_rope, dense, rms_norm, rope_cos_sin, swiglu
from ..ops.attention import gqa_attention, gqa_attention_kvmajor

# Pallas flash attention: used for prefill on TPU (fewer HBM round-trips AND
# ~200x faster XLA compiles than the einsum path). Gated by backend + shape.
FLASH_MIN_Q_LEN = 16


def _flash_ok(T: int, hd: int, H: int, KV: int) -> bool:
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return (
        backend not in ("cpu",)
        and T >= FLASH_MIN_Q_LEN
        and hd in (64, 128, 256)
        and H % KV == 0
    )


def _decode_ok(B: int, a_len: int, hd: int, H: int, KV: int) -> bool:
    """Gate for the Pallas flash-decode kernel (single-token cache read).
    MOSSTTS_NO_DECODE_KERNEL=1 forces the einsum path;
    MOSSTTS_FORCE_DECODE_KERNEL=1 lifts the B>=8 floor (both for A/B
    benchmarking — see docs/PROFILE.md batch-1 realtime table)."""
    import os

    if os.environ.get("MOSSTTS_NO_DECODE_KERNEL", ""):
        return False
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    min_b = 1 if os.environ.get("MOSSTTS_FORCE_DECODE_KERNEL", "") else 8
    return (
        backend not in ("cpu",)
        # the kernel's grid is (B, S-tiles); small batches leave too few
        # cells to pipeline and the XLA einsum wins (batch-1 realtime
        # measured slower through the kernel)
        and B >= min_b
        and hd % 128 == 0
        and H % KV == 0
        # full 256-lane tiles only: odd attend lengths (e.g. the realtime
        # depth transformer's 17-slot cache) hit Mosaic vector-cast limits
        and a_len % 256 == 0
    )


class KVCache(NamedTuple):
    """Layer-stacked KV cache, laid out (L, B, KV, S, hd): the trailing
    (S, hd) dims form clean (tile, 128) TPU tiles, so the Pallas decode
    kernel (ops/pallas/decode_attn.py) streams per-head token tiles at full
    HBM bandwidth and the flash prefill kernel consumes cache reads without
    a transpose."""

    k: jax.Array  # (L, B, KV, S, hd)
    v: jax.Array  # (L, B, KV, S, hd)

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def init_kv_cache(cfg: Qwen3Config, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class QuantKVCache(NamedTuple):
    """int8 KV cache with one absmax scale per (layer, row, head, token):
    halves the dominant HBM stream of batched decode (the cache read). The
    Pallas decode kernel dequantizes by folding the scales into the
    score/prob rows (ops/pallas/decode_attn.decode_attention_q8); prefill
    attends the fresh bf16 k/v and only the *write* is quantized, so
    prompt-side attention stays exact."""

    k: jax.Array  # (L, B, KV, S, hd) int8
    v: jax.Array  # (L, B, KV, S, hd) int8
    k_scale: jax.Array  # (L, B, KV, S) f32 — the scale stream is 1/32 of the
    v_scale: jax.Array  # values; bf16 scales trip a Mosaic concat alignment
    #                     limit in the q8 kernel, so f32 stays

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def init_quant_kv_cache(cfg: Qwen3Config, batch: int, max_len: int) -> QuantKVCache:
    shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
    return QuantKVCache(
        jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
        jnp.zeros(shape[:4], jnp.float32), jnp.zeros(shape[:4], jnp.float32),
    )


class PagedKVCache(NamedTuple):
    """KV cache over a shared page pool (vLLM-style, TPU-native): physical
    storage is ``num_pages`` fixed-size pages shared by all rows; row ``b``'s
    logical slot ``s`` lives at ``(table[b, s // P], s % P)``. Unallocated
    table entries point at the reserved trash page 0, which absorbs masked
    writes (idle batch-server slots) — correctness always rides ``kv_valid``
    over LOGICAL slots, exactly like the linear cache.

    The reference holds one HF DynamicCache per request
    (moss_tts_delay/modeling_moss_tts.py:264-276); a page pool is what lets
    a continuous-batching server size KV memory for the *expected* load
    instead of slots x max_len worst case."""

    k: jax.Array  # (L, NP, KV, P, hd)
    v: jax.Array  # (L, NP, KV, P, hd)
    table: jax.Array  # (B, MP) int32 — logical page -> pool page

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def max_len(self) -> int:
        return self.table.shape[1] * self.k.shape[3]


class QuantPagedKVCache(NamedTuple):
    """int8 page pool with per-(token, head) absmax scales — the paged
    counterpart of QuantKVCache (same dequant contract)."""

    k: jax.Array  # (L, NP, KV, P, hd) int8
    v: jax.Array  # (L, NP, KV, P, hd) int8
    k_scale: jax.Array  # (L, NP, KV, P) f32
    v_scale: jax.Array  # (L, NP, KV, P) f32
    table: jax.Array  # (B, MP) int32

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def max_len(self) -> int:
        return self.table.shape[1] * self.k.shape[3]


def init_paged_kv_cache(
    cfg: Qwen3Config, batch: int, max_len: int, num_pages: int,
    page_size: int = 128, dtype=jnp.bfloat16, quant: bool = False,
):
    """``max_len`` is the LOGICAL per-row capacity (the page-table width);
    ``num_pages`` is the physical pool size including trash page 0."""
    assert max_len % page_size == 0, (max_len, page_size)
    mp = max_len // page_size
    shape = (cfg.num_hidden_layers, num_pages, cfg.num_key_value_heads,
             page_size, cfg.head_dim)
    table = jnp.zeros((batch, mp), jnp.int32)
    if quant:
        return QuantPagedKVCache(
            jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape[:4], jnp.float32), jnp.zeros(shape[:4], jnp.float32),
            table)
    return PagedKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), table)


def _quantize_kv_block(x: jax.Array):
    """(B, KV, T, hd) -> int8 values + (B, KV, T) f32 absmax scales."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    sc = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / sc[..., None]), -127, 127)
    return q.astype(jnp.int8), sc


def init_qwen3_params(rng: jax.Array, cfg: Qwen3Config, dtype=jnp.float32, with_embed: bool = True):
    L, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    hd = cfg.head_dim
    keys = jax.random.split(rng, 8)
    std = 0.02

    def nrm(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    params = {
        "layers": {
            "ln1": jnp.ones((L, D), dtype),
            "ln2": jnp.ones((L, D), dtype),
            "wq": nrm(keys[0], (L, D, cfg.q_dim)),
            "wk": nrm(keys[1], (L, D, cfg.kv_dim)),
            "wv": nrm(keys[2], (L, D, cfg.kv_dim)),
            "wo": nrm(keys[3], (L, cfg.q_dim, D)),
            "q_norm": jnp.ones((L, hd), dtype),
            "k_norm": jnp.ones((L, hd), dtype),
            "w_gate": nrm(keys[4], (L, D, I)),
            "w_up": nrm(keys[5], (L, D, I)),
            "w_down": nrm(keys[6], (L, I, D)),
        },
        "final_norm": jnp.ones((D,), dtype),
    }
    if with_embed:
        params["embed"] = nrm(keys[7], (cfg.vocab_size, D))
    return params


def qwen3_forward(
    params,
    cfg: Qwen3Config,
    inputs_embeds: jax.Array,  # (B, T, D)
    *,
    positions: jax.Array,  # (B, T) absolute positions (== cache slots)
    kv_valid: jax.Array,  # (B, S) validity of cache slots (S=T when no cache)
    cache: Optional[KVCache] = None,
    cache_offset: jax.Array | int = 0,  # scalar, or (B,) per-row cursors
    kv_positions: Optional[jax.Array] = None,
    attn_window: Optional[int] = None,
    use_rope: bool = True,
    attend_len: Optional[int] = None,
    output_hidden_states: bool = False,
    remat: bool = False,
    final_norm: bool = True,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Returns (last_hidden_state (B,T,D), updated cache or None).

    ``final_norm=False`` skips the final RMSNorm — a pipeline stage runs a
    SLICE of the layer stack (params with only that stage's "layers"), and
    only the last stage's output gets the final norm (applied by the
    caller; see parallel/pipeline.py).

    ``remat=True`` wraps the layer body in ``jax.checkpoint`` (no-cache /
    training path only): activations inside each layer are recomputed in
    the backward pass instead of stored, cutting peak training memory from
    O(L * per-layer activations) to O(L * residual stream) — what lets an
    8B train step fit real sequence lengths on a v5e slice.

    ``kv_positions`` overrides the cache slots' absolute positions (used by
    ring/sliding-window caches where slot index != position; default is the
    linear cache where slot == position).

    ``attend_len`` (static) restricts attention reads to the first
    ``attend_len`` cache slots — the engine buckets it so a decode step only
    streams the used prefix of the cache from HBM, not the whole
    preallocation (the dominant HBM cost at large batch)."""
    B, T, D = inputs_embeds.shape
    hd, H, KV = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    scale = hd ** -0.5
    eps = cfg.rms_norm_eps
    if output_hidden_states and not final_norm:
        raise ValueError("output_hidden_states requires final_norm=True")

    cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta)  # (B, T, hd)

    offset_per_row = jnp.ndim(cache_offset) == 1
    # linear_slots: cache slot index == absolute position (the default
    # layout); ring/sliding-window callers pass kv_positions explicitly.
    linear_slots = kv_positions is None
    # Flash kernel requires the linear slot==position layout (default),
    # contiguous batch-uniform q positions; ring-cache callers pass
    # kv_positions explicitly and per-row-cursor callers pass (B,) offsets —
    # both keep the einsum path. When there is no cache, slots are exactly
    # q positions only if the q block starts at position 0.
    use_flash = linear_slots and not offset_per_row and _flash_ok(T, hd, H, KV)

    if kv_positions is None:
        if cache is not None:
            S = cache.max_len
            kv_positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        else:
            kv_positions = positions
            use_flash = False  # q positions may not equal slot indices

    if cache is not None and attend_len is not None and attend_len < cache.max_len:
        kv_valid_a = kv_valid[:, :attend_len]
        kv_positions = kv_positions[:, :attend_len]
    else:
        kv_valid_a = kv_valid

    def qkv(lp, hidden):
        x = rms_norm(hidden, lp["ln1"], eps)
        q = dense(x, lp["wq"]).reshape(B, T, H, hd)
        k = dense(x, lp["wk"]).reshape(B, T, KV, hd)
        v = dense(x, lp["wv"]).reshape(B, T, KV, hd)
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
        if use_rope:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        return q, k, v

    def ffn(lp, hidden, attn):
        hidden = hidden + dense(attn, lp["wo"])
        x = rms_norm(hidden, lp["ln2"], eps)
        return hidden + swiglu(x, lp["w_gate"], lp["w_up"], lp["w_down"])

    def attend(lp, hidden, q, k_all, v_all, kv_major: bool):
        if use_flash:
            from ..ops.pallas.flash import flash_attention

            attn = flash_attention(
                q, k_all, v_all, kv_valid_a, positions[0, 0],
                scale=scale, window=attn_window, kv_major=kv_major,
            ).reshape(B, T, H * hd)
        elif kv_major:
            attn = gqa_attention_kvmajor(
                q, k_all, v_all,
                q_positions=positions,
                kv_positions=kv_positions,
                kv_valid=kv_valid_a,
                scale=scale,
                window=attn_window,
            ).reshape(B, T, H * hd)
        else:
            attn = gqa_attention(
                q, k_all, v_all,
                q_positions=positions,
                kv_positions=kv_positions,
                kv_valid=kv_valid_a,
                scale=scale,
                window=attn_window,
            ).reshape(B, T, H * hd)
        return ffn(lp, hidden, attn)

    if cache is not None:
        # The full (L, B, KV, S, hd) cache rides the scan CARRY: per-layer
        # updates are tiny in-place dynamic_update_slices and attention
        # reads only the attended slice. (Passing per-layer cache through
        # scan xs/ys makes XLA materialize a full cache copy every step —
        # ~2x HBM traffic at serving batch sizes.)
        quant = isinstance(cache, (QuantKVCache, QuantPagedKVCache))
        paged = isinstance(cache, (PagedKVCache, QuantPagedKVCache))
        S = cache.max_len
        a_len = attend_len if (attend_len is not None and attend_len < S) else S
        if paged:
            psz = cache.page_size
            n_pool = cache.k.shape[1]
            table = cache.table
            assert a_len % psz == 0, (a_len, psz)
        # Pallas flash-decode for the single-token step: streams the cache
        # tiles once per KV head (no per-layer dynamic_slice copy, no fp32
        # cast traffic). Causality rides kv_valid alone, so it needs the
        # linear slot layout and no sliding window.
        use_decode_kernel = (
            T == 1 and linear_slots and attn_window is None
            and _decode_ok(B, a_len, hd, H, KV)
        )
        # Quantized/paged-cache prefill: the prompt's attention reads the
        # FRESH bf16 k/v (exact; no pool gather needed), only the cache
        # *write* is quantized/scattered — valid when this forward populates
        # a fresh cache from slot 0.
        attend_fresh = (
            (quant or paged) and T > 1 and linear_slots and not offset_per_row
            and isinstance(cache_offset, int) and cache_offset == 0
        )

        if offset_per_row or paged:
            kv_idx3 = jnp.arange(KV, dtype=jnp.int32)[None, :, None]  # (1,KV,1)
            off_bt = (
                (cache_offset[:, None] if offset_per_row
                 else jnp.full((B, 1), cache_offset, jnp.int32))
                + jnp.arange(T, dtype=jnp.int32)[None, :]
            )  # (B, T) absolute write slots
        if offset_per_row and not paged:
            b_idx3 = jnp.arange(B, dtype=jnp.int32)[:, None, None]  # (B,1,1)
            s_idx3 = off_bt[:, None, :]  # (B,1,T)
        if paged:
            # logical slot -> (pool page, in-page offset); slots past the
            # logical capacity map to page index n_pool, which mode="drop"
            # discards (the linear cache gets the same via OOB s index)
            lg = jnp.clip(off_bt // psz, 0, table.shape[1] - 1)
            pg_bt = jnp.where(
                off_bt < S, jnp.take_along_axis(table, lg, axis=1), n_pool)
            poff_bt = off_bt % psz

        def write_block(buf, blk, li):
            """Store a (B, KV, T, ...) block at the row cursors / offset."""
            if paged:
                return buf.at[li, pg_bt[:, None, :], kv_idx3, poff_bt[:, None, :]].set(
                    blk.astype(buf.dtype), mode="drop")
            if offset_per_row:
                return buf.at[li, b_idx3, kv_idx3, s_idx3].set(
                    blk.astype(buf.dtype), mode="drop")
            idx = (li, 0, 0, cache_offset) + ((0,) if blk.ndim == 4 else ())
            return jax.lax.dynamic_update_slice(buf, blk.astype(buf.dtype)[None], idx)

        def read_block(buf, li):
            if paged:
                # gather the attended logical pages into a linear (B, KV,
                # a_len, ...) view — the non-kernel fallback path (CPU tests,
                # small batches); the TPU hot path reads the pool in-place
                # via ops/pallas/paged_attn.py
                lay = jax.lax.dynamic_slice(
                    buf, (li,) + (0,) * (buf.ndim - 1), (1,) + buf.shape[1:])[0]
                g = jnp.take(lay, table[:, : a_len // psz], axis=0)
                g = jnp.moveaxis(g, 2, 1)  # (B, KV, n_pa, P, ...)
                return g.reshape((B, KV, a_len) + buf.shape[4:])
            sizes = (1, B, KV, a_len) + ((hd,) if buf.ndim == 5 else ())
            return jax.lax.dynamic_slice(buf, (li,) + (0,) * (buf.ndim - 1), sizes)[0]

        def layer(carry, xs):
            if quant:
                hidden, kf, vf, ksc, vsc = carry
            else:
                hidden, kf, vf = carry
            lp, li = xs
            q, k, v = qkv(lp, hidden)
            kt = jnp.swapaxes(k, 1, 2)  # (B, KV, T, hd)
            vt = jnp.swapaxes(v, 1, 2)
            if quant:
                kq, ks = _quantize_kv_block(kt)
                vq, vs = _quantize_kv_block(vt)
                kf = write_block(kf, kq, li)
                vf = write_block(vf, vq, li)
                ksc = write_block(ksc, ks, li)
                vsc = write_block(vsc, vs, li)
            else:
                kf = write_block(kf, kt, li)
                vf = write_block(vf, vt, li)

            if attend_fresh:
                # exact prompt attention over the fresh bf16 k/v
                hidden = attend_fresh_kv(lp, hidden, q, k, v)
            elif use_decode_kernel and paged and quant:
                from ..ops.pallas.paged_attn import paged_decode_attention_q8

                attn = paged_decode_attention_q8(
                    q[:, 0], kf, ksc, vf, vsc, table, kv_valid_a, li,
                    scale=scale, attend_len=a_len,
                ).reshape(B, 1, H * hd)
                hidden = ffn(lp, hidden, attn)
            elif use_decode_kernel and paged:
                from ..ops.pallas.paged_attn import paged_decode_attention

                attn = paged_decode_attention(
                    q[:, 0], kf, vf, table, kv_valid_a, li,
                    scale=scale, attend_len=a_len,
                ).reshape(B, 1, H * hd)
                hidden = ffn(lp, hidden, attn)
            elif use_decode_kernel and quant:
                from ..ops.pallas.decode_attn import decode_attention_q8

                attn = decode_attention_q8(
                    q[:, 0], kf, ksc, vf, vsc, kv_valid_a, li,
                    scale=scale, attend_len=a_len,
                ).reshape(B, 1, H * hd)
                hidden = ffn(lp, hidden, attn)
            elif use_decode_kernel:
                from ..ops.pallas.decode_attn import decode_attention

                attn = decode_attention(
                    q[:, 0], kf, vf, kv_valid_a, li,
                    scale=scale, attend_len=a_len,
                ).reshape(B, 1, H * hd)
                hidden = ffn(lp, hidden, attn)
            else:
                k_all = read_block(kf, li)
                v_all = read_block(vf, li)
                if quant:
                    k_all = k_all.astype(jnp.float32) * read_block(ksc, li)[..., None]
                    v_all = v_all.astype(jnp.float32) * read_block(vsc, li)[..., None]
                hidden = attend(lp, hidden, q, k_all, v_all, kv_major=True)
            out_carry = (hidden, kf, vf, ksc, vsc) if quant else (hidden, kf, vf)
            return out_carry, (hidden if output_hidden_states else None)

        def attend_fresh_kv(lp, hidden, q, k, v):
            fresh_valid = kv_valid[:, :T]
            if _flash_ok(T, hd, H, KV):
                from ..ops.pallas.flash import flash_attention

                attn = flash_attention(
                    q, k, v, fresh_valid, positions[0, 0],
                    scale=scale, window=attn_window,
                ).reshape(B, T, H * hd)
            else:
                attn = gqa_attention(
                    q, k, v, q_positions=positions, kv_positions=positions,
                    kv_valid=fresh_valid, scale=scale, window=attn_window,
                ).reshape(B, T, H * hd)
            return ffn(lp, hidden, attn)

        L = cfg.num_hidden_layers
        # the (immutable) page table rides the closure, not the carry
        init_carry = (
            (inputs_embeds, cache.k, cache.v, cache.k_scale, cache.v_scale)
            if quant else (inputs_embeds, cache.k, cache.v)
        )
        carry_out, per_layer = jax.lax.scan(
            layer, init_carry,
            (params["layers"], jnp.arange(L, dtype=jnp.int32)),
        )
        if quant and paged:
            hidden = carry_out[0]
            new_cache = QuantPagedKVCache(*carry_out[1:], table)
        elif quant:
            hidden = carry_out[0]
            new_cache = QuantKVCache(*carry_out[1:])
        elif paged:
            hidden, new_k, new_v = carry_out
            new_cache = PagedKVCache(new_k, new_v, table)
        else:
            hidden, new_k, new_v = carry_out
            new_cache = KVCache(new_k, new_v)
        if output_hidden_states:
            hidden = rms_norm(hidden, params["final_norm"], eps)
            # HF hidden_states layout: (embeds, layer_1, ..., layer_{L-1},
            # final_norm(layer_L)) — the LAST entry is post-final-norm
            all_hs = jnp.concatenate(
                [inputs_embeds[None], per_layer[:-1], hidden[None]], axis=0
            )
            return hidden, (new_cache, all_hs)
    else:
        def layer_nc(hidden, lp):
            q, k, v = qkv(lp, hidden)
            out = attend(lp, hidden, q, k, v, kv_major=False)
            return out, (out if output_hidden_states else None)

        if remat:
            layer_nc = jax.checkpoint(layer_nc)
        hidden, per_layer = jax.lax.scan(layer_nc, inputs_embeds, params["layers"])
        new_cache = None
        if output_hidden_states:
            hidden = rms_norm(hidden, params["final_norm"], eps)
            # HF hidden_states layout: the last entry is post-final-norm
            all_hs = jnp.concatenate(
                [inputs_embeds[None], per_layer[:-1], hidden[None]], axis=0
            )
            return hidden, (new_cache, all_hs)

    if final_norm:
        hidden = rms_norm(hidden, params["final_norm"], eps)
    return hidden, new_cache


def embed_tokens(params, ids: jax.Array) -> jax.Array:
    return jnp.take(params["embed"], ids, axis=0)
