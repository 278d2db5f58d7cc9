"""Pallas TPU decode-attention kernel over the layer-stacked KV cache.

The batched decode step (the Delay serving hot loop) is HBM-bound on
streaming the KV cache: at batch 64 / attend 2048 the per-step cache read is
~15 GB at 1.7B scale. This kernel replaces the XLA path's
``dynamic_slice(layer) -> fp32 cast -> einsum`` chain
(nn/qwen3.py layer scan + ops/attention.gqa_attention) with a single
flash-decode program per layer:

  * the (L, B, KV, S, hd) cache is indexed directly in the BlockSpec via a
    scalar-prefetched layer id — the per-layer ``dynamic_slice`` copy never
    materializes;
  * grid (B, KV, S-tiles): each cell streams one KV head's tiles once,
    computing the online-softmax reduction for its G = H/KV query heads in
    VMEM scratch (Pallas double-buffers the next tile's DMA behind compute);
  * optional int8 KV ("quant" variant): tiles are stored int8 with one
    scale per (token, head) and dequantized on the VPU after the DMA —
    halving the dominant HBM stream.

Masking: decode causality is carried entirely by ``kv_valid`` (a slot is
valid iff it holds a token at position <= the current one; engines maintain
this invariant — see models/delay.py kv_valid updates), so the kernel needs
no position arithmetic.

Replaces the decode half of the reference's FlashAttention-2 dependency
(reference pyproject.toml:36-37); the prefill half is ops/pallas/flash.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    li_ref,  # SMEM (1,) int32 scalar prefetch: layer id
    q_ref,  # (1, 1, G, hd) — q reshaped (B, KV, G, hd); G axis covered whole
    k_ref,  # (1, 1, 1, bs, hd)
    v_ref,  # (1, 1, 1, bs, hd)
    valid_ref,  # (1, 1, bs) int8 — valid is (B, 1, S)
    o_ref,  # (1, 1, G, hd)
    m_scr,  # VMEM (G, 128) f32 running max (col 0 used)
    l_scr,  # VMEM (G, 128) f32 running denom (col 0 used)
    acc_scr,  # VMEM (G, hd) f32
    *,
    scale: float,
):
    s_idx = pl.program_id(2)
    n_s = pl.num_programs(2)

    @pl.when(s_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (G, hd)
    k = k_ref[0, 0, 0].astype(jnp.float32)  # (bs, hd)
    v = v_ref[0, 0, 0].astype(jnp.float32)
    vmask = valid_ref[0] != 0  # (1, bs)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (G, bs)
    scores = jnp.where(vmask, scores, NEG_INF)

    m_prev = m_scr[:, :1]  # (G, 1)
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    p = jnp.exp(scores - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = alpha * acc_scr[:] + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:, :1] = m_new
    l_scr[:, :1] = l_new
    acc_scr[:] = acc_new

    @pl.when(s_idx == n_s - 1)
    def _emit():
        o_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(o_ref.dtype)


def _decode_kernel_q8(
    li_ref,
    q_ref,  # (1, G, hd)
    k_ref,  # (1, 1, 1, bs, hd) int8
    ks_ref,  # (1, 1, 1, bs) f32 per-token scale
    v_ref,  # (1, 1, 1, bs, hd) int8
    vs_ref,  # (1, 1, 1, bs) f32
    valid_ref,  # (1, 1, bs) int8
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
):
    """int8-KV variant: scales fold into the score row / prob row instead of
    dequantizing the (bs, hd) tiles (keeps the VPU work O(bs) not O(bs*hd))."""
    s_idx = pl.program_id(2)
    n_s = pl.num_programs(2)

    @pl.when(s_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (G, hd)
    k = k_ref[0, 0, 0]  # (bs, hd) int8
    v = v_ref[0, 0, 0]
    k_sc = ks_ref[0, 0]  # (1, bs)
    v_sc = vs_ref[0, 0]
    vmask = valid_ref[0] != 0

    scores = jax.lax.dot_general(
        q, k.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G, bs) in int8 units
    scores = scores * k_sc  # dequant: one multiply per score
    scores = jnp.where(vmask, scores, NEG_INF)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    p = jnp.exp(scores - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    pv = (p * v_sc).astype(jnp.bfloat16)  # fold v scale into probs
    acc_new = alpha * acc_scr[:] + jax.lax.dot_general(
        pv, v.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:, :1] = m_new
    l_scr[:, :1] = l_new
    acc_scr[:] = acc_new

    @pl.when(s_idx == n_s - 1)
    def _emit():
        o_ref[0, 0] = (acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "attend_len", "block_s", "interpret"),
)
def decode_attention(
    q: jax.Array,  # (B, H, hd) current-step queries
    k_cache: jax.Array,  # (L, B, KV, S, hd)
    v_cache: jax.Array,
    kv_valid: jax.Array,  # (B, S) bool (or (B, attend_len))
    layer: jax.Array,  # scalar int32 layer id
    *,
    scale: float,
    attend_len: int,
    block_s: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Single-position GQA decode attention for one layer of the stacked
    cache. Returns (B, H, hd). ``attend_len`` (static, multiple of
    ``block_s``) caps the streamed prefix."""
    B, H, hd = q.shape
    L, _, KV, S, _ = k_cache.shape
    G = H // KV
    assert attend_len % block_s == 0 or attend_len < block_s, (
        f"attend_len {attend_len} not a multiple of block_s {block_s}")
    bs = min(block_s, attend_len)
    n_s = attend_len // bs

    valid8 = kv_valid[:, None, :attend_len].astype(jnp.int8)  # (B,1,S)
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    qg = q.reshape(B, KV, G, hd)  # G axis covered whole per block (Mosaic
    # requires trailing block dims divisible by (8,128) or full-extent)

    grid = (B, KV, n_s)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, G, hd), lambda b, j, s, li: (b, j, 0, 0)),
                pl.BlockSpec(
                    (1, 1, 1, bs, hd), lambda b, j, s, li: (li[0], b, j, s, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 1, bs, hd), lambda b, j, s, li: (li[0], b, j, s, 0)
                ),
                pl.BlockSpec((1, 1, bs), lambda b, j, s, li: (b, 0, s)),
            ],
            out_specs=pl.BlockSpec((1, 1, G, hd), lambda b, j, s, li: (b, j, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((G, 128), jnp.float32),
                pltpu.VMEM((G, 128), jnp.float32),
                pltpu.VMEM((G, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        interpret=interpret,
    )(li, qg, k_cache, v_cache, valid8)
    return out.reshape(B, H, hd)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "attend_len", "block_s", "interpret"),
)
def decode_attention_q8(
    q: jax.Array,  # (B, H, hd)
    k_cache: jax.Array,  # (L, B, KV, S, hd) int8
    k_scale: jax.Array,  # (L, B, KV, S) f32
    v_cache: jax.Array,  # int8
    v_scale: jax.Array,
    kv_valid: jax.Array,  # (B, S) bool
    layer: jax.Array,
    *,
    scale: float,
    attend_len: int,
    block_s: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """int8-KV flash-decode: identical semantics to ``decode_attention`` with
    k/v dequantized per (token, head) inside the kernel — halves the HBM
    stream that dominates batched decode."""
    B, H, hd = q.shape
    L, _, KV, S, _ = k_cache.shape
    G = H // KV
    bs = min(block_s, attend_len)
    n_s = attend_len // bs

    valid8 = kv_valid[:, None, :attend_len].astype(jnp.int8)  # (B,1,S)
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    qg = q.reshape(B, KV, G, hd)

    grid = (B, KV, n_s)
    out = pl.pallas_call(
        functools.partial(_decode_kernel_q8, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, G, hd), lambda b, j, s, li: (b, j, 0, 0)),
                pl.BlockSpec(
                    (1, 1, 1, bs, hd), lambda b, j, s, li: (li[0], b, j, s, 0)
                ),
                pl.BlockSpec((1, 1, 1, bs), lambda b, j, s, li: (li[0], b, j, s)),
                pl.BlockSpec(
                    (1, 1, 1, bs, hd), lambda b, j, s, li: (li[0], b, j, s, 0)
                ),
                pl.BlockSpec((1, 1, 1, bs), lambda b, j, s, li: (li[0], b, j, s)),
                pl.BlockSpec((1, 1, bs), lambda b, j, s, li: (b, 0, s)),
            ],
            out_specs=pl.BlockSpec((1, 1, G, hd), lambda b, j, s, li: (b, j, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((G, 128), jnp.float32),
                pltpu.VMEM((G, 128), jnp.float32),
                pltpu.VMEM((G, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        interpret=interpret,
    )(li, qg, k_cache, k_scale, v_cache, v_scale, valid8)
    return out.reshape(B, H, hd)


def quantize_kv(x: jax.Array):
    """Per-(token, head) absmax int8 quantization of a fresh (B, T, KV, hd)
    k/v block. Returns (int8 values (B,T,KV,hd), f32 scales (B,T,KV))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    sc = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / sc[..., None]), -127, 127)
    return q.astype(jnp.int8), sc
