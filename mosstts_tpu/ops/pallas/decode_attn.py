"""Pallas TPU decode-attention kernel over the layer-stacked KV cache.

The batched decode step (the Delay serving hot loop) is HBM-bound on
streaming the KV cache: at batch 64 / attend 2048 the per-step cache read is
~15 GB at 1.7B scale. This kernel replaces the XLA path's
``dynamic_slice(layer) -> fp32 cast -> einsum`` chain
(nn/qwen3.py layer scan + ops/attention.gqa_attention_kvmajor) with a
flash-decode program per layer:

  * the (L, B, KV, S, hd) cache is indexed directly in the BlockSpec via a
    scalar-prefetched layer id — the per-layer ``dynamic_slice`` copy never
    materializes;
  * grid (B, S-tiles): each cell streams one batch row's (KV, bs, hd) K/V
    tiles once — all KV heads together, so DMAs are ~0.5 MB and per-cell
    dispatch overhead amortizes — and computes ALL heads in ONE
    block-diagonal dot: q flattened to (KV*G, hd) against k flattened to
    (KV*bs, hd), cross-head lanes masked to -inf before the online softmax.
    (Two earlier layouts measured slower than the XLA einsum: per-(row,
    head) cells were dispatch-bound; a per-head unrolled loop was
    MXU-latency-bound on 16 tiny dots per tile. The single fat dot trades
    KVx redundant FLOPs — free, decode is bandwidth-bound — for one MXU op
    per tile.);
  * the int8 variant ("q8") stores one scale per (token, head) and folds
    the scales into the score/prob rows — halving the dominant HBM stream
    with O(bs) extra VPU work instead of O(bs*hd).

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
    q_ref,  # (1, KV, G, hd) — q reshaped (B, KV, G, hd); one batch row
    k_ref,  # (1, 1, KV, bs, hd)
    v_ref,  # (1, 1, KV, bs, hd)
    valid_ref,  # (1, 1, bs) int8 — valid is (B, 1, S)
    o_ref,  # (1, KV, G, hd)
    m_scr,  # VMEM (KV*G, 128) f32 running max (col 0 used)
    l_scr,  # VMEM (KV*G, 128) f32 running denom
    acc_scr,  # VMEM (KV*G, hd) f32
    *,
    scale: float,
    n_kv: int,
    g: int,
):
    s_idx = pl.program_id(1)
    n_s = pl.num_programs(1)
    hd = q_ref.shape[-1]
    bs = k_ref.shape[-2]
    rows, cols = n_kv * g, n_kv * bs

    @pl.when(s_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].reshape(rows, hd).astype(jnp.float32) * scale
    k = k_ref[0, 0].reshape(cols, hd)
    v = v_ref[0, 0].reshape(cols, hd)
    vmask = valid_ref[0] != 0  # (1, bs)

    # ONE fat dot for all heads; cross-head lanes masked below
    scores = jax.lax.dot_general(
        q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (KV*G, KV*bs)
    row_head = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // g
    col_head = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) // bs
    allowed = row_head == col_head
    # (1, bs) -> (1, KV*bs) by lane-axis concat (Mosaic cannot reshape
    # sublane data into lanes)
    vmask_flat = jnp.concatenate([vmask] * n_kv, axis=1)
    scores = jnp.where(allowed & vmask_flat, scores, NEG_INF)

    m_prev = m_scr[:, :1]  # (KV*G, 1)
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    p = jnp.exp(scores - m_new)  # masked lanes: exp(-inf - m) = 0
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = alpha * acc_scr[:] + jax.lax.dot_general(
        p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:, :1] = m_new
    l_scr[:, :1] = l_new
    acc_scr[:] = acc_new

    @pl.when(s_idx == n_s - 1)
    def _emit():
        norm = acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)  # (KV*G, hd)
        o_ref[0] = norm.reshape(n_kv, g, norm.shape[-1]).astype(o_ref.dtype)


def _decode_kernel_q8(
    li_ref,
    q_ref,  # (1, KV, G, hd)
    k_ref,  # (1, 1, KV, bs, hd) int8
    ks_ref,  # (1, 1, KV, bs) f32 per-token scale
    v_ref,  # (1, 1, KV, bs, hd) int8
    vs_ref,  # (1, 1, KV, bs) f32
    valid_ref,  # (1, 1, bs) int8
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    n_kv: int,
    g: int,
):
    """int8-KV variant: scales fold into the score row / prob row instead of
    dequantizing the (bs, hd) tiles (keeps the VPU work O(bs) not O(bs*hd))."""
    s_idx = pl.program_id(1)
    n_s = pl.num_programs(1)
    hd = q_ref.shape[-1]
    bs = k_ref.shape[-2]
    rows, cols = n_kv * g, n_kv * bs

    @pl.when(s_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].reshape(rows, hd).astype(jnp.bfloat16) * scale
    k = k_ref[0, 0].reshape(cols, hd)  # int8
    v = v_ref[0, 0].reshape(cols, hd)
    # (KV, bs) -> (1, KV*bs): per-head scale rows concatenated along lanes
    k_sc = jnp.concatenate([ks_ref[0, 0, j][None, :] for j in range(n_kv)], axis=1)
    v_sc = jnp.concatenate([vs_ref[0, 0, j][None, :] for j in range(n_kv)], axis=1)
    vmask = valid_ref[0] != 0  # (1, bs)

    scores = jax.lax.dot_general(
        q, k.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (KV*G, KV*bs) in int8 units
    scores = scores * k_sc  # dequant: one multiply per score
    row_head = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // g
    col_head = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) // bs
    allowed = row_head == col_head
    # (1, bs) -> (1, KV*bs) by lane-axis concat (Mosaic cannot reshape
    # sublane data into lanes)
    vmask_flat = jnp.concatenate([vmask] * n_kv, axis=1)
    scores = jnp.where(allowed & vmask_flat, scores, NEG_INF)

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
        norm = acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = norm.reshape(n_kv, g, norm.shape[-1]).astype(o_ref.dtype)


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

    grid = (B, n_s)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, n_kv=KV, g=G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, KV, G, hd), lambda b, s, li: (b, 0, 0, 0)),
                pl.BlockSpec(
                    (1, 1, KV, bs, hd), lambda b, s, li: (li[0], b, 0, s, 0)
                ),
                pl.BlockSpec(
                    (1, 1, KV, bs, hd), lambda b, s, li: (li[0], b, 0, s, 0)
                ),
                pl.BlockSpec((1, 1, bs), lambda b, s, li: (b, 0, s)),
            ],
            out_specs=pl.BlockSpec((1, KV, G, hd), lambda b, s, li: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((KV * G, 128), jnp.float32),
                pltpu.VMEM((KV * G, 128), jnp.float32),
                pltpu.VMEM((KV * G, hd), jnp.float32),
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
    assert attend_len % block_s == 0 or attend_len < block_s, (
        f"attend_len {attend_len} not a multiple of block_s {block_s}")
    bs = min(block_s, attend_len)
    n_s = attend_len // bs

    valid8 = kv_valid[:, None, :attend_len].astype(jnp.int8)  # (B,1,S)
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    qg = q.reshape(B, KV, G, hd)

    grid = (B, n_s)
    out = pl.pallas_call(
        functools.partial(_decode_kernel_q8, scale=scale, n_kv=KV, g=G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, KV, G, hd), lambda b, s, li: (b, 0, 0, 0)),
                pl.BlockSpec(
                    (1, 1, KV, bs, hd), lambda b, s, li: (li[0], b, 0, s, 0)
                ),
                pl.BlockSpec((1, 1, KV, bs), lambda b, s, li: (li[0], b, 0, s)),
                pl.BlockSpec(
                    (1, 1, KV, bs, hd), lambda b, s, li: (li[0], b, 0, s, 0)
                ),
                pl.BlockSpec((1, 1, KV, bs), lambda b, s, li: (li[0], b, 0, s)),
                pl.BlockSpec((1, 1, bs), lambda b, s, li: (b, 0, s)),
            ],
            out_specs=pl.BlockSpec((1, KV, G, hd), lambda b, s, li: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((KV * G, 128), jnp.float32),
                pltpu.VMEM((KV * G, 128), jnp.float32),
                pltpu.VMEM((KV * G, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        interpret=interpret,
    )(li, qg, k_cache, k_scale, v_cache, v_scale, valid8)
    return out.reshape(B, H, hd)


def _decode_kernel_q8t(
    li_ref,
    q_ref,  # (1, KV, G, hd)
    k_ref,  # (1, 1, KV, bs, hd) int8
    ks_ref,  # (1, 1, 1, KV*bs) TILED scale row (bf16 or f32)
    v_ref,  # (1, 1, KV, bs, hd) int8
    vs_ref,  # (1, 1, 1, KV*bs)
    valid_ref,  # (1, 1, KV*bs) int8 TILED validity row
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    n_kv: int,
    g: int,
):
    """int8-KV variant over PRE-TILED scale rows: the (L, B, S/bs, KV*bs)
    layout delivers each tile's scales as one flat lane row, so the kernel
    does zero in-kernel concatenation — which is what blocked bf16 scales
    (bf16 rows trip a Mosaic concat alignment limit in _decode_kernel_q8)
    and what costs 2*KV lane-concats per tile there. Score/prob math is
    identical to _decode_kernel_q8."""
    s_idx = pl.program_id(1)
    n_s = pl.num_programs(1)
    hd = q_ref.shape[-1]
    bs = k_ref.shape[-2]
    rows, cols = n_kv * g, n_kv * bs

    @pl.when(s_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].reshape(rows, hd).astype(jnp.bfloat16) * scale
    k = k_ref[0, 0].reshape(cols, hd)  # int8
    v = v_ref[0, 0].reshape(cols, hd)
    k_sc = ks_ref[0, 0].astype(jnp.float32)  # (1, KV*bs) — already flat
    v_sc = vs_ref[0, 0].astype(jnp.float32)
    vmask_flat = valid_ref[0] != 0  # (1, KV*bs) — already flat

    scores = jax.lax.dot_general(
        q, k.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (KV*G, KV*bs) in int8 units
    scores = scores * k_sc
    row_head = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // g
    col_head = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) // bs
    allowed = row_head == col_head
    scores = jnp.where(allowed & vmask_flat, scores, NEG_INF)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    p = jnp.exp(scores - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    pv = (p * v_sc).astype(jnp.bfloat16)
    acc_new = alpha * acc_scr[:] + jax.lax.dot_general(
        pv, v.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:, :1] = m_new
    l_scr[:, :1] = l_new
    acc_scr[:] = acc_new

    @pl.when(s_idx == n_s - 1)
    def _emit():
        norm = acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = norm.reshape(n_kv, g, norm.shape[-1]).astype(o_ref.dtype)


def pack_kv_scales(sc: jax.Array, block_s: int = 256,
                   dtype=jnp.bfloat16) -> jax.Array:
    """(L, B, KV, S) per-(token, head) scales -> the tiled (L, B, S/bs,
    KV*bs) layout decode_attention_q8t streams: lane ``kv*bs + (t % bs)``
    of row ``t // bs`` holds head kv's scale for token t — exactly the
    column order of the kernel's flattened (KV*bs, hd) K/V tile."""
    L, B, KV, S = sc.shape
    bs = min(block_s, S)
    assert S % bs == 0, (S, bs)
    t = sc.reshape(L, B, KV, S // bs, bs)
    t = jnp.transpose(t, (0, 1, 3, 2, 4))
    return t.reshape(L, B, S // bs, KV * bs).astype(dtype)


def pack_valid(kv_valid: jax.Array, n_kv: int, block_s: int = 256) -> jax.Array:
    """(B, S) bool -> (B, S/bs, KV*bs) int8 tiled validity rows (the same
    lane order as pack_kv_scales; validity is head-independent so each
    head's lane span carries the same bits)."""
    B, S = kv_valid.shape
    bs = min(block_s, S)
    assert S % bs == 0, (S, bs)
    v = kv_valid.astype(jnp.int8).reshape(B, 1, S // bs, bs)
    v = jnp.broadcast_to(v, (B, n_kv, S // bs, bs))
    v = jnp.transpose(v, (0, 2, 1, 3))
    return v.reshape(B, S // bs, n_kv * bs)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "attend_len", "block_s", "interpret"),
)
def decode_attention_q8t(
    q: jax.Array,  # (B, H, hd)
    k_cache: jax.Array,  # (L, B, KV, S, hd) int8
    k_scale_t: jax.Array,  # (L, B, S/bs, KV*bs) TILED (bf16 or f32)
    v_cache: jax.Array,  # int8
    v_scale_t: jax.Array,
    kv_valid: jax.Array,  # (B, S) bool
    layer: jax.Array,
    *,
    scale: float,
    attend_len: int,
    block_s: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """int8-KV flash-decode over the tiled scale layout (see
    pack_kv_scales): semantics identical to ``decode_attention_q8``, but
    the per-tile scale rows arrive pre-flattened so the kernel does no
    lane concatenation and the scales may be bf16 — the layout sketched
    in docs/ROADMAP.md (round-4 item 3)."""
    B, H, hd = q.shape
    L, _, KV, S, _ = k_cache.shape
    G = H // KV
    assert attend_len % block_s == 0 or attend_len < block_s, (
        f"attend_len {attend_len} not a multiple of block_s {block_s}")
    bs = min(block_s, attend_len)
    n_s = attend_len // bs
    assert k_scale_t.shape[3] == KV * bs, (
        f"tiled scales packed for bs={k_scale_t.shape[3] // KV}, kernel "
        f"running bs={bs}")

    valid_t = pack_valid(kv_valid[:, :attend_len], KV, bs)  # (B,n_s,KV*bs)
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    qg = q.reshape(B, KV, G, hd)

    grid = (B, n_s)
    out = pl.pallas_call(
        functools.partial(_decode_kernel_q8t, scale=scale, n_kv=KV, g=G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, KV, G, hd), lambda b, s, li: (b, 0, 0, 0)),
                pl.BlockSpec(
                    (1, 1, KV, bs, hd), lambda b, s, li: (li[0], b, 0, s, 0)
                ),
                pl.BlockSpec((1, 1, 1, KV * bs),
                             lambda b, s, li: (li[0], b, s, 0)),
                pl.BlockSpec(
                    (1, 1, KV, bs, hd), lambda b, s, li: (li[0], b, 0, s, 0)
                ),
                pl.BlockSpec((1, 1, 1, KV * bs),
                             lambda b, s, li: (li[0], b, s, 0)),
                pl.BlockSpec((1, 1, KV * bs), lambda b, s, li: (b, s, 0)),
            ],
            out_specs=pl.BlockSpec((1, KV, G, hd), lambda b, s, li: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((KV * G, 128), jnp.float32),
                pltpu.VMEM((KV * G, 128), jnp.float32),
                pltpu.VMEM((KV * G, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        interpret=interpret,
    )(li, qg, k_cache, k_scale_t, v_cache, v_scale_t, valid_t)
    return out.reshape(B, H, hd)


def quantize_kv(x: jax.Array):
    """Per-(token, head) absmax int8 quantization of a fresh (B, T, KV, hd)
    k/v block. Returns (int8 values (B,T,KV,hd), f32 scales (B,T,KV))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    sc = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / sc[..., None]), -127, 127)
    return q.astype(jnp.int8), sc
