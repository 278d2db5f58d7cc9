"""Pallas TPU paged decode-attention: flash-decode over a shared page pool.

The linear cache (ops/pallas/decode_attn.py) preallocates ``slots x
cache_len`` per layer whether streams use it or not; continuous batching
with variable-length utterances wastes most of that HBM. Here the KV cache
is a pool of fixed-size pages shared by all streams:

    pool        (L, NPAGES, KV, P, hd)      values (bf16 or int8)
    page_table  (B, MAX_PAGES) int32        logical block j of row b lives
                                            in pool page page_table[b, j]

The kernel is the same block-diagonal all-heads flash-decode as
``decode_attention`` with ONE structural change: the K/V BlockSpec
index_maps read the scalar-prefetched page table, so grid cell (b, j)
DMAs pool page ``page_table[b, j]`` instead of the contiguous slice at
``b``. Page-table indirection costs nothing on the data path — the DMA
descriptor just points elsewhere — which is exactly what
PrefetchScalarGridSpec exists for: the tables are in SMEM before the grid
starts, so Mosaic overlaps the gather-DMAs the same way it overlaps the
linear streams.

Masking: identical contract to the linear kernel — causality/occupancy ride
``kv_valid`` over LOGICAL slots (row-major j*P+off); unallocated table
entries may point anywhere (callers use the reserved trash page 0) because
their logical slots are invalid.

The reference has no serving runtime at all (single gradio request,
HF DynamicCache — moss_tts_delay/modeling_moss_tts.py:264-276); paged KV
is how vLLM-class engines share accelerator memory, built TPU-native here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _paged_kernel(
    li_ref,  # SMEM (1,) int32: layer id
    pt_ref,  # SMEM (B*MP,) int32: flattened page table
    q_ref,  # (1, KV, G, hd)
    k_ref,  # (1, 1, KV, P, hd) — ONE pool page
    v_ref,  # (1, 1, KV, P, hd)
    valid_ref,  # (1, 1, P) int8 — logical-slot validity
    o_ref,  # (1, KV, G, hd)
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    n_kv: int,
    g: int,
):
    s_idx = pl.program_id(1)
    n_s = pl.num_programs(1)
    hd = q_ref.shape[-1]
    ps = k_ref.shape[-2]
    rows, cols = n_kv * g, n_kv * ps

    @pl.when(s_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].reshape(rows, hd).astype(jnp.float32) * scale
    k = k_ref[0, 0].reshape(cols, hd)
    v = v_ref[0, 0].reshape(cols, hd)
    vmask = valid_ref[0] != 0  # (1, P)

    scores = jax.lax.dot_general(
        q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (KV*G, KV*P)
    row_head = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // g
    col_head = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) // ps
    allowed = row_head == col_head
    vmask_flat = jnp.concatenate([vmask] * n_kv, axis=1)
    scores = jnp.where(allowed & vmask_flat, scores, NEG_INF)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    p = jnp.exp(scores - m_new)
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
        norm = acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = norm.reshape(n_kv, g, norm.shape[-1]).astype(o_ref.dtype)


def _paged_kernel_q8(
    li_ref,
    pt_ref,
    q_ref,  # (1, KV, G, hd)
    k_ref,  # (1, 1, KV, P, hd) int8
    ks_ref,  # (1, 1, KV, P) f32
    v_ref,
    vs_ref,
    valid_ref,  # (1, 1, P) int8
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    n_kv: int,
    g: int,
):
    """int8 pool pages; per-(token, head) scales fold into score/prob rows
    (same O(P) dequant trick as decode_attention_q8)."""
    s_idx = pl.program_id(1)
    n_s = pl.num_programs(1)
    hd = q_ref.shape[-1]
    ps = k_ref.shape[-2]
    rows, cols = n_kv * g, n_kv * ps

    @pl.when(s_idx == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].reshape(rows, hd).astype(jnp.bfloat16) * scale
    k = k_ref[0, 0].reshape(cols, hd)
    v = v_ref[0, 0].reshape(cols, hd)
    k_sc = jnp.concatenate([ks_ref[0, 0, j][None, :] for j in range(n_kv)], axis=1)
    v_sc = jnp.concatenate([vs_ref[0, 0, j][None, :] for j in range(n_kv)], axis=1)
    vmask = valid_ref[0] != 0

    scores = jax.lax.dot_general(
        q, k.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * k_sc
    row_head = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // g
    col_head = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) // ps
    allowed = row_head == col_head
    vmask_flat = jnp.concatenate([vmask] * n_kv, axis=1)
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


@functools.partial(
    jax.jit, static_argnames=("scale", "attend_len", "interpret")
)
def paged_decode_attention(
    q: jax.Array,  # (B, H, hd)
    k_pool: jax.Array,  # (L, NP, KV, P, hd)
    v_pool: jax.Array,
    page_table: jax.Array,  # (B, MP) int32
    kv_valid: jax.Array,  # (B, S_logical) bool — logical slots
    layer: jax.Array,  # scalar int32
    *,
    scale: float,
    attend_len: int,
    interpret: bool = False,
) -> jax.Array:
    """Single-position GQA decode attention over paged KV for one layer.
    ``attend_len`` (static, multiple of the page size) caps the logical
    prefix streamed; grid cell (b, j) reads pool page ``page_table[b, j]``."""
    B, H, hd = q.shape
    L, NP, KV, P, _ = k_pool.shape
    MP = page_table.shape[1]
    G = H // KV
    assert attend_len % P == 0, (
        f"attend_len {attend_len} not a multiple of page size {P}")
    n_pa = attend_len // P
    assert n_pa <= MP

    valid8 = kv_valid[:, None, :attend_len].astype(jnp.int8)  # (B, 1, S)
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    pt_flat = page_table.astype(jnp.int32).reshape(-1)  # (B*MP,)
    qg = q.reshape(B, KV, G, hd)

    grid = (B, n_pa)
    out = pl.pallas_call(
        functools.partial(_paged_kernel, scale=scale, n_kv=KV, g=G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, KV, G, hd), lambda b, s, li, pt: (b, 0, 0, 0)),
                pl.BlockSpec(
                    (1, 1, KV, P, hd),
                    lambda b, s, li, pt: (li[0], pt[b * MP + s], 0, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, KV, P, hd),
                    lambda b, s, li, pt: (li[0], pt[b * MP + s], 0, 0, 0),
                ),
                pl.BlockSpec((1, 1, P), lambda b, s, li, pt: (b, 0, s)),
            ],
            out_specs=pl.BlockSpec((1, KV, G, hd), lambda b, s, li, pt: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((KV * G, 128), jnp.float32),
                pltpu.VMEM((KV * G, 128), jnp.float32),
                pltpu.VMEM((KV * G, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        interpret=interpret,
    )(li, pt_flat, qg, k_pool, v_pool, valid8)
    return out.reshape(B, H, hd)


@functools.partial(
    jax.jit, static_argnames=("scale", "attend_len", "interpret")
)
def paged_decode_attention_q8(
    q: jax.Array,  # (B, H, hd)
    k_pool: jax.Array,  # (L, NP, KV, P, hd) int8
    k_scale: jax.Array,  # (L, NP, KV, P) f32
    v_pool: jax.Array,
    v_scale: jax.Array,
    page_table: jax.Array,  # (B, MP) int32
    kv_valid: jax.Array,  # (B, S_logical)
    layer: jax.Array,
    *,
    scale: float,
    attend_len: int,
    interpret: bool = False,
) -> jax.Array:
    """int8-pool variant of ``paged_decode_attention``."""
    B, H, hd = q.shape
    L, NP, KV, P, _ = k_pool.shape
    MP = page_table.shape[1]
    G = H // KV
    assert attend_len % P == 0, (
        f"attend_len {attend_len} not a multiple of page size {P}")
    n_pa = attend_len // P
    assert n_pa <= MP

    valid8 = kv_valid[:, None, :attend_len].astype(jnp.int8)
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    pt_flat = page_table.astype(jnp.int32).reshape(-1)
    qg = q.reshape(B, KV, G, hd)

    grid = (B, n_pa)
    out = pl.pallas_call(
        functools.partial(_paged_kernel_q8, scale=scale, n_kv=KV, g=G),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, KV, G, hd), lambda b, s, li, pt: (b, 0, 0, 0)),
                pl.BlockSpec(
                    (1, 1, KV, P, hd),
                    lambda b, s, li, pt: (li[0], pt[b * MP + s], 0, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, KV, P),
                    lambda b, s, li, pt: (li[0], pt[b * MP + s], 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, KV, P, hd),
                    lambda b, s, li, pt: (li[0], pt[b * MP + s], 0, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, KV, P),
                    lambda b, s, li, pt: (li[0], pt[b * MP + s], 0, 0),
                ),
                pl.BlockSpec((1, 1, P), lambda b, s, li, pt: (b, 0, s)),
            ],
            out_specs=pl.BlockSpec((1, KV, G, hd), lambda b, s, li, pt: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((KV * G, 128), jnp.float32),
                pltpu.VMEM((KV * G, 128), jnp.float32),
                pltpu.VMEM((KV * G, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        interpret=interpret,
    )(li, pt_flat, qg, k_pool, k_scale, v_pool, v_scale, valid8)
    return out.reshape(B, H, hd)
