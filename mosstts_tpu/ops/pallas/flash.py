"""Pallas TPU flash-attention (prefill path).

Replaces the reference's FlashAttention-2 CUDA dependency
(pyproject.toml:36-37, clis/moss_tts_app.py:126-134) with a TPU-native
online-softmax kernel: per (batch, q-head, q-tile) grid cell, the K/V stream
for the matching KV head is reduced tile-by-tile with running max/sum, so
the (T x S) score matrix never materializes in HBM.

Supports GQA (q heads grouped onto KV heads), left-padding via ``kv_valid``,
causal masking from absolute positions, and an optional sliding window —
the same semantics as ops.attention.gqa_attention, which remains the XLA
fallback (used on CPU and for tiny shapes).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_start_ref,  # SMEM (1,1) int32: absolute position of q row 0
    q_ref,  # (1, 1, bt, hd) — 4D block per BlockSpec; leading (b, h) dims are 1
    k_ref,  # (1, 1, S, hd)
    v_ref,  # (1, 1, S, hd)
    valid_ref,  # (1, 1, S) int8
    o_ref,  # (1, 1, bt, hd)
    *,
    block_s: int,
    window: int | None,
    scale: float,
):
    bt, hd = q_ref.shape[2], q_ref.shape[3]
    S = k_ref.shape[2]
    q_tile = pl.program_id(2)
    q_start = q_start_ref[0, 0]

    q = q_ref[0, 0].astype(jnp.float32) * scale
    q_pos = q_start + q_tile * bt + jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)

    def body(s_idx, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(s_idx * block_s, block_s), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(s_idx * block_s, block_s), :].astype(jnp.float32)
        vmask = valid_ref[0, :, pl.ds(s_idx * block_s, block_s)] != 0  # (1, bs)

        scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bt, bs)
        k_pos = s_idx * block_s + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
        rel = q_pos - k_pos  # (bt, bs)
        mask = (rel >= 0) & vmask
        if window is not None:
            mask = mask & (rel < window)
        scores = jnp.where(mask, scores, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bt, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bt, 1), jnp.float32)
    acc0 = jnp.zeros((bt, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, S // block_s, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("scale", "window", "block_t", "block_s", "kv_major"),
)
def flash_attention(
    q: jax.Array,  # (B, T, H, hd)
    k: jax.Array,  # (B, S, KV, hd); or (B, KV, S, hd) when kv_major=True
    v: jax.Array,
    kv_valid: jax.Array,  # (B, S) bool
    q_start: jax.Array | int,  # scalar: absolute position of q[:, 0]
    *,
    scale: float,
    window: int | None = None,
    block_t: int = 128,
    block_s: int = 128,
    kv_major: bool = False,
) -> jax.Array:
    """``kv_major=True`` consumes k/v straight in the KV-cache layout
    (nn/qwen3.KVCache: head-major), skipping the transpose."""
    B, T, H, hd = q.shape
    if kv_major:
        KV, S = k.shape[1], k.shape[2]
    else:
        S, KV = k.shape[1], k.shape[2]
    G = H // KV

    Tp = _round_up(T, block_t)
    Sp = _round_up(S, block_s)
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    if Sp != S:
        s_axis = 2 if kv_major else 1
        pad = [(0, 0)] * 4
        pad[s_axis] = (0, Sp - S)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, Sp - S)))

    qt = jnp.transpose(q, (0, 2, 1, 3))  # (B, H, Tp, hd)
    if kv_major:
        kt, vt = k, v  # already (B, KV, Sp, hd)
    else:
        kt = jnp.transpose(k, (0, 2, 1, 3))  # (B, KV, Sp, hd)
        vt = jnp.transpose(v, (0, 2, 1, 3))
    valid8 = kv_valid.astype(jnp.int8)[:, None, :]  # (B, 1, Sp)
    q_start_arr = jnp.asarray(q_start, jnp.int32).reshape(1, 1)

    grid = (B, H, Tp // block_t)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_s=block_s, window=window, scale=scale
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_t, hd), lambda b, h, t, sref: (b, h, t, 0)),
                pl.BlockSpec((1, 1, Sp, hd), lambda b, h, t, sref: (b, h // G, 0, 0)),
                pl.BlockSpec((1, 1, Sp, hd), lambda b, h, t, sref: (b, h // G, 0, 0)),
                pl.BlockSpec((1, 1, Sp), lambda b, h, t, sref: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_t, hd), lambda b, h, t, sref: (b, h, t, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, hd), q.dtype),
    )(q_start_arr, qt, kt, vt, valid8)

    out = jnp.transpose(out, (0, 2, 1, 3))[:, :T]
    return out
