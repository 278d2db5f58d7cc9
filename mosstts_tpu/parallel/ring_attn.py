"""Ring attention: causal GQA prefill attention with the SEQUENCE axis
sharded over a mesh axis, KV blocks rotated around the ring with
``lax.ppermute`` and merged by online softmax.

This is the sequence-parallel headroom path beyond feature parity
(SURVEY.md §5.7: the reference handles long context on a single device —
`docs/moss_tts_realtime_model_card.md:17` 32K ctx; ring attention covers
>64K prompts where one chip's HBM or prefill latency becomes the limit).
The plain sequence-parallel prefill (inputs sharded over 'model', GSPMD
inserts all-gathers — exercised by ``__graft_entry__.dryrun_multichip``)
all-gathers the full K/V per layer; the ring keeps every block resident on
one device and only ever moves one block per step over ICI, so peak memory
per device stays O(T/n) and the transfers pipeline against the block dots.

Layout: by default blocks are CONTIGUOUS sequence chunks, so under causal
masking device d's queries have ~d+1 of the n blocks' worth of USEFUL
work — the classic ring imbalance (device n-1 owns n times device 0's
unmasked score elements). ``layout="zigzag"`` pairs stripe i with stripe
2n-1-i on device i (the striped layout from the ring-attention
literature), equalizing per-device useful work (pinned statically in
tests/test_ring_attention.py). The fold SKIPS fully-masked blocks at
runtime via ``lax.cond`` — under the contiguous layout those skips land
unevenly (late devices never skip), under zigzag every device skips the
same number of rounds, so the balanced useful work becomes balanced
runtime. Zigzag costs one gather in and one inverse gather out; numerics
are identical in either layout because positions and validity ride WITH
the blocks.

All math in fp32; positions/validity ride with the blocks so causality and
left-padding are handled by masking alone (parity with
``ops.attention.gqa_attention``, which is the single-device oracle in
tests/test_ring_attention.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import NEG_INF

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)


def ring_attention_shard(
    q: jax.Array,  # (B, Tq_loc, H, hd) — this device's query block
    k: jax.Array,  # (B, Tk_loc, KV, hd) — this device's key block
    v: jax.Array,  # (B, Tk_loc, KV, hd)
    q_positions: jax.Array,  # (B, Tq_loc) int32 absolute positions
    kv_positions: jax.Array,  # (B, Tk_loc)
    kv_valid: jax.Array,  # (B, Tk_loc) bool
    *,
    scale: float,
    axis_name: str,
    axis_size: int,
    window: int | None = None,
) -> jax.Array:
    """Per-shard body (call inside shard_map). Rotates (k, v, positions,
    valid) ``axis_size`` times; each round folds one block into an online
    softmax accumulator. Returns this device's (B, Tq_loc, H, hd) output.

    The round loop is a Python loop (axis_size is small and static): XLA
    sees ``axis_size`` independent block-dot + ppermute pairs and overlaps
    the collective of round i with the math of round i-1.
    """
    B, Tq, H, hd = q.shape
    KV = k.shape[2]
    G = H // KV

    qf = q.astype(jnp.float32).reshape(B, Tq, KV, G, hd) * scale
    # pvary: the accumulators are per-device state; without the marking the
    # block-skip lax.cond's branches disagree on varying-axis types (the
    # fold output varies over the ring axis, a passthrough of unvaried
    # constants does not)
    m = jax.lax.pvary(jnp.full((B, KV, G, Tq), NEG_INF, jnp.float32),
                      (axis_name,))  # running max
    l = jax.lax.pvary(jnp.zeros((B, KV, G, Tq), jnp.float32), (axis_name,))
    acc = jax.lax.pvary(jnp.zeros((B, KV, G, Tq, hd), jnp.float32),
                        (axis_name,))

    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]

    def fold(m, l, acc, mask, k_blk, v_blk):
        scores = jnp.einsum(
            "bqkgh,bskh->bkgqs", qf, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # (B, KV, G, Tq, Tk)
        scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
        blk_max = jnp.max(scores, axis=-1)  # (B, KV, G, Tq)
        new_m = jnp.maximum(m, blk_max)
        p = jnp.exp(scores - new_m[..., None])
        # Explicitly zero masked positions: for rows with at least one valid
        # key exp(NEG_INF - new_m) is already ~0, but a row whose EVERY key
        # in this (non-skipped) block is masked has new_m == NEG_INF and
        # p == exp(0) == 1 — without this mask such padded rows would
        # accumulate unmasked V and return ~mean(v) instead of 0.
        p = jnp.where(mask[:, None, None, :, :], p, 0.0)
        corr = jnp.exp(m - new_m)
        acc = acc * corr[..., None] + jnp.einsum(
            "bkgqs,bskh->bkgqh", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        l = l * corr + jnp.sum(p, axis=-1)
        return new_m, l, acc

    blk = (k, v, kv_positions, kv_valid)
    for step in range(axis_size):
        k_blk, v_blk, pos_blk, valid_blk = blk
        rel = q_positions[:, :, None] - pos_blk[:, None, :]  # (B, Tq, Tk)
        mask = (rel >= 0) & valid_blk[:, None, :]
        if window is not None:
            mask = mask & (rel < window)
        # BLOCK SKIPPING: a fully-masked block (every kv position after
        # every q position on this device — the common case for late ring
        # rounds under causal masking) contributes nothing; lax.cond skips
        # its two einsums at runtime. This is what makes the zigzag layout
        # pay: balanced USEFUL work per device = balanced runtime.
        m, l, acc = jax.lax.cond(
            jnp.any(mask),
            lambda m, l, acc, mask, kb, vb: fold(m, l, acc, mask, kb, vb),
            lambda m, l, acc, mask, kb, vb: (m, l, acc),
            m, l, acc, mask, k_blk, v_blk,
        )
        if step + 1 < axis_size:
            blk = tuple(
                jax.lax.ppermute(x, axis_name, perm) for x in blk)

    out = acc / jnp.maximum(l, 1e-30)[..., None]  # all-masked rows -> 0
    return out.reshape(B, KV, G, Tq, hd).transpose(0, 3, 1, 2, 4).reshape(
        B, Tq, H, hd).astype(q.dtype)


def zigzag_order(T: int, n: int):
    """Global sequence order for the striped layout: device d holds
    stripes d and 2n-1-d, so every device's causal workload is equal
    (stripe ranks d + (2n-1-d) sum to the same constant for all d)."""
    import numpy as np

    if T % (2 * n):
        raise ValueError(f"zigzag needs T % (2*{n}) == 0, got T={T}")
    S = T // (2 * n)
    parts = []
    for d in range(n):
        parts.append(np.arange(d * S, (d + 1) * S))
        e = 2 * n - 1 - d
        parts.append(np.arange(e * S, (e + 1) * S))
    return np.concatenate(parts)


def ring_gqa_attention(
    mesh: Mesh,
    q: jax.Array,  # (B, T, H, hd) — full (or jit-global) arrays
    k: jax.Array,  # (B, T, KV, hd)
    v: jax.Array,
    *,
    q_positions: jax.Array,  # (B, T)
    kv_positions: jax.Array,  # (B, T)
    kv_valid: jax.Array,  # (B, T)
    scale: float,
    axis: str = "model",
    window: int | None = None,
    layout: str = "contiguous",  # or "zigzag"
) -> jax.Array:
    """Drop-in causal GQA attention with T sharded on ``mesh`` axis
    ``axis`` (batch rides 'data' if the caller sharded it there; this
    wrapper only constrains the sequence dim). T must divide evenly;
    ``layout="zigzag"`` additionally needs T % (2 * axis_size) == 0."""
    axis_size = mesh.shape[axis]
    T = q.shape[1]
    if T % axis_size != 0:
        raise ValueError(f"T={T} not divisible by mesh axis "
                         f"{axis!r}={axis_size}")
    if layout not in ("contiguous", "zigzag"):
        raise ValueError(f"unknown layout {layout!r}")
    if layout == "zigzag" and axis_size > 1:
        order = jnp.asarray(zigzag_order(T, axis_size))
        inv = jnp.argsort(order)
        q, k, v = (jnp.take(x, order, axis=1) for x in (q, k, v))
        q_positions, kv_positions, kv_valid = (
            jnp.take(x, order, axis=1)
            for x in (q_positions, kv_positions, kv_valid))
    body = partial(
        ring_attention_shard, scale=scale, axis_name=axis,
        axis_size=axis_size, window=window,
    )
    seq4 = P(None, axis, None, None)
    seq2 = P(None, axis)
    out = shard_map(
        body, mesh,
        in_specs=(seq4, seq4, seq4, seq2, seq2, seq2),
        out_specs=seq4,
    )(q, k, v, q_positions, kv_positions, kv_valid)
    if layout == "zigzag" and axis_size > 1:
        out = jnp.take(out, inv, axis=1)
    return out
