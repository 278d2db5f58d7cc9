"""Weight-only int8 quantization for serving.

Decode steps are weight-bandwidth bound; storing matmul weights as int8 with
per-output-channel fp32 scales halves the HBM traffic — XLA fuses the
dequant-convert into the matmul operand read. Opt-in (engines take
``quantize="int8"``); parity/quality paths stay bf16/f32.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class QuantWeight(NamedTuple):
    """int8 weight + per-output-channel scale. Layout matches the dense
    (in, out) / stacked (n, in, out) convention."""

    q: jax.Array  # int8 (..., in, out)
    scale: jax.Array  # f32 (..., out)

    @property
    def dtype(self):
        """Activation dtype call sites should compute in (callers probe a
        weight's dtype to pick buffer dtypes; int8 serving runs bf16
        activations)."""
        return jnp.bfloat16

    @property
    def ndim(self) -> int:
        return self.q.ndim

    @property
    def shape(self):
        return self.q.shape


def quantize_weight(w: jax.Array) -> QuantWeight:
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2) / 127.0  # (..., out)
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return QuantWeight(q=q, scale=scale)


def is_quantized(w) -> bool:
    return isinstance(w, QuantWeight)


def dequantize(w: QuantWeight, dtype=jnp.bfloat16) -> jax.Array:
    return (w.q.astype(jnp.float32) * w.scale[..., None, :]).astype(dtype)


# weight names eligible for quantization (2D+ matmul operands; embeddings
# are gathers and norms are tiny — keep those in bf16/f32)
MATMUL_KEYS = frozenset(
    {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
     "text_head", "audio_heads", "local_heads", "gate", "up", "down",
     "enc_in", "enc_out", "dec_in", "dec_out"}
)


def random_quantized_like(shapes: Any, seed: int = 0, dtype=jnp.bfloat16,
                          std: float = 0.02) -> Any:
    """Build a random parameter pytree directly in the int8 serving layout.

    For configs whose bf16 initialization would not fit device HBM (the 8B
    Delay flagship is ~17 GB in bf16 on one 16 GB v5e), every MATMUL_KEYS
    leaf is created as int8 + per-output-channel scale on device without
    ever materializing a float master copy. ``shapes`` is the pytree of
    ``ShapeDtypeStruct`` from ``jax.eval_shape`` over the model's init fn.
    Benchmark-only: the weight values are random.
    """
    import functools

    base = jax.random.PRNGKey(seed)
    idx = [0]

    def next_key():
        idx[0] += 1
        return jax.random.fold_in(base, idx[0])

    @functools.partial(jax.jit, static_argnums=(1,))
    def int8_leaf(key, shape):
        # randint -> int8 fuses into one generate+clip+convert kernel; no
        # int32 intermediate is materialized in HBM.
        return jax.random.randint(key, shape, -127, 128, jnp.int32).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def float_leaf(key, shape, dt):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dt)

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if isinstance(v, dict):
                    out[k] = walk(v)
                elif k in MATMUL_KEYS and v.ndim >= 2:
                    q = int8_leaf(next_key(), tuple(v.shape))
                    # scale matching an N(0, std^2) master weight's absmax
                    scale = jnp.full(tuple(v.shape[:-2]) + (v.shape[-1],),
                                     std * 4.0 / 127.0, jnp.float32)
                    out[k] = QuantWeight(q=q, scale=scale)
                else:
                    out[k] = float_leaf(next_key(), tuple(v.shape), v.dtype)
            return out
        return node

    return walk(shapes)


def quantize_tree(params: Any) -> Any:
    """Quantize every eligible matmul weight in a param pytree (by key)."""
    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in MATMUL_KEYS and not isinstance(v, dict) and v.ndim >= 2:
                    out[k] = quantize_weight(v)
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def take_weight(w, idx, axis: int = 0):
    """``jnp.take`` over a (possibly quantized) stacked weight: selects one
    slice of a (n, in, out) stack with a traced index, preserving the
    QuantWeight pairing (q and its per-output-channel scale move together)."""
    if isinstance(w, QuantWeight):
        return QuantWeight(q=jnp.take(w.q, idx, axis=axis),
                           scale=jnp.take(w.scale, idx, axis=axis))
    return jnp.take(w, idx, axis=axis)
