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
