"""Residual vector quantization (32-level x 1024-entry) in pure JAX.

The reference's codec ("Cat" MOSS-Audio-Tokenizer) ships no source (empty
moss_audio_tokenizer/ dir); this implements the documented quantizer
contract — 32 RVQ layers over 12.5 Hz latents, variable depth via
``num_quantizers`` (README.md:378-389, SURVEY.md S2.9).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_rvq_params(rng: jax.Array, n_q: int, codebook_size: int, dim: int, dtype=jnp.float32):
    # Codebook entries ~ unit-scale normals; scaled per level so deeper
    # residual levels start smaller.
    scales = (0.5 ** jnp.arange(n_q, dtype=jnp.float32))[:, None, None]
    base = jax.random.normal(rng, (n_q, codebook_size, dim), jnp.float32)
    return {"codebooks": (base * scales).astype(dtype)}


def rvq_encode(params, latents: jax.Array, num_quantizers: int) -> Tuple[jax.Array, jax.Array]:
    """latents: (B, T, dim) -> codes (NQ, B, T) int32, quantized (B, T, dim).

    Residual argmin over each level, as a ``lax.scan`` over the (static)
    quantizer depth.
    """
    books = params["codebooks"][:num_quantizers].astype(jnp.float32)  # (NQ, K, dim)

    def level(residual, book):
        # squared L2 distance argmin: |r|^2 - 2 r.c + |c|^2 (drop |r|^2)
        dots = jnp.einsum("btd,kd->btk", residual, book, preferred_element_type=jnp.float32)
        c2 = jnp.sum(book * book, axis=-1)  # (K,)
        dist = c2[None, None, :] - 2.0 * dots
        codes = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # (B, T)
        quant = jnp.take(book, codes, axis=0)  # (B, T, dim)
        return residual - quant, codes

    residual, codes = jax.lax.scan(level, latents.astype(jnp.float32), books)
    quantized = latents.astype(jnp.float32) - residual
    return codes, quantized


def rvq_decode(params, codes: jax.Array) -> jax.Array:
    """codes: (NQ, B, T) -> (B, T, dim) sum of codebook vectors."""
    nq = codes.shape[0]
    books = params["codebooks"][:nq].astype(jnp.float32)

    def level(acc, xs):
        book, lvl_codes = xs
        return acc + jnp.take(book, lvl_codes, axis=0), None

    init = jnp.zeros(codes.shape[1:] + (books.shape[-1],), jnp.float32)
    out, _ = jax.lax.scan(level, init, (books, codes))
    return out
