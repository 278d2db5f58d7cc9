"""Codec training objective: time-domain + multi-scale spectral
reconstruction with straight-through RVQ and commitment loss.

The reference's codec arrives pre-trained with no in-repo training code;
this module makes the TPU codec trainable from scratch (the standard
neural-codec recipe: L1 waveform + multi-resolution log-magnitude STFT +
spectral convergence + VQ commitment), jit/pjit-compatible.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.config import CodecConfig, Qwen3Config
from ..ops.basic import dense, rms_norm
from .model import _txf_cfg
from .rvq import rvq_decode
from ..nn.qwen3 import qwen3_forward

STFT_SCALES: Sequence[Tuple[int, int]] = ((2048, 512), (1024, 256), (512, 128))


def stft_mag(x: jax.Array, frame: int, hop: int) -> jax.Array:
    """|STFT| of (B, L) with a Hann window -> (B, F, frame//2+1)."""
    B, L = x.shape
    n_frames = max(1, (L - frame) // hop + 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame)[None, :]
    frames = x[:, idx]  # (B, F, frame)
    win = jnp.hanning(frame).astype(x.dtype)
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return jnp.abs(spec)


def multiscale_stft_loss(x: jax.Array, y: jax.Array,
                         scales=STFT_SCALES) -> jax.Array:
    """Sum over scales of (spectral convergence + log-magnitude L1)."""
    loss = 0.0
    for frame, hop in scales:
        if x.shape[-1] < frame:
            continue
        mx = stft_mag(x, frame, hop)
        my = stft_mag(y, frame, hop)
        sc = jnp.linalg.norm(mx - my) / (jnp.linalg.norm(mx) + 1e-6)
        mag = jnp.mean(jnp.abs(jnp.log(mx + 1e-5) - jnp.log(my + 1e-5)))
        loss = loss + sc + mag
    return loss


def codec_forward_train(params, cfg: CodecConfig, wav: jax.Array,
                        num_quantizers: int):
    """Full-window encode -> ST-RVQ -> decode for training (B, T*hop)."""
    B, L = wav.shape
    hop = cfg.hop
    T = L // hop
    frames = wav[:, : T * hop].reshape(B, T, hop)

    x = dense(frames, params["enc_in"])
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    h, _ = qwen3_forward(
        params["encoder"], _txf_cfg(cfg, cfg.num_encoder_layers), x,
        positions=positions, kv_valid=jnp.ones((B, T), jnp.bool_),
        attn_window=cfg.causal_context,
    )
    latents = dense(h, params["enc_out"]).astype(jnp.float32)

    # residual quantization with per-level codes (differentiable via ST)
    books = params["rvq"]["codebooks"][:num_quantizers].astype(jnp.float32)

    def level(residual, book):
        dots = jnp.einsum("btd,kd->btk", residual, book)
        c2 = jnp.sum(book * book, axis=-1)
        codes = jnp.argmin(c2[None, None] - 2.0 * dots, axis=-1)
        q = jnp.take(book, codes, axis=0)
        return residual - q, q

    residual, qs = jax.lax.scan(level, latents, books)
    quantized = latents - residual  # sum of selected codebook vectors
    commitment = jnp.mean((latents - jax.lax.stop_gradient(quantized)) ** 2)
    codebook_loss = jnp.mean((jax.lax.stop_gradient(latents) - quantized) ** 2)
    # straight-through estimator
    quantized_st = latents + jax.lax.stop_gradient(quantized - latents)

    y = dense(quantized_st.astype(params["dec_in"].dtype), params["dec_in"])
    h, _ = qwen3_forward(
        params["decoder"], _txf_cfg(cfg, cfg.num_decoder_layers), y,
        positions=positions, kv_valid=jnp.ones((B, T), jnp.bool_),
        attn_window=cfg.causal_context,
    )
    h = rms_norm(h, params["dec_out_norm"], cfg.rms_norm_eps)
    frames_out = dense(h, params["dec_out"])  # (B, T, hop+ov)
    from .model import overlap_add

    recon, _ = overlap_add(
        frames_out, jnp.zeros((B, cfg.overlap), frames_out.dtype), hop, cfg.overlap
    )
    return recon, {"commitment": commitment, "codebook": codebook_loss}


def si_snr_loss(est: jax.Array, ref: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Negative scale-invariant SNR in dB, batch mean — the differentiable
    counterpart of train.si_snr. Magnitude-STFT losses alone leave the
    reconstruction phase-incoherent (spectra match, waveforms do not);
    this term makes the decoder time-align its output."""
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    proj = (jnp.sum(est * ref, axis=-1, keepdims=True)
            / (jnp.sum(ref * ref, axis=-1, keepdims=True) + eps)) * ref
    noise = est - proj
    ratio = (jnp.sum(proj * proj, axis=-1)
             / (jnp.sum(noise * noise, axis=-1) + eps))
    return -jnp.mean(10.0 * jnp.log10(ratio + eps))


def lag_align(est: jax.Array, ref: jax.Array, max_shift: int = 96,
              hop: int = 8):
    """Per-row best constant-lag alignment of ``est`` to ``ref``.

    Causal codec stacks tend to settle on a small constant output delay;
    waveform losses (L1, SI-SNR) then fight that delay for thousands of
    steps instead of judging content. The lag is chosen per batch row by
    SI-SNR over a static candidate set (every ``hop`` samples in
    [-max_shift, max_shift]); the selection is stop-gradient (a hard
    one-hot), so gradients flow only through the chosen alignment.
    Returns (est_aligned, ref_center), both of static length
    n - 2*max_shift."""
    n = min(est.shape[-1], ref.shape[-1])
    est, ref = est[..., :n], ref[..., :n]
    ms = max_shift
    lags = list(range(-ms, ms + 1, hop))
    if lags[-1] != ms:
        lags.append(ms)
    ref_c = ref[..., ms: n - ms]
    cands = jnp.stack([est[..., ms + k: n - ms + k] for k in lags])  # (L,B,T)
    rz = ref_c - jnp.mean(ref_c, axis=-1, keepdims=True)
    ez = cands - jnp.mean(cands, axis=-1, keepdims=True)
    proj = (jnp.sum(ez * rz, axis=-1, keepdims=True)
            / (jnp.sum(rz * rz, axis=-1, keepdims=True) + 1e-8)) * rz
    noise = ez - proj
    score = (jnp.sum(proj * proj, axis=-1)
             / (jnp.sum(noise * noise, axis=-1) + 1e-8))  # (L, B)
    idx = jax.lax.stop_gradient(jnp.argmax(score, axis=0))  # (B,)
    est_a = jnp.take_along_axis(cands, idx[None, :, None], axis=0)[0]
    return est_a, ref_c


def codec_loss(params, cfg: CodecConfig, wav: jax.Array,
               num_quantizers: int = 8, commit_weight: float = 0.25,
               stft_weight: float = 1.0, l1_weight: float = 1.0,
               snr_weight: float = 1.0, lag_tolerance: int = 0):
    recon, aux = codec_forward_train(params, cfg, wav, num_quantizers)
    target = wav[:, : recon.shape[1]].astype(jnp.float32)
    reconf = recon.astype(jnp.float32)
    if lag_tolerance > 0:
        reconf, target = lag_align(reconf, target, max_shift=lag_tolerance)
    l1 = jnp.mean(jnp.abs(reconf - target))
    spec = multiscale_stft_loss(target, reconf)
    neg_snr = si_snr_loss(reconf, target)
    total = (l1_weight * l1 + stft_weight * spec + snr_weight * neg_snr
             + commit_weight * aux["commitment"] + aux["codebook"])
    return total, {"l1": l1, "stft": spec, "neg_si_snr_db": neg_snr, **aux}


def codec_train_step(params, cfg: CodecConfig, wav: jax.Array, *,
                     num_quantizers: int = 8, lr: float = 1e-4):
    (loss, aux), grads = jax.value_and_grad(
        lambda p: codec_loss(p, cfg, wav, num_quantizers), has_aux=True
    )(params)
    new_params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), params, grads)
    return new_params, loss, aux
