"""Adversarial discriminators for codec training: MS-STFT + multi-period.

The reference ships its Cat codec pre-trained (README.md:378-408 sets the
quality bar; no training code in-repo). Reaching that bar from scratch
needs the adversarial half of the standard neural-codec recipe — a
multi-scale complex-STFT discriminator (EnCodec-style) plus a HiFi-GAN
multi-period discriminator, hinge GAN losses, and feature matching. This
module is that half, TPU-native: every conv is a `lax.conv_general_dilated`
(NHWC, bf16/f32 — XLA tiles these onto the MXU), parameters are plain
pytrees, and the whole G/D alternating step jits as one program
(`codec/train.py`).

Shapes are static: the STFT framing matches `losses.stft_mag` and period
reshapes pad to a multiple of the period, so batches of fixed seconds
compile once.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (frame, hop) per sub-discriminator; matches losses.STFT_SCALES plus a
# finer scale for transient detail
MSSTFT_SCALES: Sequence[Tuple[int, int]] = (
    (2048, 512), (1024, 256), (512, 128), (256, 64),
)
MPD_PERIODS: Sequence[int] = (2, 3, 5, 7, 11)

_LRELU_SLOPE = 0.1


def _conv_init(rng, kh, kw, cin, cout, dtype):
    scale = 1.0 / np.sqrt(kh * kw * cin)
    return jax.random.uniform(rng, (kh, kw, cin, cout), dtype,
                              minval=-scale, maxval=scale)


def _conv(x: jax.Array, w: jax.Array, stride: Tuple[int, int],
          dilation: Tuple[int, int] = (1, 1)) -> jax.Array:
    """NHWC conv, SAME padding (static shapes -> one compiled program)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding="SAME",
        rhs_dilation=dilation, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# ------------------------------- MS-STFT D -----------------------------------

def _stft_complex(x: jax.Array, frame: int, hop: int) -> jax.Array:
    """(B, L) -> (B, F, bins, 2) real/imag channels of the Hann STFT."""
    B, L = x.shape
    n_frames = max(1, (L - frame) // hop + 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame)[None, :]
    frames = x[:, idx] * jnp.hanning(frame).astype(x.dtype)
    spec = jnp.fft.rfft(frames, axis=-1)  # (B, F, bins)
    return jnp.stack([spec.real, spec.imag], axis=-1).astype(x.dtype)


def init_msstft_disc(rng: jax.Array, channels: int = 32,
                     scales: Sequence[Tuple[int, int]] = MSSTFT_SCALES,
                     dtype=jnp.float32) -> Dict[str, Any]:
    """One conv stack per STFT scale over the complex spectrogram: 2 input
    channels (re/im), time-dilated mid layers, stride 2 on frequency, and a
    1-channel head (EnCodec's MS-STFT discriminator shape, re-expressed as
    plain XLA convs)."""
    subs = []
    for i, _ in enumerate(scales):
        r = jax.random.fold_in(rng, i)
        ks = jax.random.split(r, 6)
        subs.append({
            "in": _conv_init(ks[0], 3, 9, 2, channels, dtype),
            "mid": [
                _conv_init(ks[1], 3, 9, channels, channels, dtype),
                _conv_init(ks[2], 3, 9, channels, channels, dtype),
                _conv_init(ks[3], 3, 9, channels, channels, dtype),
            ],
            "pre_out": _conv_init(ks[4], 3, 3, channels, channels, dtype),
            "out": _conv_init(ks[5], 3, 3, channels, 1, dtype),
        })
    # scales are static metadata, NOT params (they must stay out of the
    # traced/optimized pytree); forward passes them explicitly
    return {"subs": subs}


def msstft_disc_forward(params: Dict[str, Any], wav: jax.Array,
                        scales: Sequence[Tuple[int, int]] = MSSTFT_SCALES
                        ) -> List[Tuple[jax.Array, List[jax.Array]]]:
    """Per scale: (logit map, [intermediate feature maps]) — features feed
    the feature-matching loss."""
    outs = []
    for sub, (frame, hop) in zip(params["subs"], scales):
        if wav.shape[-1] < frame:
            continue
        x = _stft_complex(wav, frame, hop)  # (B, F, bins, 2)
        feats: List[jax.Array] = []
        h = jax.nn.leaky_relu(_conv(x, sub["in"], (1, 2)), _LRELU_SLOPE)
        feats.append(h)
        for j, w in enumerate(sub["mid"]):
            h = jax.nn.leaky_relu(
                _conv(h, w, (1, 2), dilation=(2 ** j, 1)), _LRELU_SLOPE)
            feats.append(h)
        h = jax.nn.leaky_relu(_conv(h, sub["pre_out"], (1, 1)), _LRELU_SLOPE)
        feats.append(h)
        logits = _conv(h, sub["out"], (1, 1))
        outs.append((logits, feats))
    return outs


# ------------------------------ multi-period D -------------------------------

def init_mpd_disc(rng: jax.Array, channels: int = 32,
                  periods: Sequence[int] = MPD_PERIODS,
                  dtype=jnp.float32) -> Dict[str, Any]:
    """HiFi-GAN multi-period discriminator: fold the waveform into a
    (L/p, p) image per prime period and run a strided conv stack down the
    time axis."""
    subs = []
    for i, _ in enumerate(periods):
        r = jax.random.fold_in(jax.random.fold_in(rng, 7919), i)
        ks = jax.random.split(r, 5)
        chs = [1, channels, channels * 2, channels * 4]
        stack = [
            _conv_init(ks[j], 5, 1, chs[j], chs[j + 1], dtype)
            for j in range(3)
        ]
        subs.append({
            "stack": stack,
            "pre_out": _conv_init(ks[3], 5, 1, chs[-1], chs[-1], dtype),
            "out": _conv_init(ks[4], 3, 1, chs[-1], 1, dtype),
        })
    return {"subs": subs}


def mpd_disc_forward(params: Dict[str, Any], wav: jax.Array,
                     periods: Sequence[int] = MPD_PERIODS
                     ) -> List[Tuple[jax.Array, List[jax.Array]]]:
    B, L = wav.shape
    outs = []
    for sub, p in zip(params["subs"], periods):
        Lp = ((L + p - 1) // p) * p
        x = jnp.pad(wav, ((0, 0), (0, Lp - L)), mode="reflect")
        x = x.reshape(B, Lp // p, p, 1)  # (B, T/p, p, 1) NHWC
        feats: List[jax.Array] = []
        h = x
        for w in sub["stack"]:
            h = jax.nn.leaky_relu(_conv(h, w, (3, 1)), _LRELU_SLOPE)
            feats.append(h)
        h = jax.nn.leaky_relu(_conv(h, sub["pre_out"], (1, 1)), _LRELU_SLOPE)
        feats.append(h)
        logits = _conv(h, sub["out"], (1, 1))
        outs.append((logits, feats))
    return outs


# ----------------------------- combined ensemble -----------------------------

def init_discriminators(rng: jax.Array, *, channels: int = 32,
                        use_msstft: bool = True, use_mpd: bool = True,
                        dtype=jnp.float32) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    k1, k2 = jax.random.split(rng)
    if use_msstft:
        out["msstft"] = init_msstft_disc(k1, channels, dtype=dtype)
    if use_mpd:
        out["mpd"] = init_mpd_disc(k2, channels, dtype=dtype)
    return out


def disc_forward(params: Dict[str, Any], wav: jax.Array
                 ) -> List[Tuple[jax.Array, List[jax.Array]]]:
    outs: List[Tuple[jax.Array, List[jax.Array]]] = []
    if "msstft" in params:
        outs.extend(msstft_disc_forward(params["msstft"], wav))
    if "mpd" in params:
        outs.extend(mpd_disc_forward(params["mpd"], wav))
    return outs


# --------------------------------- GAN losses --------------------------------

def hinge_d_loss(real_outs, fake_outs) -> jax.Array:
    """Mean over sub-discriminators of the hinge real/fake objective."""
    loss = 0.0
    for (lr_, _), (lf, _) in zip(real_outs, fake_outs):
        loss = loss + jnp.mean(jax.nn.relu(1.0 - lr_)) + jnp.mean(jax.nn.relu(1.0 + lf))
    return loss / max(1, len(real_outs))


def hinge_g_loss(fake_outs) -> jax.Array:
    loss = 0.0
    for lf, _ in fake_outs:
        loss = loss - jnp.mean(lf)
    return loss / max(1, len(fake_outs))


def feature_matching_loss(real_outs, fake_outs) -> jax.Array:
    """L1 between D's intermediate features on real vs generated audio,
    normalized per feature map by the real activation scale (EnCodec's
    relative feature-matching)."""
    loss = 0.0
    n = 0
    for (_, fr), (_, ff) in zip(real_outs, fake_outs):
        for r, f in zip(fr, ff):
            loss = loss + jnp.mean(jnp.abs(r - f)) / (jnp.mean(jnp.abs(r)) + 1e-5)
            n += 1
    return loss / max(1, n)
