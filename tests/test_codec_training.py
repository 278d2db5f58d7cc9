"""Codec training objective: finite losses, gradient flow, loss decreases."""
import numpy as np
import jax
import jax.numpy as jnp

from mosstts_tpu.codec.losses import codec_loss, codec_train_step, multiscale_stft_loss, stft_mag
from mosstts_tpu.codec.model import init_codec_params
from tests.test_codec import TINY


def test_stft_mag_shapes():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4096)), jnp.float32)
    m = stft_mag(x, 1024, 256)
    assert m.shape == (2, 13, 513)
    assert float(multiscale_stft_loss(x, x)) < 1e-5


def test_codec_training_step_decreases_loss():
    cfg = TINY
    params = init_codec_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t = np.arange(cfg.hop * 12) / cfg.sampling_rate
    wav = (0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(len(t)))
    wav = jnp.asarray(wav[None].repeat(2, 0), jnp.float32)

    step = jax.jit(lambda p, w: codec_train_step(p, cfg, w, num_quantizers=2, lr=3e-4))
    p = params
    losses = []
    for _ in range(8):
        p, loss, aux = step(p, wav)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert float(aux["commitment"]) >= 0
