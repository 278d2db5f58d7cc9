"""Training-loss forwards for all three model families: finite losses,
gradient flow, ignore-index masking."""
import numpy as np
import jax
import jax.numpy as jnp

from mosstts_tpu.core.config import (
    DelayConfig,
    LocalConfig,
    RealtimeConfig,
    RealtimeLocalConfig,
    tiny_qwen3,
)
from mosstts_tpu.models.delay import delay_loss, delay_train_step, init_delay_params
from mosstts_tpu.models.local import init_local_params, local_loss
from mosstts_tpu.models.realtime import init_realtime_params, realtime_loss


def _batch(rng, B, T, C, vocab=200):
    ids = rng.integers(0, vocab, (B, T, C))
    labels = rng.integers(0, vocab, (B, T, C))
    labels[:, :3] = -100  # masked prefix
    mask = np.ones((B, T), bool)
    return (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels))


def test_delay_loss_and_grad():
    cfg = DelayConfig(language_config=tiny_qwen3(vocab_size=256), n_vq=4)
    params = init_delay_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids, mask, labels = _batch(rng, 2, 8, cfg.channels)
    loss, aux = jax.jit(lambda p: delay_loss(p, cfg, ids, mask, labels))(params)
    assert np.isfinite(float(loss))
    assert aux["channel_losses"].shape == (cfg.channels,)

    # channel weights change the scalar loss
    w = jnp.asarray([2.0] + [1.0] * cfg.n_vq)
    loss_w, _ = jax.jit(
        lambda p: delay_loss(p, cfg, ids, mask, labels, channelwise_loss_weight=w)
    )(params)
    assert abs(float(loss_w) - float(loss)) > 1e-6

    # one SGD step reduces loss on the same batch
    batch = {"input_ids": ids, "attention_mask": mask, "labels": labels}
    new_params, loss0, _ = jax.jit(
        lambda p, b: delay_train_step(p, cfg, b, lr=1e-2)
    )(params, batch)
    loss1, _ = jax.jit(lambda p: delay_loss(p, cfg, ids, mask, labels))(new_params)
    assert float(loss1) < float(loss0)


def test_local_loss():
    cfg = LocalConfig(
        language_config=tiny_qwen3(vocab_size=256), n_vq=4,
        additional_mlp_ffn_hidden_size=32, local_ffn_hidden_size=48,
        local_hidden_size=24, local_num_layers=2,
    )
    params = init_local_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    ids, mask, labels = _batch(rng, 2, 6, cfg.channels)
    loss, aux = jax.jit(lambda p: local_loss(p, cfg, ids, mask, labels))(params)
    assert np.isfinite(float(loss))
    assert aux["loss_all"].shape == (cfg.channels,)
    grads = jax.jit(jax.grad(lambda p: local_loss(p, cfg, ids, mask, labels)[0]))(params)
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_realtime_loss_masks_untrained_frames():
    cfg = RealtimeConfig(
        language_config=tiny_qwen3(hidden_size=32, num_attention_heads=2,
                                   num_key_value_heads=2, head_dim=16,
                                   intermediate_size=64, vocab_size=256),
        local_config=RealtimeLocalConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=2, head_dim=16, rvq=4,
            max_position_embeddings=5,
        ),
        rvq=4,
    )
    params = init_realtime_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    B, T = 2, 6
    ids = jnp.asarray(rng.integers(0, 200, (B, T, 1 + cfg.rvq)))
    mask = jnp.ones((B, T), jnp.bool_)
    labels = rng.integers(0, 1000, (B, T, 1 + cfg.rvq))
    labels[:, :2] = -100  # first frames untrained
    labels = jnp.asarray(labels)
    loss, aux = jax.jit(lambda p: realtime_loss(p, cfg, ids, mask, labels))(params)
    assert np.isfinite(float(loss))
    assert int(aux["trained_frames"]) == B * (T - 2)

    # all-masked labels give a finite (zero-count-guarded) loss
    labels0 = jnp.full_like(labels, -100)
    loss0, aux0 = jax.jit(lambda p: realtime_loss(p, cfg, ids, mask, labels0))(params)
    assert np.isfinite(float(loss0)) and int(aux0["trained_frames"]) == 0
