"""hidden_out_layers: per-head backbone source layers
(reference moss_tts_delay/modeling_moss_tts.py:236,280-289).

Checks (a) hidden_out_layers=[-1]*C reproduces the default path exactly
(HF hidden_states' last entry is post-final-norm), and (b) the cached
decode path matches the uncached oracle at a nontrivial layer mixture.
"""
import numpy as np
import jax
import jax.numpy as jnp

from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
from mosstts_tpu.models.delay import delay_forward, init_delay_params
from mosstts_tpu.nn.qwen3 import init_kv_cache

CFG = DelayConfig(
    language_config=tiny_qwen3(num_hidden_layers=3), n_vq=4
)
PARAMS = init_delay_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)


def _rand_ids(rng, B, T):
    ids = rng.integers(0, 1000, (B, T, CFG.channels))
    ids[..., 1:] = rng.integers(0, 1024, (B, T, CFG.n_vq))
    return jnp.asarray(ids)


def test_last_layer_matches_default():
    rng = np.random.default_rng(0)
    B, T = 2, 6
    ids = _rand_ids(rng, B, T)
    mask = jnp.ones((B, T), jnp.bool_)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    tl0, al0, _ = delay_forward(PARAMS, CFG, ids, positions=positions, kv_valid=mask)
    tl1, al1, _ = delay_forward(
        PARAMS, CFG, ids, positions=positions, kv_valid=mask,
        hidden_out_layers=(-1,) * CFG.channels,
    )
    np.testing.assert_allclose(np.asarray(tl0), np.asarray(tl1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(al0), np.asarray(al1), atol=1e-5)


def test_cached_decode_matches_uncached():
    rng = np.random.default_rng(1)
    B, T0, steps, S = 2, 7, 3, 32
    T = T0 + steps
    hol = (1, -1, 0, 2, -2)  # text from layer 1; audio heads from a mixture
    ids = _rand_ids(rng, B, T)
    mask = jnp.ones((B, T), jnp.bool_)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    full_tl, full_al, _ = delay_forward(
        PARAMS, CFG, ids, positions=positions, kv_valid=mask,
        hidden_out_layers=hol,
    )

    cache = init_kv_cache(CFG.language_config, B, S, dtype=jnp.float32)
    kv_valid = np.zeros((B, S), bool)
    kv_valid[:, :T0] = True
    tl, al, cache = delay_forward(
        PARAMS, CFG, ids[:, :T0], positions=positions[:, :T0],
        kv_valid=jnp.asarray(kv_valid), cache=cache, cache_offset=0,
        hidden_out_layers=hol,
    )
    np.testing.assert_allclose(np.asarray(tl), np.asarray(full_tl[:, :T0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(al), np.asarray(full_al[:, :T0]), atol=1e-4)

    for t in range(steps):
        pos = T0 + t
        kv_valid[:, pos] = True
        tl, al, cache = delay_forward(
            PARAMS, CFG, ids[:, pos:pos + 1], positions=positions[:, pos:pos + 1],
            kv_valid=jnp.asarray(kv_valid), cache=cache, cache_offset=pos,
            hidden_out_layers=hol,
        )
        np.testing.assert_allclose(
            np.asarray(tl[:, 0]), np.asarray(full_tl[:, pos]), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(al[:, 0]), np.asarray(full_al[:, pos]), atol=1e-4)


def test_engine_generates_with_hidden_out_layers():
    from mosstts_tpu.engine.delay_engine import DelayEngine

    engine = DelayEngine.random_init(
        seed=0, config=CFG, dtype=jnp.float32, cache_bucket=64,
        hidden_out_layers=(1, -1, 0, 2, -2),
    )
    rng = np.random.default_rng(2)
    ids = np.array(_rand_ids(rng, 1, 8))
    ids[0, 3, 0] = CFG.im_start_token_id
    out = engine.generate(ids, np.ones((1, 8), bool), max_new_tokens=6,
                          text_temperature=0.0, audio_temperature=0.0)
    assert out[0][1].shape[1] == CFG.channels
