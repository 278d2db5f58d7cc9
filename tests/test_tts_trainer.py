"""Unified TTS trainer: loss decreases for all three families, sharded
training runs on the CPU mesh, and checkpoints round-trip through the
serving loader format."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mosstts_tpu.core.config import (
    DelayConfig, LocalConfig, RealtimeConfig, RealtimeLocalConfig, tiny_qwen3,
)
from mosstts_tpu.train import TTSTrainer, synthetic_tts_batch


def _cfg(family):
    tiny = tiny_qwen3()
    if family == "delay":
        return DelayConfig(language_config=tiny, n_vq=4)
    if family == "local":
        return LocalConfig(language_config=tiny, n_vq=4,
                           additional_mlp_ffn_hidden_size=32,
                           local_ffn_hidden_size=48, local_hidden_size=24,
                           local_num_layers=2)
    return RealtimeConfig(
        language_config=tiny_qwen3(hidden_size=32, num_attention_heads=2,
                                   num_key_value_heads=2, head_dim=16,
                                   intermediate_size=64),
        local_config=RealtimeLocalConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=2, head_dim=16,
            rvq=4, max_position_embeddings=5),
        rvq=4)


@pytest.mark.parametrize("family", ["delay", "local", "realtime"])
def test_trainer_loss_decreases(family):
    cfg = _cfg(family)
    trainer = TTSTrainer(family, cfg, peak_lr=3e-3, warmup_steps=2,
                         total_steps=30)
    rng = np.random.default_rng(0)
    fixed = synthetic_tts_batch(family, cfg, rng, batch=2, seq=18)
    first = trainer.train_step(fixed)["loss"]
    for _ in range(25):
        last = trainer.train_step(fixed)["loss"]
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_sharded_runs():
    from mosstts_tpu.parallel.mesh import make_mesh

    cfg = _cfg("delay")
    mesh = make_mesh(data=2, model=4)
    trainer = TTSTrainer("delay", cfg, peak_lr=1e-3, warmup_steps=1,
                         total_steps=5, mesh=mesh)
    rng = np.random.default_rng(1)
    rec = trainer.train_step(synthetic_tts_batch("delay", cfg, rng))
    assert np.isfinite(rec["loss"]) and rec["grad_norm"] > 0

    # first-step loss matches the unsharded trainer (GSPMD is math-neutral)
    solo = TTSTrainer("delay", cfg, peak_lr=1e-3, warmup_steps=1, total_steps=5)
    rng = np.random.default_rng(1)
    rec_solo = solo.train_step(synthetic_tts_batch("delay", cfg, rng))
    np.testing.assert_allclose(rec["loss"], rec_solo["loss"], rtol=2e-5)


def test_trainer_checkpoint_roundtrip(tmp_path):
    from mosstts_tpu.utils.save import load_model

    cfg = _cfg("delay")
    trainer = TTSTrainer("delay", cfg, total_steps=3)
    rng = np.random.default_rng(2)
    trainer.train_step(synthetic_tts_batch("delay", cfg, rng))
    trainer.save(str(tmp_path / "ckpt"))

    params, loaded_cfg = load_model(tmp_path / "ckpt")
    assert isinstance(loaded_cfg, DelayConfig)
    ref_leaf = jax.tree.leaves(jax.device_get(trainer.params))[0]
    got_leaf = jax.tree.leaves(params)[0]
    assert ref_leaf.shape == got_leaf.shape


def test_train_then_serve_roundtrip(tmp_path):
    """A trainer checkpoint must come back through the serving loader and
    decode — the full train -> save -> load -> generate lifecycle."""
    from mosstts_tpu.engine.delay_engine import DelayEngine
    from mosstts_tpu.utils.save import load_model

    cfg = _cfg("delay")
    trainer = TTSTrainer("delay", cfg, total_steps=3)
    rng = np.random.default_rng(3)
    trainer.train_step(synthetic_tts_batch("delay", cfg, rng))
    trainer.save(str(tmp_path / "ckpt"))

    params, loaded_cfg = load_model(tmp_path / "ckpt", dtype=jnp.float32)
    engine = DelayEngine(params, loaded_cfg, dtype=jnp.float32, cache_bucket=32)
    ids = rng.integers(0, 200, (1, 10, loaded_cfg.channels))
    ids[0, 2, 0] = loaded_cfg.im_start_token_id
    ids[0, 4, 0] = loaded_cfg.audio_start_token_id
    ids[0, -1, 0] = loaded_cfg.audio_assistant_gen_slot_token_id
    out = engine.generate(ids, np.ones((1, 10), bool), max_new_tokens=8,
                          text_temperature=0.0, audio_temperature=0.0)
    _, grid = out[0]
    assert grid.shape[1] == loaded_cfg.channels
    assert np.isfinite(grid).all()


@pytest.mark.parametrize("family", ["delay", "local", "realtime"])
def test_trainer_remat_loss_equal(family):
    """jax.checkpoint around the backbone layer scan changes only the
    backward-pass memory schedule, not the math: the remat trainer's first
    step must produce the same loss and gradient norm as the plain one."""
    cfg = _cfg(family)
    rng = np.random.default_rng(7)
    batch = synthetic_tts_batch(family, cfg, rng, batch=2, seq=16)
    plain = TTSTrainer(family, cfg, total_steps=3).train_step(batch)
    remat = TTSTrainer(family, cfg, total_steps=3, remat=True).train_step(batch)
    np.testing.assert_allclose(remat["loss"], plain["loss"], rtol=1e-6)
    np.testing.assert_allclose(remat["grad_norm"], plain["grad_norm"],
                               rtol=1e-5)


def test_remat_reduces_peak_training_memory():
    """The point of the flag: compiled peak temp memory of the delay train
    step must drop with remat at a long-sequence shape (layers re-run in
    backward instead of storing activations)."""
    from mosstts_tpu.models.delay import delay_loss, init_delay_params

    cfg = _cfg("delay")
    params = init_delay_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    batch = synthetic_tts_batch("delay", cfg, rng, batch=2, seq=256)
    b = {k: jnp.asarray(v) for k, v in batch.items()}

    def grads(remat):
        f = lambda p: delay_loss(p, cfg, b["input_ids"], b["attention_mask"],
                                 b["labels"], remat=remat)[0]
        return jax.jit(jax.grad(f)).lower(params).compile()

    plain = grads(False).memory_analysis()
    ckpt = grads(True).memory_analysis()
    if plain is None or ckpt is None:
        pytest.skip("backend exposes no memory analysis")
    assert ckpt.temp_size_in_bytes < plain.temp_size_in_bytes, (
        ckpt.temp_size_in_bytes, plain.temp_size_in_bytes)


def test_train_state_checkpoint_resume(tmp_path):
    """Preemption resume: save the FULL train state (params + optimizer
    moments + step) mid-run, restore into a fresh trainer, and the
    continued losses must equal an uninterrupted run exactly — proving the
    AdamW moments survived (model-only save would diverge)."""
    cfg = _cfg("delay")
    rng = np.random.default_rng(21)
    batches = [synthetic_tts_batch("delay", cfg, rng, batch=2, seq=16)
               for _ in range(6)]

    straight = TTSTrainer("delay", cfg, peak_lr=3e-3, warmup_steps=2,
                          total_steps=10)
    losses_straight = [straight.train_step(b)["loss"] for b in batches]

    first = TTSTrainer("delay", cfg, peak_lr=3e-3, warmup_steps=2,
                       total_steps=10)
    for b in batches[:3]:
        first.train_step(b)
    first.save_state(tmp_path / "ckpt")

    resumed = TTSTrainer("delay", cfg, seed=123, peak_lr=3e-3,
                         warmup_steps=2, total_steps=10)
    resumed.restore_state(tmp_path / "ckpt")
    assert resumed.step_idx == 3
    assert len(resumed.history) == 3
    losses_resumed = [resumed.train_step(b)["loss"] for b in batches[3:]]

    np.testing.assert_allclose(losses_resumed, losses_straight[3:],
                               rtol=1e-6)

    import pytest as _pytest
    wrong = TTSTrainer("local", _cfg("local"), total_steps=10)
    with _pytest.raises(Exception):
        wrong.restore_state(tmp_path / "ckpt")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_train_state_checkpoint_resume_sharded(tmp_path):
    """Resume on a mesh: the orbax restore target carries the trainer's
    NamedShardings, so a sharded run resumes with identical losses."""
    from mosstts_tpu.parallel.mesh import make_mesh

    cfg = _cfg("delay")
    mesh = make_mesh(data=2, model=4)
    rng = np.random.default_rng(31)
    batches = [synthetic_tts_batch("delay", cfg, rng, batch=2, seq=12)
               for _ in range(4)]

    a = TTSTrainer("delay", cfg, peak_lr=3e-3, warmup_steps=1,
                   total_steps=8, mesh=mesh)
    ref = [a.train_step(b)["loss"] for b in batches]

    b_tr = TTSTrainer("delay", cfg, peak_lr=3e-3, warmup_steps=1,
                      total_steps=8, mesh=mesh)
    for b in batches[:2]:
        b_tr.train_step(b)
    b_tr.save_state(tmp_path / "sharded")

    c = TTSTrainer("delay", cfg, seed=7, peak_lr=3e-3, warmup_steps=1,
                   total_steps=8, mesh=mesh)
    c.restore_state(tmp_path / "sharded")
    got = [c.train_step(b)["loss"] for b in batches[2:]]
    np.testing.assert_allclose(got, ref[2:], rtol=1e-6)
