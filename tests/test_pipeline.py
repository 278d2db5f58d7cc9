"""Pipeline-parallel (GPipe over a 'stage' mesh axis) equality tests.

The pipelined schedule must be numerically invisible: forward hidden states
AND gradients equal the plain lax.scan-over-layers forward exactly (same
dtype, same op order within a layer), for any (stages, microbatches) split.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

multi_device = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual CPU devices"
)


def _setup(n_layers=8, B=8, T=12):
    from mosstts_tpu.core.config import tiny_qwen3
    from mosstts_tpu.nn.qwen3 import init_qwen3_params

    cfg = tiny_qwen3(vocab_size=512, num_hidden_layers=n_layers)
    params = init_qwen3_params(
        jax.random.PRNGKey(0), cfg, dtype=jnp.float32, with_embed=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, cfg.hidden_size)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    # ragged validity (left-pad style) exercises per-microbatch masks
    kv_valid = jnp.asarray(rng.random((B, T)) > 0.2)
    return cfg, params, x, positions, kv_valid


@multi_device
@pytest.mark.parametrize("stages,n_micro", [(4, 4), (8, 2), (2, 8)])
def test_pipelined_forward_matches_scan(stages, n_micro):
    from mosstts_tpu.nn.qwen3 import qwen3_forward
    from mosstts_tpu.parallel.pipeline import make_pp_mesh, pipelined_qwen3_forward

    cfg, params, x, positions, kv_valid = _setup()
    ref, _ = jax.jit(
        lambda p: qwen3_forward(p, cfg, x, positions=positions, kv_valid=kv_valid)
    )(params)

    mesh = make_pp_mesh(stages)
    out = jax.jit(
        lambda p: pipelined_qwen3_forward(
            p, cfg, x, positions=positions, kv_valid=kv_valid,
            mesh=mesh, n_micro=n_micro)
    )(params)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


@multi_device
def test_pipelined_grad_matches_scan():
    """Pipelined TRAINING: gradients through the scan+ppermute schedule equal
    the plain backward pass — the schedule is a pure re-bracketing."""
    from mosstts_tpu.nn.qwen3 import qwen3_forward
    from mosstts_tpu.parallel.pipeline import make_pp_mesh, pipelined_qwen3_forward

    cfg, params, x, positions, kv_valid = _setup()

    def loss_ref(p):
        h, _ = qwen3_forward(p, cfg, x, positions=positions, kv_valid=kv_valid)
        return jnp.mean(h * h)

    mesh = make_pp_mesh(4)

    def loss_pp(p):
        h = pipelined_qwen3_forward(
            p, cfg, x, positions=positions, kv_valid=kv_valid,
            mesh=mesh, n_micro=4)
        return jnp.mean(h * h)

    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_ref))(params)
    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pp))(params)
    np.testing.assert_allclose(float(l_ref), float(l_pp), rtol=1e-6)
    for path_ref, path_pp in zip(
        jax.tree.leaves_with_path(g_ref), jax.tree.leaves_with_path(g_pp)
    ):
        np.testing.assert_allclose(
            np.asarray(path_ref[1]), np.asarray(path_pp[1]),
            rtol=2e-4, atol=2e-5, err_msg=str(path_ref[0]))


@multi_device
def test_pipelined_remat_matches():
    """remat=True inside a stage body (gradient checkpointing composes with
    the pipeline schedule for big-model training)."""
    from mosstts_tpu.parallel.pipeline import make_pp_mesh, pipelined_qwen3_forward

    cfg, params, x, positions, kv_valid = _setup(n_layers=4)
    mesh = make_pp_mesh(4)

    def loss(p, remat):
        h = pipelined_qwen3_forward(
            p, cfg, x, positions=positions, kv_valid=kv_valid,
            mesh=mesh, n_micro=2, remat=remat)
        return jnp.mean(h * h)

    l0, g0 = jax.jit(jax.value_and_grad(lambda p: loss(p, False)))(params)
    l1, g1 = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@multi_device
def test_pipeline_composes_with_tensor_parallel():
    """('stage','model') mesh: the pipeline is manual over 'stage' only, so
    GSPMD TP shardings on the layer weights (heads/FFN columns on 'model')
    apply unchanged inside each stage body — PP x TP with zero hand-written
    collectives. Output must equal the plain scan."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mosstts_tpu.nn.qwen3 import qwen3_forward
    from mosstts_tpu.parallel.mesh import qwen3_param_specs, spec_for_path
    from mosstts_tpu.parallel.pipeline import make_pp_mesh, pipelined_qwen3_forward
    from jax.tree_util import tree_map_with_path

    cfg, params, x, positions, kv_valid = _setup()
    ref, _ = jax.jit(
        lambda p: qwen3_forward(p, cfg, x, positions=positions, kv_valid=kv_valid)
    )(params)

    mesh = make_pp_mesh(4, model=2)
    specs = qwen3_param_specs()
    sharded = tree_map_with_path(
        lambda path, a: jax.device_put(
            a, NamedSharding(mesh, spec_for_path(specs, path))), params)
    out = jax.jit(
        lambda p: pipelined_qwen3_forward(
            p, cfg, x, positions=positions, kv_valid=kv_valid,
            mesh=mesh, n_micro=4)
    )(sharded)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


@multi_device
def test_trainer_pipeline_matches_plain():
    """TTSTrainer(pipeline=(mesh, n_micro)) — the full delay train step
    (loss + AdamW update) through the GPipe schedule equals the plain
    trainer step on the same batch."""
    from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
    from mosstts_tpu.parallel.pipeline import make_pp_mesh
    from mosstts_tpu.train.trainer import TTSTrainer, synthetic_tts_batch

    cfg = DelayConfig(
        language_config=tiny_qwen3(vocab_size=512, num_hidden_layers=4),
        n_vq=4)
    rng = np.random.default_rng(3)
    batch = synthetic_tts_batch("delay", cfg, rng, batch=4, seq=10)

    plain = TTSTrainer("delay", cfg, seed=7)
    rec0 = plain.train_step(batch)

    pp = TTSTrainer("delay", cfg, seed=7,
                    pipeline=(make_pp_mesh(4), 2))
    rec1 = pp.train_step(batch)
    np.testing.assert_allclose(rec0["loss"], rec1["loss"], rtol=1e-5)
    np.testing.assert_allclose(rec0["grad_norm"], rec1["grad_norm"], rtol=1e-4)

    with pytest.raises(ValueError):
        TTSTrainer("local", cfg, pipeline=(make_pp_mesh(4), 2))


def test_split_stages_errors():
    from mosstts_tpu.parallel.pipeline import split_stages

    layers = {"w": jnp.zeros((6, 3))}
    with pytest.raises(ValueError):
        split_stages(layers, 4)
    out = split_stages(layers, 3)
    assert out["w"].shape == (3, 2, 3)
