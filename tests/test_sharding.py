"""Mesh/pjit sharding tests on the virtual 8-device CPU mesh.

NOTE: the axon sitecustomize pins the CPU backend to 1 device when
PALLAS_AXON_POOL_IPS is set; run with `PALLAS_AXON_POOL_IPS= pytest ...` to
exercise these (they skip gracefully otherwise). The driver separately
validates the multi-chip path via __graft_entry__.dryrun_multichip.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

multi_device = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual CPU devices"
)


@multi_device
def test_delay_train_step_sharded_matches_single():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
    from mosstts_tpu.models.delay import delay_train_step, init_delay_params
    from mosstts_tpu.parallel.mesh import delay_param_specs, make_mesh, shard_params

    cfg = DelayConfig(language_config=tiny_qwen3(vocab_size=512), n_vq=8)
    params = init_delay_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, T = 4, 12
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 500, (B, T, cfg.channels))),
        "attention_mask": jnp.ones((B, T), jnp.bool_),
        "labels": jnp.asarray(rng.integers(0, 500, (B, T, cfg.channels))),
    }

    # single-device reference
    _, loss_ref, _ = jax.jit(lambda p, b: delay_train_step(p, cfg, b))(params, batch)

    mesh = make_mesh(data=2, model=4)
    sharded = shard_params(params, mesh, delay_param_specs())
    batch_sh = {
        k: jax.device_put(v, NamedSharding(mesh, P("data")))
        for k, v in batch.items()
    }
    _, loss_sh, _ = jax.jit(lambda p, b: delay_train_step(p, cfg, b))(sharded, batch_sh)
    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=2e-5)


@multi_device
def test_delay_forward_tensor_parallel_matches():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
    from mosstts_tpu.models.delay import delay_forward, init_delay_params
    from mosstts_tpu.parallel.mesh import delay_param_specs, make_mesh, shard_params

    cfg = DelayConfig(language_config=tiny_qwen3(vocab_size=512), n_vq=8)
    params = init_delay_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    B, T = 2, 9
    ids = jnp.asarray(rng.integers(0, 500, (B, T, cfg.channels)))
    mask = jnp.ones((B, T), jnp.bool_)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T)).astype(jnp.int32)

    def fwd(p):
        t, a, _ = delay_forward(p, cfg, ids, positions=pos, kv_valid=mask)
        return t, a

    t_ref, a_ref = jax.jit(fwd)(params)

    mesh = make_mesh(data=1, model=8)
    sharded = shard_params(params, mesh, delay_param_specs())
    t_sh, a_sh = jax.jit(fwd)(sharded)
    np.testing.assert_allclose(np.asarray(t_ref), np.asarray(t_sh), atol=2e-4)
    np.testing.assert_allclose(np.asarray(a_ref), np.asarray(a_sh), atol=2e-4)


def test_graft_entry_single_device():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape[-1] == 151936

    n = len(jax.devices())
    mod.dryrun_multichip(min(n, 8))


@multi_device
def test_delay_engine_sharded_generate_matches_single():
    """ENGINE-level sharded serving: DelayEngine(mesh=...) shards params
    (model-TP) and the batch on 'data', and generate() emits tokens equal to
    the single-device engine (SURVEY §2.b: multi-stream serving shards
    streams on data, the 8B backbone on model)."""
    from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
    from mosstts_tpu.engine.delay_engine import DelayEngine
    from mosstts_tpu.models.delay import init_delay_params
    from mosstts_tpu.parallel.mesh import make_mesh

    cfg = DelayConfig(language_config=tiny_qwen3(vocab_size=512), n_vq=4)
    params = init_delay_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    B, T = 4, 8
    ids = rng.integers(0, 500, (B, T, cfg.channels))
    ids[:, 1, 0] = cfg.im_start_token_id
    ids[:, -1, 0] = cfg.audio_assistant_gen_slot_token_id

    kw = dict(dtype=jnp.float32, cache_bucket=32)
    solo = DelayEngine(params, cfg, **kw).generate(
        ids, max_new_tokens=12, text_temperature=0.0, audio_temperature=0.0)

    mesh = make_mesh(data=2, model=4)
    sharded = DelayEngine(params, cfg, mesh=mesh, **kw).generate(
        ids, max_new_tokens=12, text_temperature=0.0, audio_temperature=0.0)

    for (s_start, s_toks), (m_start, m_toks) in zip(solo, sharded):
        assert s_start == m_start
        np.testing.assert_array_equal(s_toks, m_toks)


@multi_device
def test_batch_server_model_parallel_matches_single():
    """Continuous batching with the backbone sharded tensor-parallel over
    'model' (batch-1 prefill splice forbids a data axis) matches the
    unsharded server token-for-token."""
    from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
    from mosstts_tpu.engine.batch_server import DelayBatchServer
    from mosstts_tpu.models.delay import init_delay_params, make_sampling
    from mosstts_tpu.parallel.mesh import make_mesh

    # n_vq=8 so audio_emb's codebook axis divides the 8-way model axis
    cfg = DelayConfig(language_config=tiny_qwen3(vocab_size=512), n_vq=8)
    params = init_delay_params(jax.random.PRNGKey(6), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(6)
    grids = []
    for i in range(3):
        g = rng.integers(0, 500, (8 + i, cfg.channels))
        g[1, 0] = cfg.im_start_token_id
        g[-1, 0] = cfg.audio_assistant_gen_slot_token_id
        grids.append(g)

    def run(mesh):
        server = DelayBatchServer(
            params, cfg, slots=2, cache_len=128, out_capacity=32,
            prompt_bucket=16, dtype=jnp.float32, mesh=mesh,
            sampling=make_sampling(text_temperature=0.0, audio_temperature=0.0),
        )
        rids = [server.submit(g, max_new_tokens=10) for g in grids]
        done = {c.request_id: c for c in server.run(max_steps=300)}
        return [done[r] for r in rids]

    ref = run(None)
    par = run(make_mesh(data=1, model=8))
    for a, b in zip(ref, par):
        assert a.start_length == b.start_length
        np.testing.assert_array_equal(a.tokens, b.tokens)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        DelayBatchServer(params, cfg, slots=2, mesh=make_mesh(data=2, model=4))


@multi_device
def test_delay_decode_sharded_matches_single():
    """The SERVING path under GSPMD: prefill + greedy decode steps with the
    engine's jitted programs over a (data, model) mesh produce the same
    tokens as single-device — the multi-stream decode story (SURVEY §2.b:
    streams shard on data, the backbone on model)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
    from mosstts_tpu.models.delay import (
        delay_decode_step, delay_prefill, init_delay_params, make_sampling,
    )
    from mosstts_tpu.parallel.mesh import delay_param_specs, make_mesh, shard_params

    cfg = DelayConfig(language_config=tiny_qwen3(vocab_size=512), n_vq=8)
    params = init_delay_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    sampling = make_sampling(text_temperature=0, audio_temperature=0)  # greedy
    rng = np.random.default_rng(2)
    B, T = 4, 10
    ids = rng.integers(0, 500, (B, T, cfg.channels))
    ids[:, 2, 0] = cfg.im_start_token_id
    ids[:, 4, 0] = cfg.audio_start_token_id
    ids[:, -1, 0] = cfg.audio_assistant_gen_slot_token_id
    ids_j = jnp.asarray(ids)
    mask = jnp.ones((B, T), jnp.bool_)

    def run(p, ids_in, mask_in):
        st = delay_prefill(p, cfg, ids_in, mask_in, max_new_tokens=8,
                           cache_len=64, rng=jax.random.PRNGKey(3),
                           sampling=sampling, dtype=jnp.float32)
        for _ in range(6):
            st = delay_decode_step(p, cfg, st, sampling, attend_len=64)
        return st.out

    out_ref = np.asarray(jax.jit(run)(params, ids_j, mask))

    mesh = make_mesh(data=2, model=4)
    sharded = shard_params(params, mesh, delay_param_specs())
    ids_sh = jax.device_put(ids_j, NamedSharding(mesh, P("data")))
    mask_sh = jax.device_put(mask, NamedSharding(mesh, P("data")))
    out_sh = np.asarray(jax.jit(run)(sharded, ids_sh, mask_sh))
    np.testing.assert_array_equal(out_ref, out_sh)


@multi_device
def test_dcn_multislice_mesh_matches_single():
    """Cross-slice (DCN) fleet mesh: make_mesh(dcn=N) keeps the
    ('data','model') axis names — every sharding rule unchanged — but
    orders devices slice-major on 'data' so TP collectives stay intra-slice
    (ICI) and only data/gradient collectives cross DCN. Numerics must match
    single-device exactly as for the flat mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
    from mosstts_tpu.models.delay import delay_train_step, init_delay_params
    from mosstts_tpu.parallel.mesh import delay_param_specs, make_mesh, shard_params

    mesh = make_mesh(data=4, model=2, dcn=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    # slice-major: rows [0,1] are slice 0, rows [2,3] slice 1 — each
    # model-axis row (TP group) sits entirely inside one slice
    flat = mesh.devices.reshape(2, 2, 2)
    slice0 = {d.id for d in flat[0].ravel()}
    slice1 = {d.id for d in flat[1].ravel()}
    assert slice0.isdisjoint(slice1)

    cfg = DelayConfig(language_config=tiny_qwen3(vocab_size=512), n_vq=8)
    params = init_delay_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    B, T = 4, 12
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 500, (B, T, cfg.channels))),
        "attention_mask": jnp.ones((B, T), jnp.bool_),
        "labels": jnp.asarray(rng.integers(0, 500, (B, T, cfg.channels))),
    }
    _, loss_ref, _ = jax.jit(lambda p, b: delay_train_step(p, cfg, b))(params, batch)

    sharded = shard_params(params, mesh, delay_param_specs())
    batch_sh = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
                for k, v in batch.items()}
    _, loss_sh, _ = jax.jit(lambda p, b: delay_train_step(p, cfg, b))(sharded, batch_sh)
    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=2e-5)

    with pytest.raises(ValueError):
        make_mesh(data=4, model=2, dcn=3)  # 4 % 3 != 0


@multi_device
def test_delay_engine_sharded_on_device_generate():
    """The zero-host-round-trip while_loop generation path under GSPMD:
    DelayEngine(mesh=...).generate(on_device=True) must equal the
    single-device on-device path (donated sharded carries through
    lax.while_loop segments)."""
    from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
    from mosstts_tpu.engine.delay_engine import DelayEngine
    from mosstts_tpu.models.delay import init_delay_params
    from mosstts_tpu.parallel.mesh import make_mesh

    cfg = DelayConfig(language_config=tiny_qwen3(vocab_size=512), n_vq=4)
    params = init_delay_params(jax.random.PRNGKey(8), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(8)
    ids = rng.integers(0, 500, (4, 8, cfg.channels))
    ids[:, 1, 0] = cfg.im_start_token_id
    ids[:, -1, 0] = cfg.audio_assistant_gen_slot_token_id

    kw = dict(dtype=jnp.float32, cache_bucket=32)
    gen = dict(max_new_tokens=10, text_temperature=0.0, audio_temperature=0.0,
               on_device=True)
    solo = DelayEngine(params, cfg, **kw).generate(ids, **gen)
    mesh = make_mesh(data=2, model=4)
    sharded = DelayEngine(params, cfg, mesh=mesh, **kw).generate(ids, **gen)
    for (s_start, s_toks), (m_start, m_toks) in zip(solo, sharded):
        assert s_start == m_start
        np.testing.assert_array_equal(s_toks, m_toks)
