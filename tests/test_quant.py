"""Weight-only int8 quantization: correctness + greedy stability."""
import numpy as np
import jax
import jax.numpy as jnp

from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
from mosstts_tpu.models.delay import delay_forward, init_delay_params
from mosstts_tpu.ops.quant import dequantize, quantize_tree, quantize_weight


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 32)) * 0.05, jnp.float32)
    qw = quantize_weight(w)
    assert qw.q.dtype == jnp.int8 and qw.scale.shape == (32,)
    back = dequantize(qw, jnp.float32)
    # per-channel int8: relative error bounded by ~1/127 of channel max
    err = np.abs(np.asarray(back - w))
    bound = np.asarray(qw.scale)[None, :] * 0.51
    assert (err <= bound + 1e-7).all()


def test_quantized_forward_greedy_matches():
    cfg = DelayConfig(language_config=tiny_qwen3(vocab_size=300), n_vq=4)
    params = init_delay_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_tree(params)
    # embeddings untouched, matmuls quantized
    assert qparams["backbone"]["embed"].dtype == params["backbone"]["embed"].dtype
    assert qparams["backbone"]["layers"]["wq"].q.dtype == jnp.int8
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 200, (2, 7, cfg.channels)))
    pos = jnp.broadcast_to(jnp.arange(7)[None], (2, 7)).astype(jnp.int32)
    kv = jnp.ones((2, 7), jnp.bool_)
    t0, a0, _ = jax.jit(lambda p: delay_forward(p, cfg, ids, positions=pos, kv_valid=kv))(params)
    t1, a1, _ = jax.jit(lambda p: delay_forward(p, cfg, ids, positions=pos, kv_valid=kv))(qparams)
    # random tiny weights have many near-tie logits; require high agreement
    # plus near-perfect logit correlation
    assert float((jnp.argmax(t0, -1) == jnp.argmax(t1, -1)).mean()) > 0.95
    assert float((jnp.argmax(a0, -1) == jnp.argmax(a1, -1)).mean()) > 0.95
    corr = np.corrcoef(np.asarray(t0).ravel(), np.asarray(t1).ravel())[0, 1]
    assert corr > 0.999
