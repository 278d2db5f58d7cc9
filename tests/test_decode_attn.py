"""Pallas flash-decode kernel vs the einsum oracle (interpret mode on CPU).

The kernel itself only runs compiled on TPU (_decode_ok gates on backend);
these tests pin its semantics — including the kv-major einsum used as the
CPU/fallback path — so the TPU integration is a pure performance swap.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mosstts_tpu.ops.attention import gqa_attention, gqa_attention_kvmajor
from mosstts_tpu.ops.pallas.decode_attn import (
    decode_attention,
    decode_attention_q8,
)

L, B, KV, S, HD, G = 3, 4, 2, 512, 128, 2
H = KV * G


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, HD)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(L, B, KV, S, HD)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(L, B, KV, S, HD)), jnp.float32)
    valid = jnp.asarray(rng.random((B, S)) < 0.7)
    valid = valid.at[:, 0].set(True)  # every row attends something
    return q, kc, vc, valid


def _oracle(q, kc, vc, valid, li, attend):
    # einsum reference in the original (B, S, KV, hd) layout; causality is
    # carried by kv_valid alone (engines maintain that invariant)
    k_old = jnp.transpose(kc[li, :, :, :attend], (0, 2, 1, 3))
    v_old = jnp.transpose(vc[li, :, :, :attend], (0, 2, 1, 3))
    pos = jnp.full((B, 1), 10**6, jnp.int32)
    kvpos = jnp.zeros((B, attend), jnp.int32)
    return gqa_attention(
        q[:, None], k_old, v_old,
        q_positions=pos, kv_positions=kvpos, kv_valid=valid[:, :attend],
        scale=HD ** -0.5,
    )[:, 0]


@pytest.mark.parametrize("attend,block_s", [(256, 128), (512, 128), (512, 256)])
def test_decode_kernel_matches_einsum(attend, block_s):
    q, kc, vc, valid = _setup()
    for li in (0, 2):
        out = decode_attention(
            q, kc, vc, valid, jnp.int32(li),
            scale=HD ** -0.5, attend_len=attend, block_s=block_s,
            interpret=True,
        )
        ref = _oracle(q, kc, vc, valid, li, attend)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_decode_kernel_q8_close_to_exact():
    q, kc, vc, valid = _setup(1)

    def quant(c):
        amax = jnp.max(jnp.abs(c), axis=-1)
        sc = jnp.maximum(amax, 1e-8) / 127.0
        return (jnp.clip(jnp.round(c / sc[..., None]), -127, 127).astype(jnp.int8),
                sc.astype(jnp.float32))

    kq, ksc = quant(kc)
    vq, vsc = quant(vc)
    out = decode_attention_q8(
        q, kq, ksc, vq, vsc, valid, jnp.int32(1),
        scale=HD ** -0.5, attend_len=256, block_s=128, interpret=True,
    )
    ref = _oracle(q, kc, vc, valid, 1, 256)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 0.05, f"int8 KV attention error too large: {err}"


def test_kvmajor_einsum_matches_original():
    rng = np.random.default_rng(2)
    Tq = 3
    q = jnp.asarray(rng.normal(size=(B, Tq, H, HD)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, KV, HD)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, KV, HD)), jnp.float32)
    valid = jnp.asarray(rng.random((B, S)) < 0.8)
    qpos = jnp.broadcast_to(jnp.arange(100, 100 + Tq)[None], (B, Tq))
    kvpos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    a = gqa_attention(q, k, v, q_positions=qpos, kv_positions=kvpos,
                      kv_valid=valid, scale=HD ** -0.5, window=64)
    b = gqa_attention_kvmajor(
        q, jnp.transpose(k, (0, 2, 1, 3)), jnp.transpose(v, (0, 2, 1, 3)),
        q_positions=qpos, kv_positions=kvpos, kv_valid=valid,
        scale=HD ** -0.5, window=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_quant_kv_cache_close_to_bf16():
    """QuantKVCache: prefill hiddens are EXACT (fresh-kv attention; only the
    write is quantized) and decode hiddens stay close (int8 per-token/head
    absmax scales)."""
    from mosstts_tpu.core.config import Qwen3Config
    from mosstts_tpu.nn.qwen3 import (
        init_kv_cache, init_quant_kv_cache, init_qwen3_params, qwen3_forward,
    )

    cfg = Qwen3Config(hidden_size=128, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=32, vocab_size=128)
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    B, T, S = 2, 8, 32
    x = jnp.asarray(rng.normal(size=(B, T, cfg.hidden_size)) * 0.1, jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T)).astype(jnp.int32)
    kv_valid = jnp.zeros((B, S), bool).at[:, :T].set(True)

    h_ref, c_ref = qwen3_forward(
        params, cfg, x, positions=positions, kv_valid=kv_valid,
        cache=init_kv_cache(cfg, B, S, dtype=jnp.float32), cache_offset=0)
    h_q, c_q = qwen3_forward(
        params, cfg, x, positions=positions, kv_valid=kv_valid,
        cache=init_quant_kv_cache(cfg, B, S), cache_offset=0)
    np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)  # prefill is exact

    # one decode step: quant path reads the int8 cache (dequant einsum on CPU)
    x1 = jnp.asarray(rng.normal(size=(B, 1, cfg.hidden_size)) * 0.1, jnp.float32)
    pos1 = jnp.full((B, 1), T, jnp.int32)
    kv_valid = kv_valid.at[:, T].set(True)
    h1_ref, _ = qwen3_forward(params, cfg, x1, positions=pos1, kv_valid=kv_valid,
                              cache=c_ref, cache_offset=T)
    h1_q, _ = qwen3_forward(params, cfg, x1, positions=pos1, kv_valid=kv_valid,
                            cache=c_q, cache_offset=T)
    a, b = np.asarray(h1_ref).ravel(), np.asarray(h1_q).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, f"quant-cache decode diverged: cos={cos}"


def test_delay_engine_kv_quant_generates():
    from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
    from mosstts_tpu.engine.delay_engine import DelayEngine

    cfg = DelayConfig(language_config=tiny_qwen3(), n_vq=4)
    eng = DelayEngine.random_init(seed=0, config=cfg, dtype=jnp.float32,
                                  cache_bucket=64, kv_quant=True)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 200, (2, 12, cfg.channels))
    ids[..., 1:] = rng.integers(0, 1024, (2, 12, cfg.n_vq))
    ids[:, 2, 0] = cfg.im_start_token_id
    ids[:, 4, 0] = cfg.audio_start_token_id
    ids[:, -1, 0] = cfg.audio_assistant_gen_slot_token_id
    out = eng.generate(ids, np.ones((2, 12), bool), max_new_tokens=10,
                       text_temperature=0.0, audio_temperature=0.0)
    _, grid = out[0]
    assert grid.shape[1] == cfg.channels
    assert (grid[:, 1:] <= cfg.audio_pad_code).all() and (grid[:, 1:] >= 0).all()


def test_kv_quant_with_hidden_out_layers():
    """QuantKVCache composes with hidden_out_layers (per-head backbone
    source layers): the quant scan carry must thread through the
    output_hidden_states path too."""
    from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
    from mosstts_tpu.engine.delay_engine import DelayEngine

    cfg = DelayConfig(language_config=tiny_qwen3(), n_vq=4)
    hol = (0, -1, 1, -1, 2)  # 1 + n_vq entries
    eng = DelayEngine.random_init(seed=0, config=cfg, dtype=jnp.float32,
                                  cache_bucket=64, kv_quant=True,
                                  hidden_out_layers=hol)
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 200, (2, 10, cfg.channels))
    ids[:, 2, 0] = cfg.im_start_token_id
    ids[:, 4, 0] = cfg.audio_start_token_id
    ids[:, -1, 0] = cfg.audio_assistant_gen_slot_token_id
    out = eng.generate(ids, np.ones((2, 10), bool), max_new_tokens=8,
                       text_temperature=0.0, audio_temperature=0.0)
    _, grid = out[0]
    assert grid.shape[1] == cfg.channels and np.isfinite(grid).all()


def test_quant_prefill_exact_with_left_padding():
    """The quant cache's fresh-kv prefill attention must be EXACT under
    left-padding (the processors left-pad ragged batches; kv_valid carries
    the mask) — only the cache *write* is quantized."""
    from mosstts_tpu.core.config import Qwen3Config
    from mosstts_tpu.nn.qwen3 import (
        init_kv_cache, init_quant_kv_cache, init_qwen3_params, qwen3_forward,
    )

    cfg = Qwen3Config(hidden_size=128, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=32, vocab_size=128)
    params = init_qwen3_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    B, T, S = 2, 10, 32
    x = jnp.asarray(rng.normal(size=(B, T, cfg.hidden_size)) * 0.1, jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T)).astype(jnp.int32)
    # row 0 fully valid; row 1 left-padded by 4
    mask = np.ones((B, T), bool)
    mask[1, :4] = False
    kv_valid = jnp.zeros((B, S), bool).at[:, :T].set(jnp.asarray(mask))

    h_ref, _ = qwen3_forward(
        params, cfg, x, positions=positions, kv_valid=kv_valid,
        cache=init_kv_cache(cfg, B, S, dtype=jnp.float32), cache_offset=0)
    h_q, _ = qwen3_forward(
        params, cfg, x, positions=positions, kv_valid=kv_valid,
        cache=init_quant_kv_cache(cfg, B, S), cache_offset=0)
    # compare only valid positions (masked-out queries are garbage by design)
    for b in range(B):
        vp = np.nonzero(mask[b])[0]
        np.testing.assert_allclose(
            np.asarray(h_q)[b, vp], np.asarray(h_ref)[b, vp],
            rtol=1e-5, atol=1e-5)


def test_decode_kernel_q8t_matches_q8():
    """Tiled-scale q8 kernel (pre-flattened (L,B,S/bs,KV*bs) scale rows,
    zero in-kernel concat — docs/ROADMAP.md round-4 item 3) must agree
    with the row-layout q8 kernel when the tiled scales stay f32, and stay
    within bf16 rounding of it with bf16 scales."""
    from mosstts_tpu.ops.pallas.decode_attn import (
        decode_attention_q8t,
        pack_kv_scales,
        pack_valid,
    )

    q, kc, vc, valid = _setup(2)

    def quant(c):
        amax = jnp.max(jnp.abs(c), axis=-1)
        sc = jnp.maximum(amax, 1e-8) / 127.0
        return (jnp.clip(jnp.round(c / sc[..., None]), -127, 127).astype(jnp.int8),
                sc.astype(jnp.float32))

    kq, ksc = quant(kc)
    vq, vsc = quant(vc)
    ref = decode_attention_q8(
        q, kq, ksc, vq, vsc, valid, jnp.int32(1),
        scale=HD ** -0.5, attend_len=256, block_s=128, interpret=True,
    )
    for sdt, tol in ((jnp.float32, 1e-6), (jnp.bfloat16, 0.02)):
        out = decode_attention_q8t(
            q, kq, pack_kv_scales(ksc, 128, dtype=sdt),
            vq, pack_kv_scales(vsc, 128, dtype=sdt), valid, jnp.int32(1),
            scale=HD ** -0.5, attend_len=256, block_s=128, interpret=True,
        )
        err = float(jnp.max(jnp.abs(out - ref)))
        assert err < tol, f"q8t({sdt.__name__}) vs q8 error {err}"

    # pack_valid lane order must mirror pack_kv_scales
    pv = pack_valid(valid[:, :256], KV, 128)
    assert pv.shape == (B, 2, KV * 128)
    v_np = np.asarray(valid[:, :256])
    for b in (0, 1):
        for kv in range(KV):
            for t in (0, 5, 200):
                assert bool(pv[b, t // 128, kv * 128 + t % 128]) == bool(v_np[b, t])
