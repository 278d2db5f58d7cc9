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
