"""Ring attention (parallel/ring_attn.py) vs the single-device einsum
oracle (ops/attention.gqa_attention) on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mosstts_tpu.ops.attention import gqa_attention
from mosstts_tpu.parallel.mesh import make_mesh
from mosstts_tpu.parallel.ring_attn import ring_gqa_attention


def _case(B=2, T=64, H=4, KV=2, hd=16, seed=0, left_pad=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, KV, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, KV, hd)), jnp.float32)
    # left-padded rows: positions count from the first valid slot, pads
    # are invalid (matches the engines' left-pad batching)
    valid = np.ones((B, T), bool)
    pos = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T)).copy()
    if left_pad:
        valid[0, :left_pad] = False
        pos[0] = np.concatenate([
            np.zeros(left_pad, np.int32),
            np.arange(T - left_pad, dtype=np.int32)])
    return q, k, v, jnp.asarray(pos), jnp.asarray(valid)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_ring_matches_full_attention(mesh_shape):
    mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    q, k, v, pos, valid = _case()
    scale = q.shape[-1] ** -0.5
    ref = gqa_attention(q, k, v, q_positions=pos, kv_positions=pos,
                        kv_valid=valid, scale=scale)
    out = ring_gqa_attention(mesh, q, k, v, q_positions=pos,
                             kv_positions=pos, kv_valid=valid, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_left_padding_and_window():
    mesh = make_mesh(data=1, model=8)
    q, k, v, pos, valid = _case(left_pad=13, seed=1)
    scale = q.shape[-1] ** -0.5
    for window in (None, 16):
        ref = gqa_attention(q, k, v, q_positions=pos, kv_positions=pos,
                            kv_valid=valid, scale=scale, window=window)
        out = ring_gqa_attention(mesh, q, k, v, q_positions=pos,
                                 kv_positions=pos, kv_valid=valid,
                                 scale=scale, window=window)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_ring_under_jit_compiles_collectives():
    mesh = make_mesh(data=1, model=8)
    q, k, v, pos, valid = _case(T=128, seed=2)
    scale = q.shape[-1] ** -0.5
    fn = jax.jit(lambda q, k, v: ring_gqa_attention(
        mesh, q, k, v, q_positions=pos, kv_positions=pos, kv_valid=valid,
        scale=scale))
    txt = fn.lower(q, k, v).compile().as_text()
    assert "collective-permute" in txt  # the ring really uses ppermute
    ref = gqa_attention(q, k, v, q_positions=pos, kv_positions=pos,
                        kv_valid=valid, scale=scale)
    np.testing.assert_allclose(np.asarray(fn(q, k, v)), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_rejects_indivisible_T():
    mesh = make_mesh(data=1, model=8)
    q, k, v, pos, valid = _case(T=60)
    with pytest.raises(ValueError):
        ring_gqa_attention(mesh, q, k, v, q_positions=pos,
                           kv_positions=pos, kv_valid=valid, scale=0.25)


def test_ring_zigzag_layout_matches():
    """The striped ("zig-zag") layout — stripe i paired with stripe 2n-1-i
    per device to even out causal load — must be numerically identical to
    the contiguous layout and the oracle (positions/validity ride with the
    blocks, so the ring body is layout-oblivious). Left-pad + window
    included."""
    mesh = make_mesh(data=1, model=8)
    for seed, left_pad, window in ((3, 0, None), (4, 13, None), (5, 13, 16)):
        q, k, v, pos, valid = _case(T=128, seed=seed, left_pad=left_pad)
        scale = q.shape[-1] ** -0.5
        ref = gqa_attention(q, k, v, q_positions=pos, kv_positions=pos,
                            kv_valid=valid, scale=scale, window=window)
        out = ring_gqa_attention(mesh, q, k, v, q_positions=pos,
                                 kv_positions=pos, kv_valid=valid,
                                 scale=scale, window=window, layout="zigzag")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    with pytest.raises(ValueError):  # T=64: 64 % (2*8) == 0 is fine; T=72 not
        q, k, v, pos, valid = _case(T=72)
        ring_gqa_attention(mesh, q, k, v, q_positions=pos, kv_positions=pos,
                           kv_valid=valid, scale=0.25, layout="zigzag")


def test_zigzag_order_balances_causal_work():
    """Static check of the point of the layout: a device's total causal
    work is sum(q_pos + 1) over the q positions it holds. Zigzag makes
    that EQUAL across devices (stripe d pairs with stripe 2n-1-d); the
    contiguous layout's is strictly increasing, last device doing ~2x the
    mean."""
    from mosstts_tpu.parallel.ring_attn import zigzag_order

    n, T = 8, 128
    order = zigzag_order(T, n)
    assert sorted(order.tolist()) == list(range(T))
    zig = (order.reshape(n, T // n) + 1).sum(axis=1)
    contig = (np.arange(T).reshape(n, T // n) + 1).sum(axis=1)
    assert len(set(zig.tolist())) == 1, zig  # perfectly balanced
    assert (np.diff(contig) > 0).all()  # the imbalance it removes
    assert contig.max() / contig.mean() > 1.8  # last device ~2x the mean


def test_ring_fully_masked_rows_return_zero():
    """A query row with ZERO valid keys (e.g. a padded row whose position
    precedes every valid key) must return exactly 0, not ~mean(v)
    accumulated through p=exp(0)=1 on never-updated max rows (ADVICE r3)."""
    mesh = make_mesh(data=1, model=8)
    q, k, v, pos, valid = _case(B=2, T=64, seed=3)
    # row 0: no valid keys at all; row 1 untouched
    valid = valid.at[0].set(False)
    scale = q.shape[-1] ** -0.5
    out = ring_gqa_attention(mesh, q, k, v, q_positions=pos,
                             kv_positions=pos, kv_valid=valid, scale=scale)
    np.testing.assert_array_equal(np.asarray(out[0]),
                                  np.zeros_like(np.asarray(out[0])))
    ref = gqa_attention(q, k, v, q_positions=pos, kv_positions=pos,
                        kv_valid=valid, scale=scale)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               atol=2e-5, rtol=2e-5)
