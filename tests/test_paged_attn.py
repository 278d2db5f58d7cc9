"""Paged flash-decode kernel vs the linear einsum oracle (interpret mode).

The pool layout is (L, NPAGES, KV, P, hd) with a per-row page table; these
tests scatter a linear cache into the pool under a random page permutation
and require bit-identical semantics with the linear-cache oracle, including
the trash-page contract (unallocated table entries point at page 0 and any
garbage there must be masked out by kv_valid alone).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mosstts_tpu.ops.attention import gqa_attention
from mosstts_tpu.ops.pallas.paged_attn import (
    paged_decode_attention,
    paged_decode_attention_q8,
)

L, B, KV, S, HD, G, P = 2, 3, 2, 512, 128, 2, 128
H = KV * G
MP = S // P


def _linear(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, HD)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(L, B, KV, S, HD)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(L, B, KV, S, HD)), jnp.float32)
    valid = jnp.asarray(rng.random((B, S)) < 0.7)
    valid = valid.at[:, 0].set(True)
    return rng, q, kc, vc, valid


def _paginate(rng, kc, vc, n_alloc_pages):
    """Scatter the linear (L,B,KV,S,hd) cache into a shared pool under a
    random page assignment. Page 0 is the reserved trash page, poisoned with
    a large finite value so any unmasked read through it is loud (stale pool
    contents are always finite — masked columns get probability exactly 0,
    so poison never reaches the output; NaN would, via 0*NaN). Logical pages
    beyond ``n_alloc_pages`` stay mapped to the trash page."""
    npages = 1 + B * MP
    k_pool = np.full((L, npages, KV, P, HD), 1e4, np.float32)
    v_pool = np.full((L, npages, KV, P, HD), 1e4, np.float32)
    table = np.zeros((B, MP), np.int32)
    perm = rng.permutation(np.arange(1, npages))
    nxt = 0
    for b in range(B):
        for j in range(min(n_alloc_pages, MP)):
            pg = int(perm[nxt]); nxt += 1
            table[b, j] = pg
            k_pool[:, pg] = np.asarray(kc)[:, b, :, j * P:(j + 1) * P]
            v_pool[:, pg] = np.asarray(vc)[:, b, :, j * P:(j + 1) * P]
    return jnp.asarray(k_pool), jnp.asarray(v_pool), jnp.asarray(table)


def _oracle(q, kc, vc, valid, li, attend):
    k_old = jnp.transpose(kc[li, :, :, :attend], (0, 2, 1, 3))
    v_old = jnp.transpose(vc[li, :, :, :attend], (0, 2, 1, 3))
    pos = jnp.full((B, 1), 10**6, jnp.int32)
    kvpos = jnp.zeros((B, attend), jnp.int32)
    return gqa_attention(
        q[:, None], k_old, v_old,
        q_positions=pos, kv_positions=kvpos, kv_valid=valid[:, :attend],
        scale=HD ** -0.5,
    )[:, 0]


@pytest.mark.parametrize("attend", [256, 512])
def test_paged_matches_linear_oracle(attend):
    rng, q, kc, vc, valid = _linear()
    k_pool, v_pool, table = _paginate(rng, kc, vc, MP)
    for li in (0, L - 1):
        out = paged_decode_attention(
            q, k_pool, v_pool, table, valid, jnp.int32(li),
            scale=HD ** -0.5, attend_len=attend, interpret=True)
        ref = _oracle(q, kc, vc, valid, li, attend)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_unallocated_pages_ride_trash_page():
    """Rows whose tail pages are unallocated (table→trash page 0, poisoned
    with a large value) must still produce finite, oracle-exact output as
    long as kv_valid marks those logical slots invalid."""
    rng, q, kc, vc, valid = _linear(1)
    n_alloc = 2  # only the first 2 of 4 logical pages exist
    k_pool, v_pool, table = _paginate(rng, kc, vc, n_alloc)
    valid = valid & (jnp.arange(S)[None] < n_alloc * P)
    out = paged_decode_attention(
        q, k_pool, v_pool, table, valid, jnp.int32(0),
        scale=HD ** -0.5, attend_len=S, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    ref = _oracle(q, kc, vc, valid, 0, n_alloc * P)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_paged_q8_close_to_exact():
    rng, q, kc, vc, valid = _linear(2)
    k_pool, v_pool, table = _paginate(rng, kc, vc, MP)

    def quant(pool):
        amax = jnp.max(jnp.abs(pool), axis=-1)
        sc = jnp.maximum(amax, 1e-8) / 127.0
        qv = jnp.clip(jnp.round(pool / sc[..., None]), -127, 127)
        return qv.astype(jnp.int8), sc.astype(jnp.float32)

    kq, ksc = quant(k_pool)
    vq, vsc = quant(v_pool)
    out = paged_decode_attention_q8(
        q, kq, ksc, vq, vsc, table, valid, jnp.int32(1),
        scale=HD ** -0.5, attend_len=256, interpret=True)
    ref = _oracle(q, kc, vc, valid, 1, 256)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 0.05, f"int8 paged attention error too large: {err}"
