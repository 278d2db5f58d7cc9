"""TPU probe: paged flash-decode kernel vs the linear-gather XLA oracle at
the 1.7B serving shape. Catches Mosaic compile errors and numeric drift
cheaply before the full --batch-server --paged bench; prints per-variant
timings (tunnel-synced via device_get, jax.block_until_ready is a no-op on
axon — see docs/PROFILE.md).

Usage:  python tools/probe_paged_attn.py [--attend 512] [--batch 16]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mosstts_tpu.ops.pallas.paged_attn import (  # noqa: E402
    paged_decode_attention,
    paged_decode_attention_q8,
)
from mosstts_tpu.ops.pallas.decode_attn import (  # noqa: E402
    decode_attention,
    decode_attention_q8,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--attend", type=int, default=512)
    ap.add_argument("--layers", type=int, default=8,
                    help="pool layers; 8 keeps the tunnel transfer small "
                         "while proving the indexing (per-layer timing is "
                         "layer-count independent)")
    ap.add_argument("--page", type=int, default=128)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args(argv)

    B, KV, G, HD, P = args.batch, 8, 2, 128, args.page
    H, L, S = KV * G, args.layers, args.attend
    MP = S // P
    rng = np.random.default_rng(0)

    q = jnp.asarray(rng.normal(size=(B, H, HD)), jnp.bfloat16)
    # linear cache for the reference kernel
    k_lin = jnp.asarray(rng.normal(size=(L, B, KV, S, HD)), jnp.bfloat16)
    v_lin = jnp.asarray(rng.normal(size=(L, B, KV, S, HD)), jnp.bfloat16)
    valid = jnp.asarray(rng.random((B, S)) < 0.9).at[:, 0].set(True)

    # scatter into a pool under a random page permutation
    npages = 1 + B * MP
    perm = rng.permutation(np.arange(1, npages))
    table = np.zeros((B, MP), np.int32)
    k_pool = np.zeros((L, npages, KV, P, HD), np.float32)
    v_pool = np.zeros((L, npages, KV, P, HD), np.float32)
    nxt = 0
    k_np, v_np = np.asarray(k_lin, np.float32), np.asarray(v_lin, np.float32)
    for b in range(B):
        for j in range(MP):
            pg = int(perm[nxt]); nxt += 1
            table[b, j] = pg
            k_pool[:, pg] = k_np[:, b, :, j * P:(j + 1) * P]
            v_pool[:, pg] = v_np[:, b, :, j * P:(j + 1) * P]
    k_pool = jnp.asarray(k_pool, jnp.bfloat16)
    v_pool = jnp.asarray(v_pool, jnp.bfloat16)
    table = jnp.asarray(table)
    li = jnp.int32(L // 2)
    scale = HD ** -0.5

    print(f"device={jax.devices()[0]} B={B} L={L} S={S} P={P}", flush=True)

    def timeit(name, fn, *a, **kw):
        print(f"[compile] {name}", flush=True)
        out = fn(*a, **kw)
        jax.device_get(out)  # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a, **kw)
        jax.device_get(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:28s} {dt:7.3f} ms/layer-call", flush=True)
        return out

    ref = timeit("linear decode_attention", decode_attention,
                 q, k_lin, v_lin, valid, li, scale=scale, attend_len=S)
    out = timeit("paged_decode_attention", paged_decode_attention,
                 q, k_pool, v_pool, table, valid, li, scale=scale, attend_len=S)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"bf16 paged vs linear max-abs err: {err:.4f}", flush=True)
    assert err < 0.05, err

    # int8 variants
    def quant(pool):
        pf = pool.astype(jnp.float32)
        amax = jnp.max(jnp.abs(pf), axis=-1)
        sc = jnp.maximum(amax, 1e-8) / 127.0
        return (jnp.clip(jnp.round(pf / sc[..., None]), -127, 127)
                .astype(jnp.int8), sc.astype(jnp.float32))

    kq_l, ks_l = quant(k_lin)  # (L,B,KV,S,hd)
    vq_l, vs_l = quant(v_lin)
    kq_p, ks_p = quant(k_pool)
    vq_p, vs_p = quant(v_pool)

    ref8 = timeit("linear decode_attention_q8", decode_attention_q8,
                  q, kq_l, ks_l, vq_l, vs_l, valid, li,
                  scale=scale, attend_len=S)
    out8 = timeit("paged_decode_attention_q8", paged_decode_attention_q8,
                  q, kq_p, ks_p, vq_p, vs_p, table, valid, li,
                  scale=scale, attend_len=S)
    err8 = float(jnp.max(jnp.abs(out8.astype(jnp.float32) - ref8.astype(jnp.float32))))
    print(f"q8 paged vs linear max-abs err: {err8:.4f}", flush=True)
    assert err8 < 0.08, err8
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main()
