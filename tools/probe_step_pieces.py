"""Decompose the 8B decode step's BACKBONE time into its streams.

The corrected (donation-aware) ablation pinned the 8B batch-128 step at
~35 ms with ~34 ms inside the backbone scan (tools/profile_decode.py), while
the marginal-rate probes (tools/probe_hbm.py) show this chip streams int8
dot operands at ~609 GB/s — putting the backbone's weight stream at ~11 ms
and its q8 attention around 5-7 ms. This probe times each constituent at
EXACTLY the serving shapes (36 layers, D=4096, I=12288, 32Q/8KV heads,
B=128, attend 256, int8 weights + int8 KV):

  dots      the 7-GEMM-per-layer weight walk (q/k/v/o + swiglu), no attention
  attn      36 decode_attention_q8 kernel calls on a full-size quant cache
  kvwrite   per-layer KV quantize + cache scatter (donated, in-place)
  dots+attn the two interleaved like the real scan

All timings are MARGINAL (difference of a lo- and hi-iteration window of
one compiled program) so the fixed ~30-45 ms tunnel window overhead
cancels — the same lesson as probe_hbm.py.

Run (TPU, solo): python tools/probe_step_pieces.py [--batch 128] [--attend 256]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mosstts_tpu.ops.pallas.decode_attn import decode_attention_q8  # noqa: E402


def sync(x):
    jax.device_get(jax.tree.leaves(x)[0].ravel()[:1])


def marginal(fn, state, lo=8, hi=24, warmup=2):
    """Marginal s/iter of a chained donated step: fixed window overhead
    cancels in the hi-lo difference."""
    for _ in range(warmup):
        state = fn(state)
    sync(state)

    def window(n, st):
        t0 = time.perf_counter()
        for _ in range(n):
            st = fn(st)
        sync(st)
        return time.perf_counter() - t0, st

    tlo, state = window(lo, state)
    thi, state = window(hi, state)
    return (thi - tlo) / (hi - lo), state


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--attend", type=int, default=256)
    ap.add_argument("--layers", type=int, default=36)
    args = ap.parse_args(argv)

    L, D, I = args.layers, 4096, 12288
    H, KV, hd = 32, 8, 128
    B, S = args.batch, args.attend
    scale = hd ** -0.5

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    w8 = lambda k, shape: jax.random.randint(  # noqa: E731
        k, shape, -127, 128, jnp.int8)  # int8 directly: no int32 HBM spike
    W = {
        "wq": w8(ks[0], (L, D, H * hd)),
        "wk": w8(ks[1], (L, D, KV * hd)),
        "wv": w8(ks[2], (L, D, KV * hd)),
        "wo": w8(ks[3], (L, H * hd, D)),
        "wg": w8(ks[4], (L, D, I)),
        "wu": w8(ks[5], (L, D, I)),
        "wd": w8(ks[6], (L, I, D)),
    }
    sc = {k: jnp.full((L, 1, v.shape[-1]), 0.01, jnp.float32)
          for k, v in W.items()}
    gb = sum(v.size for v in W.values()) / 1e9
    report = {"batch": B, "attend": S, "layers": L,
              "weights_gb": round(gb, 2),
              "device": str(jax.devices()[0]), "timing": "marginal 8->24"}

    def dense8(x, w, s):
        return (jnp.dot(x, w.astype(x.dtype),
                        preferred_element_type=jnp.float32) * s).astype(x.dtype)

    def dot_layer(h, li, W, sc, attn_fn=None):
        q = dense8(h, W["wq"][li], sc["wq"][li])
        k = dense8(h, W["wk"][li], sc["wk"][li])
        v = dense8(h, W["wv"][li], sc["wv"][li])
        if attn_fn is None:
            # fold k/v in cheaply so their dots are not DCE'd
            a = q + jnp.tile(k, (1, H // KV)) + jnp.tile(v, (1, H // KV))
        else:
            a = attn_fn(q, k, v, li)
        h = h + dense8(a, W["wo"][li], sc["wo"][li])
        g = dense8(h, W["wg"][li], sc["wg"][li])
        u = dense8(h, W["wu"][li], sc["wu"][li])
        return h + dense8(jax.nn.silu(g) * u, W["wd"][li], sc["wd"][li])

    # ---- dots only (weights passed as ARGS — closing over them bakes 7 GB
    # of constants into the program and doubles HBM) ---------------------
    @jax.jit
    def dots_walk(h, W, sc):
        for li in range(L):
            h = dot_layer(h, li, W, sc)
        return jnp.tanh(h)

    h0 = jax.random.normal(ks[7], (B, D), jnp.bfloat16)
    t, _ = marginal(lambda h: dots_walk(h, W, sc), h0)
    report["dots_ms"] = round(t * 1000, 2)
    report["dots_GBps"] = round(gb / t, 0)
    print(json.dumps(report), flush=True)

    # ---- attention only ----------------------------------------------------
    kc = w8(ks[8], (L, B, KV, S, hd))
    vc = w8(ks[9], (L, B, KV, S, hd))
    ksc = jnp.full((L, B, KV, S), 0.01, jnp.float32)
    vsc = jnp.full((L, B, KV, S), 0.01, jnp.float32)
    valid = jnp.ones((B, S), jnp.bool_)
    kv_gb = (kc.size + vc.size + ksc.size * 4 + vsc.size * 4) / 1e9

    @jax.jit
    def attn_walk(q, kc, ksc, vc, vsc):
        out = q
        for li in range(L):
            out = decode_attention_q8(
                out, kc, ksc, vc, vsc, valid, jnp.int32(li),
                scale=scale, attend_len=S)
        return out

    q0 = jax.random.normal(key, (B, H, hd), jnp.bfloat16)
    t, _ = marginal(lambda q: attn_walk(q, kc, ksc, vc, vsc), q0)
    report["attn_ms"] = round(t * 1000, 2)
    report["attn_GBps"] = round(kv_gb / t, 0)
    print(json.dumps(report), flush=True)

    # ---- kv quantize + write (donated, in-place) ---------------------------
    def qblock(x):  # (B, KV, 1, hd) -> int8 + f32 scale
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1)
        s = jnp.maximum(amax, 1e-8) / 127.0
        return (jnp.clip(jnp.round(xf / s[..., None]), -127, 127)
                .astype(jnp.int8), s)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def kv_write(bufs, kv_new):
        kc, vc, ksc, vsc = bufs
        for li in range(L):
            kq, s = qblock(kv_new + li)
            kc = jax.lax.dynamic_update_slice(kc, kq[None], (li, 0, 0, 0, 0))
            ksc = jax.lax.dynamic_update_slice(ksc, s[None], (li, 0, 0, 0))
            vq, s2 = qblock(kv_new - li)
            vc = jax.lax.dynamic_update_slice(vc, vq[None], (li, 0, 0, 0, 0))
            vsc = jax.lax.dynamic_update_slice(vsc, s2[None], (li, 0, 0, 0))
        return kc, vc, ksc, vsc

    kv_new = jax.random.normal(key, (B, KV, 1, hd), jnp.bfloat16)
    t, _ = marginal(lambda bufs: kv_write(bufs, kv_new),
                    (kc, vc, ksc, vsc))
    report["kvwrite_ms"] = round(t * 1000, 2)
    print(json.dumps(report), flush=True)

    # buffers were donated away; rebuild for the composed walk
    kc = w8(ks[8], (L, B, KV, S, hd))
    vc = w8(ks[9], (L, B, KV, S, hd))
    ksc = jnp.full((L, B, KV, S), 0.01, jnp.float32)
    vsc = jnp.full((L, B, KV, S), 0.01, jnp.float32)

    # ---- dots + attention interleaved (the real scan structure) ------------
    @jax.jit
    def full_walk(h, W, sc, kc, ksc, vc, vsc):
        def attn_fn(q, k, v, li):
            a = decode_attention_q8(
                q.reshape(B, H, hd), kc, ksc, vc, vsc, valid, jnp.int32(li),
                scale=scale, attend_len=S)
            return a.reshape(B, H * hd)
        for li in range(L):
            h = dot_layer(h, li, W, sc, attn_fn=attn_fn)
        return jnp.tanh(h)

    t, _ = marginal(lambda h: full_walk(h, W, sc, kc, ksc, vc, vsc), h0)
    report["dots_plus_attn_ms"] = round(t * 1000, 2)
    report["compose_overhead_ms"] = round(
        report["dots_plus_attn_ms"] - report["dots_ms"] - report["attn_ms"], 2)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
