#!/usr/bin/env python
"""Probe: W8A16 (current int8-weight serving dot) vs W8A8 on the 8B decode
shapes.

docs/PROFILE.md's int4 probe measured XLA's int8-weight x bf16-activation
dot at ~300 GB/s effective weight stream — ~1/3 of v5e HBM peak — which is
exactly why the 8B batch-128 backbone step sits at ~30 ms. Hypothesis: the
dequant-to-bf16 in front of the MXU is the limiter, and an int8 x int8 dot
(per-row dynamic activation scales, int32 accumulate — the MXU's native
int8 mode) streams the same weights at full speed.

Walks L stacked (din -> dout) GEMMs at serving batch inside ONE jitted
program per variant (mirrors tools/probe_int4.py methodology; sync via
device_get — block_until_ready is a no-op on axon).

Run (TPU, solo): python tools/probe_w8a8.py --batch 128
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][0, 0])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--din", type=int, default=4096)
    ap.add_argument("--dout", type=int, default=12288)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    B, L, DIN, DOUT = args.batch, args.layers, args.din, args.dout
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)

    wq = jax.random.randint(k1, (L, DIN, DOUT), -127, 128, jnp.int32).astype(jnp.int8)
    wscale = jax.random.uniform(k2, (L, DOUT), jnp.float32, 0.001, 0.02)
    x0 = jax.random.normal(k3, (B, DIN), jnp.bfloat16)

    gb = L * DIN * DOUT / 1e9

    @jax.jit
    def w8a16(x, wq, wscale):
        """Current serving path (ops.basic.dense on QuantWeight): dequant
        int8 -> bf16 then bf16 MXU dot."""
        h = x
        for i in range(L):
            w = wq[i].astype(jnp.bfloat16) * wscale[i].astype(jnp.bfloat16)[None, :]
            y = jax.lax.dot(h, w)
            h = jnp.tanh(y[:, :DIN])  # keep shapes closed; cheap VPU
        return h

    @jax.jit
    def w8a16_scale_after(x, wq, wscale):
        """Dequant-free stream: int8 weights cast to bf16 IN the dot (XLA
        mixed dot), scale applied to the f32 result."""
        h = x
        for i in range(L):
            y = jax.lax.dot_general(
                h, wq[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * wscale[i][None, :]
            h = jnp.tanh(y[:, :DIN]).astype(jnp.bfloat16)
        return h

    @jax.jit
    def w8a8(x, wq, wscale):
        """int8 x int8 -> int32 MXU dot with per-row dynamic activation
        quantization; result scaled by row_scale x col_scale."""
        h = x
        for i in range(L):
            amax = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=1, keepdims=True)
            ascale = jnp.maximum(amax / 127.0, 1e-8)
            hq = jnp.clip(jnp.round(h.astype(jnp.float32) / ascale), -127, 127
                          ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                hq, wq[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * ascale * wscale[i][None, :]
            h = jnp.tanh(y[:, :DIN]).astype(jnp.bfloat16)
        return h

    @jax.jit
    def dense_exact(x, wq, wscale):
        """EXACTLY ops.basic.dense's quant path: jnp.dot with the int8
        operand astype'd to the activation dtype inside the dot, scale on
        the f32 result."""
        h = x
        for i in range(L):
            y = jnp.dot(h, wq[i].astype(h.dtype),
                        preferred_element_type=jnp.float32) * wscale[i]
            h = jnp.tanh(y[:, :DIN]).astype(jnp.bfloat16)
        return h

    wbf = (wq.astype(jnp.bfloat16)
           * wscale[:, None, :].astype(jnp.bfloat16))  # bf16 master copy

    @jax.jit
    def w16a16(x, wbf):
        """bf16 weights: 2x the bytes but no conversion in the operand
        stream — the HBM-bandwidth ceiling reference."""
        h = x
        for i in range(L):
            y = jax.lax.dot(h, wbf[i])
            h = jnp.tanh(y[:, :DIN])
        return h

    results = {}
    s = bench(w16a16, (x0, wbf), args.iters)
    results["w16a16_bf16"] = {"ms": round(s * 1000, 2),
                              "eff_GBps": round(2 * gb / s, 0)}
    print(f"w16a16_bf16: {s*1000:.2f} ms  ({2*gb/s:.0f} GB/s bf16 weight "
          f"stream)", flush=True)
    for name, fn in (("w8a16_dequant", w8a16),
                     ("w8a16_mixed_dot", w8a16_scale_after),
                     ("dense_exact", dense_exact),
                     ("w8a8_int32_acc", w8a8)):
        try:
            s = bench(fn, (x0, wq, wscale), args.iters)
            results[name] = {"ms": round(s * 1000, 2),
                             "eff_GBps": round(gb / s, 0)}
            print(f"{name}: {s*1000:.2f} ms  ({gb/s:.0f} GB/s weight stream)",
                  flush=True)
        except Exception as e:
            results[name] = {"error": str(e)}
            print(f"{name}: FAILED {e}", flush=True)

    # numeric sanity: w8a8 vs dequant reference on one layer
    ref = (x0.astype(jnp.float32) @ (wq[0].astype(jnp.float32)
                                     * wscale[0][None, :]))
    amax = jnp.max(jnp.abs(x0.astype(jnp.float32)), axis=1, keepdims=True)
    ascale = jnp.maximum(amax / 127.0, 1e-8)
    hq = jnp.clip(jnp.round(x0.astype(jnp.float32) / ascale), -127, 127
                  ).astype(jnp.int8)
    acc = jax.lax.dot_general(hq, wq[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    got = acc.astype(jnp.float32) * ascale * wscale[0][None, :]
    ref_n, got_n = np.asarray(ref), np.asarray(got)
    cos = float((ref_n * got_n).sum()
                / (np.linalg.norm(ref_n) * np.linalg.norm(got_n) + 1e-9))
    print(f"w8a8 vs f32-dequant cosine: {cos:.6f}", flush=True)
    print(results)


if __name__ == "__main__":
    main()
