#!/usr/bin/env python
"""Microbench: decode-attention variants at serving shapes (TPU, solo).

Compares, per full 28-layer step (fori_loop over layers, like the real
backbone scan):
  * einsum  — dynamic_slice(layer) + gqa_attention_kvmajor over bf16 cache
  * kernel  — Pallas flash-decode (decode_attention) over bf16 cache
  * q8      — Pallas flash-decode over int8 cache + per-token scales

Pipelined timing (enqueue N, sync once) against the ~34 ms tunnel floor.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mosstts_tpu.ops.attention import gqa_attention_kvmajor
from mosstts_tpu.ops.pallas.decode_attn import (
    decode_attention,
    decode_attention_q8,
    decode_attention_q8t,
    pack_kv_scales,
)

L, B, KV, G, HD = 28, 64, 8, 2, 128
H = KV * G
SCALE = HD ** -0.5


MARGINAL = False


def _window_ms(fn, args, iters):
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out.ravel()[:1])
    return (time.perf_counter() - t0) * 1000


def timeit(fn, *args, iters=30, warmup=2):
    out = fn(*args)
    jax.device_get(out.ravel()[:1])
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(out.ravel()[:1])
    if MARGINAL:
        # two windows, divided difference: cancels the fixed ~30-45 ms
        # enqueue->sync tunnel overhead that swamps sub-ms B=1 steps when
        # amortized over one window (CLAUDE.md timing rule)
        lo = _window_ms(fn, args, iters)
        hi = _window_ms(fn, args, iters * 3)
        return (hi - lo) / (iters * 2)
    return _window_ms(fn, args, iters) / iters


def main():
    global B
    ap = argparse.ArgumentParser()
    ap.add_argument("--attends", type=int, nargs="+", default=[256, 1024, 2048])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=B,
                    help="batch rows; --batch 1 measures the single-stream "
                         "realtime shape (the _decode_ok B>=8 gate question)")
    ap.add_argument("--marginal", action="store_true",
                    help="two-window divided-difference timing (needed at "
                         "B=1 where the tunnel sync floor swamps the step)")
    args = ap.parse_args()
    B = args.batch
    global MARGINAL
    MARGINAL = args.marginal

    report = {"shape": f"L{L} B{B} KV{KV} G{G} hd{HD}",
              "device": str(jax.devices()[0])}

    for attend in args.attends:
        S = attend
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, H, HD), jnp.bfloat16)
        valid = jnp.ones((B, S), jnp.bool_)
        row = {}

        kv_bytes_bf16 = L * B * KV * S * HD * 2 * 2
        row["kv_GB_bf16"] = round(kv_bytes_bf16 / 1e9, 2)

        # --- einsum over bf16 cache ---------------------------------------
        try:
            kc = jax.random.normal(key, (L, B, KV, S, HD), jnp.bfloat16)
            vc = kc + 0  # distinct buffer: aliasing would halve real HBM reads

            @jax.jit
            def einsum_step(q, kc, vc, valid):
                def body(li, acc):
                    k_all = jax.lax.dynamic_slice(
                        kc, (li, 0, 0, 0, 0), (1, B, KV, S, HD))[0]
                    v_all = jax.lax.dynamic_slice(
                        vc, (li, 0, 0, 0, 0), (1, B, KV, S, HD))[0]
                    a = gqa_attention_kvmajor(
                        q[:, None], k_all, v_all,
                        q_positions=jnp.full((B, 1), S, jnp.int32),
                        kv_positions=jnp.zeros((B, S), jnp.int32),
                        kv_valid=valid, scale=SCALE)[:, 0]
                    return acc + a.astype(jnp.float32)
                return jax.lax.fori_loop(0, L, body, jnp.zeros((B, H, HD), jnp.float32))

            row["einsum_ms"] = round(timeit(einsum_step, q, kc, vc, valid,
                                            iters=args.iters), 3)
        except Exception as e:
            row["einsum_ms"] = f"FAILED {type(e).__name__}"

        # --- Pallas kernel over bf16 cache --------------------------------
        try:
            @jax.jit
            def kernel_step(q, kc, vc, valid):
                def body(li, acc):
                    a = decode_attention(q, kc, vc, valid, li,
                                         scale=SCALE, attend_len=S)
                    return acc + a.astype(jnp.float32)
                return jax.lax.fori_loop(0, L, body, jnp.zeros((B, H, HD), jnp.float32))

            row["kernel_ms"] = round(timeit(kernel_step, q, kc, vc, valid,
                                            iters=args.iters), 3)
            del kc, vc
        except Exception as e:
            row["kernel_ms"] = f"FAILED {type(e).__name__}"

        # --- einsum over int8 cache (dequant fused by XLA?) ----------------
        try:
            kq = jax.random.randint(key, (L, B, KV, S, HD), -127, 127, jnp.int8)
            vq = kq + 0
            ks = jnp.full((L, B, KV, S), 0.01, jnp.float32)
            vs = ks + 0

            @jax.jit
            def einsum_q8_step(q, kq, ks, vq, vs, valid):
                def body(li, acc):
                    k_all = jax.lax.dynamic_slice(
                        kq, (li, 0, 0, 0, 0), (1, B, KV, S, HD))[0]
                    v_all = jax.lax.dynamic_slice(
                        vq, (li, 0, 0, 0, 0), (1, B, KV, S, HD))[0]
                    k_sc = jax.lax.dynamic_slice(ks, (li, 0, 0, 0), (1, B, KV, S))[0]
                    v_sc = jax.lax.dynamic_slice(vs, (li, 0, 0, 0), (1, B, KV, S))[0]
                    k_all = k_all.astype(jnp.float32) * k_sc[..., None]
                    v_all = v_all.astype(jnp.float32) * v_sc[..., None]
                    a = gqa_attention_kvmajor(
                        q[:, None], k_all, v_all,
                        q_positions=jnp.full((B, 1), S, jnp.int32),
                        kv_positions=jnp.zeros((B, S), jnp.int32),
                        kv_valid=valid, scale=SCALE)[:, 0]
                    return acc + a.astype(jnp.float32)
                return jax.lax.fori_loop(0, L, body, jnp.zeros((B, H, HD), jnp.float32))

            row["einsum_q8_ms"] = round(timeit(einsum_q8_step, q, kq, ks, vq, vs,
                                               valid, iters=args.iters), 3)
            del kq, vq, ks, vs
        except Exception as e:
            row["einsum_q8_ms"] = f"FAILED {type(e).__name__}"

        # --- Pallas kernel over int8 cache ---------------------------------
        try:
            kq = jax.random.randint(key, (L, B, KV, S, HD), -127, 127, jnp.int8)
            vq = kq + 0
            ks = jnp.full((L, B, KV, S), 0.01, jnp.float32)
            vs = ks + 0

            @jax.jit
            def q8_step(q, kq, ks, vq, vs, valid):
                def body(li, acc):
                    a = decode_attention_q8(q, kq, ks, vq, vs, valid, li,
                                            scale=SCALE, attend_len=S)
                    return acc + a.astype(jnp.float32)
                return jax.lax.fori_loop(0, L, body, jnp.zeros((B, H, HD), jnp.float32))

            row["q8_ms"] = round(timeit(q8_step, q, kq, ks, vq, vs, valid,
                                        iters=args.iters), 3)
        except Exception as e:
            row["q8_ms"] = f"FAILED {type(e).__name__}"

        # --- Pallas q8 with TILED bf16 scale rows (zero in-kernel concat) --
        try:
            kst = pack_kv_scales(ks, 256, dtype=jnp.bfloat16)
            vst = pack_kv_scales(vs, 256, dtype=jnp.bfloat16)

            @jax.jit
            def q8t_step(q, kq, kst, vq, vst, valid):
                def body(li, acc):
                    a = decode_attention_q8t(q, kq, kst, vq, vst, valid, li,
                                             scale=SCALE, attend_len=S)
                    return acc + a.astype(jnp.float32)
                return jax.lax.fori_loop(0, L, body, jnp.zeros((B, H, HD), jnp.float32))

            row["q8t_bf16scale_ms"] = round(
                timeit(q8t_step, q, kq, kst, vq, vst, valid,
                       iters=args.iters), 3)
            del kst, vst
        except Exception as e:
            row["q8t_bf16scale_ms"] = f"FAILED {type(e).__name__}: {e}"
        try:
            del kq, vq, ks, vs
        except NameError:
            pass

        if isinstance(row.get("einsum_ms"), float):
            row["einsum_GBps"] = round(kv_bytes_bf16 / (row["einsum_ms"] / 1e3) / 1e9, 1)
        if isinstance(row.get("kernel_ms"), float):
            row["kernel_GBps"] = round(kv_bytes_bf16 / (row["kernel_ms"] / 1e3) / 1e9, 1)
        report[str(attend)] = row
        print(f"attend {attend}: {row}", file=sys.stderr, flush=True)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
