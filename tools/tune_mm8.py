#!/usr/bin/env python
"""Tile sweep for a Pallas int8 weight-streaming GEMM.

Context (docs/PROFILE.md roofline): XLA's dot with an int8 operand sustains
only ~280 GB/s of weight stream on this chip, while the Pallas decode-
attention kernels sustain 500-670 GB/s streaming the KV cache in the SAME
serving step — the dot, not the chip, is the limiter. The 8B batch-128 step
spends ~27 of 35 ms streaming 7.7 GB of int8 weights, so closing even half
the gap nearly doubles flagship throughput.

Sweeps (TD, TO) weight-tile shapes, grid order, and accumulation strategy
for y = x @ W with W (L, D, O) int8 + per-output f32 scales, x (B, D) bf16,
walking L layers inside ONE jitted program (per-op dispatch on this remote
setup would swamp single-matmul timings).

Run (TPU, solo): python tools/tune_mm8.py --batch 128
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20, warmup=3):
    out = fn(*args)
    jax.device_get(out.ravel()[:1])
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out.ravel()[:1])
    return (time.perf_counter() - t0) / iters


def _kernel_dmajor(x_ref, w_ref, o_ref, acc, *, nd):
    """grid (o, d): accumulate over d in VMEM, write at last d (the
    per-output scale is a cheap fused multiply OUTSIDE the kernel)."""
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(
        x_ref[:], w_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(d == nd - 1)
    def _():
        o_ref[:] = acc[:]


def _kernel_w8a8(x8_ref, w_ref, o_ref, acc, *, nd):
    """W8A8 variant: activations pre-quantized per-row int8 OUTSIDE the
    kernel; the dot runs in the MXU's native int8×int8→int32 mode so the
    weight tile is never converted on the VPU (the convert, not the DMA,
    is the suspected ~280 GB/s limiter of the bf16-operand form)."""
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(
        x8_ref[:], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(d == nd - 1)
    def _():
        o_ref[:] = acc[:]


def mm8_w8a8(x, w8, scale, *, td, to, interpret=False):
    """Per-row activation quant on the VPU outside, int8 MXU dot inside,
    scales folded after: y = (x8 @ w8) * x_scale[:,None] * w_scale[None]."""
    L, D, O = w8.shape
    B = x.shape[0]
    nd = D // td

    def quant_rows(h):
        m = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=1, keepdims=True)
        s = jnp.maximum(m, 1e-8) / 127.0
        return jnp.clip(jnp.round(h.astype(jnp.float32) / s), -127,
                        127).astype(jnp.int8), s

    def run_layer(li, x8):
        return pl.pallas_call(
            functools.partial(_kernel_w8a8, nd=nd),
            grid=(O // to, nd),
            in_specs=[
                pl.BlockSpec((B, td), lambda o, d: (0, d)),
                pl.BlockSpec((1, td, to), lambda o, d, li=li: (li, d, o)),
            ],
            out_specs=pl.BlockSpec((B, to), lambda o, d: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, to), jnp.int32)],
            out_shape=jax.ShapeDtypeStruct((B, O), jnp.int32),
            interpret=interpret,
        )(x8, w8)

    @jax.jit
    def walk(x, w8, scale):
        h = x
        outs = []
        for li in range(L):
            x8, xs = quant_rows(h)
            y = run_layer(li, x8).astype(jnp.float32) * xs * scale[li]
            outs.append(y[:, :1])
            h = jnp.tanh(y[:, : x.shape[1]]).astype(jnp.bfloat16)
        return jnp.concatenate(outs, axis=1)

    return walk


def _kernel_omajor(x_ref, w_ref, o_ref):
    """Full-D variant: x stays VMEM-resident across the whole grid (1 MB at
    B=128/D=4096), the grid walks O only, one dot per step — no f32
    accumulator round trips, the weight tile is the only stream."""
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def mm8_omajor(x, w8, scale, *, to, interpret=False):
    L, D, O = w8.shape
    B = x.shape[0]

    def run_layer(li, x):
        return pl.pallas_call(
            _kernel_omajor,
            grid=(O // to,),
            in_specs=[
                pl.BlockSpec((B, D), lambda o: (0, 0)),
                pl.BlockSpec((1, D, to), lambda o, li=li: (li, 0, o)),
            ],
            out_specs=pl.BlockSpec((B, to), lambda o: (0, o)),
            out_shape=jax.ShapeDtypeStruct((B, O), jnp.float32),
            interpret=interpret,
        )(x, w8)

    @jax.jit
    def walk(x, w8, scale):
        h = x
        outs = []
        for li in range(L):
            y = run_layer(li, h) * scale[li]
            outs.append(y[:, :1])
            h = jnp.tanh(y[:, : x.shape[1]]).astype(jnp.bfloat16)
        return jnp.concatenate(outs, axis=1)

    return walk


def mm8(x, w8, scale, *, td, to, interpret=False):
    L, D, O = w8.shape
    B = x.shape[0]
    nd = D // td

    def run_layer(li, x):
        y = pl.pallas_call(
            functools.partial(_kernel_dmajor, nd=nd),
            grid=(O // to, nd),
            in_specs=[
                pl.BlockSpec((B, td), lambda o, d: (0, d)),
                pl.BlockSpec((1, td, to), lambda o, d, li=li: (li, d, o)),
            ],
            out_specs=pl.BlockSpec((B, to), lambda o, d: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, to), jnp.float32)],
            out_shape=jax.ShapeDtypeStruct((B, O), jnp.float32),
            interpret=interpret,
        )(x, w8)
        return y * scale[li]

    @jax.jit
    def walk(x, w8, scale):
        h = x
        outs = []
        for li in range(L):
            y = run_layer(li, h)
            outs.append(y[:, :1])
            h = jnp.tanh(y[:, : x.shape[1]]).astype(jnp.bfloat16)
        return jnp.concatenate(outs, axis=1)

    return walk


def xla_ref(L):
    @jax.jit
    def walk(x, w8, scale):
        h = x
        outs = []
        for li in range(L):
            y = jnp.dot(h, w8[li].astype(h.dtype),
                        preferred_element_type=jnp.float32) * scale[li]
            outs.append(y[:, :1])
            h = jnp.tanh(y[:, : x.shape[1]]).astype(jnp.bfloat16)
        return jnp.concatenate(outs, axis=1)

    return walk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--din", type=int, default=4096)
    ap.add_argument("--dout", type=int, default=12288)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    B, L, D, O = args.batch, args.layers, args.din, args.dout
    k = jax.random.PRNGKey(0)
    w8 = jax.random.randint(k, (L, D, O), -127, 128, jnp.int32).astype(jnp.int8)
    scale = jax.random.uniform(jax.random.PRNGKey(1), (L, O), jnp.float32,
                               0.001, 0.02)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, D), jnp.bfloat16)
    gb = L * D * O / 1e9

    s = timeit(xla_ref(L), x, w8, scale)
    print(f"XLA int8 dot: {s*1000:.2f} ms ({gb/s:.0f} GB/s)", flush=True)

    # numeric check on one config first
    got = mm8(x, w8, scale, td=512, to=512, interpret=args.interpret)(
        x, w8, scale)
    want = xla_ref(L)(x, w8, scale)
    import numpy as np

    err = float(jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-9))
    print(f"pallas vs xla max rel err: {err:.2e}", flush=True)

    # numeric checks for the new variants
    got = mm8_w8a8(x, w8, scale, td=512, to=512, interpret=args.interpret)(
        x, w8, scale)
    err = float(jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-9))
    print(f"w8a8 vs xla max rel err: {err:.2e} (per-row act quant noise)",
          flush=True)
    got = mm8_omajor(x, w8, scale, to=512, interpret=args.interpret)(
        x, w8, scale)
    err = float(jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-9))
    print(f"omajor vs xla max rel err: {err:.2e}", flush=True)
    if args.interpret:
        return

    best = None
    for td, to in ((512, 512), (512, 1024), (1024, 512), (1024, 1024),
                   (2048, 512), (512, 2048), (2048, 1024), (4096, 512),
                   (1024, 2048), (2048, 2048), (4096, 1024)):
        if D % td or O % to:
            continue
        vmem_mb = (2 * td * to + 2 * B * td * 2 + B * to * 4 + 2 * 4 * to) / 1e6
        if vmem_mb > 14:
            print(f"td={td} to={to}: skip (est {vmem_mb:.1f} MB VMEM)",
                  flush=True)
            continue
        for name, build in (
            ("dmajor", lambda: mm8(x, w8, scale, td=td, to=to)),
            ("w8a8", lambda: mm8_w8a8(x, w8, scale, td=td, to=to)),
            ("omajor", (lambda: mm8_omajor(x, w8, scale, to=to))
             if td == D else None),
        ):
            if build is None:
                continue
            try:
                s = timeit(build(), x, w8, scale)
                r = gb / s
                print(f"{name} td={td} to={to}: {s*1000:.2f} ms "
                      f"({r:.0f} GB/s)", flush=True)
                if best is None or r > best[3]:
                    best = (name, td, to, r)
            except Exception as e:
                print(f"{name} td={td} to={to}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
    print(f"best: {best[0]} td={best[1]} to={best[2]} {best[3]:.0f} GB/s"
          if best else "no config succeeded", flush=True)


if __name__ == "__main__":
    main()
