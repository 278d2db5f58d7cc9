#!/usr/bin/env python
"""Probe: is int4 weight-only GEMV viable on this TPU?

The question is whether nibble-unpack (AND/shift/select/convert per int4
value) can keep up with the halved HBM stream — if unpack throughput is
below the HBM rate, int4 is compute-bound and loses to int8.

Measures a 16-layer stacked weight walk INSIDE one jitted program (isolated
single matmuls are dispatch-bound at ~40 GB/s on this remote setup and say
nothing about streaming):
  * XLA int8 dot per layer (the shipped path);
  * Pallas int8 matmul per layer;
  * Pallas int4 matmul with in-kernel unpack (D-halves packing).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, D, O, NL = 64, 4096, 12288, 16  # 8B-ish MLP shape, 16 "layers"
TD, TO = 512, 512


def timeit(fn, *args, iters=30, warmup=3):
    out = fn(*args)
    jax.device_get(out.ravel()[:1])
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out.ravel()[:1])
    return (time.perf_counter() - t0) * 1000 / iters


def _mm8_kernel(li_ref, x_ref, w_ref, o_ref, acc):
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(
        x_ref[:], w_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(d == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc[:]


def mm8_pallas(x, w8, li):
    return pl.pallas_call(
        _mm8_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(O // TO, D // TD),
            in_specs=[
                pl.BlockSpec((B, TD), lambda o, d, li: (0, d)),
                pl.BlockSpec((1, TD, TO), lambda o, d, li: (li[0], d, o)),
            ],
            out_specs=pl.BlockSpec((B, TO), lambda o, d, li: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, TO), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, O), jnp.float32),
    )(jnp.asarray(li, jnp.int32).reshape(1), x, w8)


def _mm4_kernel(li_ref, xlo_ref, xhi_ref, p_ref, o_ref, acc):
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    pk = p_ref[0].astype(jnp.int32)  # (TD, TO); low nibble W[d], high W[d+D/2]
    lo = jnp.bitwise_and(pk, 15)
    lo = lo - 16 * (lo >> 3)  # sign-extend 4-bit two's complement
    hi = jnp.bitwise_and(pk >> 4, 15)
    hi = hi - 16 * (hi >> 3)
    acc[:] += jax.lax.dot_general(
        xlo_ref[:], lo.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc[:] += jax.lax.dot_general(
        xhi_ref[:], hi.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(d == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc[:]


def mm4_pallas(xlo, xhi, packed, li):
    D2 = D // 2
    return pl.pallas_call(
        _mm4_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(O // TO, D2 // TD),
            in_specs=[
                pl.BlockSpec((B, TD), lambda o, d, li: (0, d)),
                pl.BlockSpec((B, TD), lambda o, d, li: (0, d)),
                pl.BlockSpec((1, TD, TO), lambda o, d, li: (li[0], d, o)),
            ],
            out_specs=pl.BlockSpec((B, TO), lambda o, d, li: (0, o)),
            scratch_shapes=[pltpu.VMEM((B, TO), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, O), jnp.float32),
    )(jnp.asarray(li, jnp.int32).reshape(1), xlo, xhi, packed)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D), jnp.bfloat16)
    w8 = jax.random.randint(key, (NL, D, O), -127, 127, jnp.int8)  # 800 MB
    packed = jax.random.randint(key, (NL, D // 2, O), -128, 127,
                                jnp.int32).astype(jnp.int8)  # 400 MB

    @jax.jit
    def walk_xla8(x, w8):
        def body(li, acc):
            w = jax.lax.dynamic_slice(w8, (li, 0, 0), (1, D, O))[0]
            return acc + jnp.dot(x, w.astype(x.dtype),
                                 preferred_element_type=jnp.float32)
        return jax.lax.fori_loop(0, NL, body, jnp.zeros((B, O), jnp.float32))

    @jax.jit
    def walk_p8(x, w8):
        def body(li, acc):
            return acc + mm8_pallas(x, w8, li)
        return jax.lax.fori_loop(0, NL, body, jnp.zeros((B, O), jnp.float32))

    @jax.jit
    def walk_p4(x, packed):
        xlo, xhi = x[:, : D // 2], x[:, D // 2:]
        def body(li, acc):
            return acc + mm4_pallas(xlo, xhi, packed, li)
        return jax.lax.fori_loop(0, NL, body, jnp.zeros((B, O), jnp.float32))

    gb8 = NL * D * O / 1e9
    r = {}
    r["xla_int8_ms"] = round(timeit(walk_xla8, x, w8), 3)
    try:
        r["pallas_int8_ms"] = round(timeit(walk_p8, x, w8), 3)
    except Exception as e:
        r["pallas_int8_ms"] = f"FAILED {type(e).__name__}: {str(e)[:200]}"
    try:
        r["pallas_int4_ms"] = round(timeit(walk_p4, x, packed), 3)
    except Exception as e:
        r["pallas_int4_ms"] = f"FAILED {type(e).__name__}: {str(e)[:200]}"

    print(r)
    for k, gb in (("xla_int8_ms", gb8), ("pallas_int8_ms", gb8),
                  ("pallas_int4_ms", gb8 / 2)):
        if isinstance(r.get(k), float):
            print(f"{k}: {gb:.2f} GB -> {gb / (r[k] / 1e3):.0f} GB/s")


if __name__ == "__main__":
    main()
