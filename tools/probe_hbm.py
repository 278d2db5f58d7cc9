"""Pin the chip's ACHIEVABLE HBM bandwidth independently of matmuls.

docs/PROFILE.md measured a ~280 GB/s operand-stream ceiling for every dot
formulation (XLA bf16, int8-into-dot, Pallas) on this v5e — 34% of the
nominal 819 GB/s. This probe separates "that is what dots can stream" from
"that is all the HBM can do" by timing pure-bandwidth programs:

  copy     y = x + 1          (reads N bytes, writes N bytes)
  reduce   s = sum(x)         (reads N bytes, writes ~0)
  gather   y = x[idx]         (row gather, KV-cache-shaped traffic)
  dot      the 16-GEMM int8 weight stream from probe_w8a8 for reference

If copy/reduce also land near ~300 GB/s, the ceiling is a property of
this part (tunnel-attached v5e) and the 8B decode step's 1.05x-of-
achievable argument stands. If they reach 600+, a hand-pipelined Pallas
weight-streaming kernel is the next 8B lever.

Run (TPU, solo): python tools/probe_hbm.py [--gb 2]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _sync(x):
    # axon: block_until_ready is a no-op; device_get is the only real sync
    jax.device_get(jnp.sum(x) if hasattr(x, "shape") and x.size > 16 else x)


def time_program(fn, *args, iters=8):
    out = fn(*args)
    _sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=2.0,
                    help="array size in GB (bf16 elements)")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args(argv)

    n = int(args.gb * (1 << 30) / 2)  # bf16 elements
    rows = 1 << 14
    cols = n // rows
    x = jnp.ones((rows, cols), jnp.bfloat16)
    nbytes = x.size * 2
    report = {"array_gb": round(nbytes / (1 << 30), 2),
              "device": str(jax.devices()[0])}

    copy = jax.jit(lambda a: a + 1)
    t = time_program(copy, x, iters=args.iters)
    report["copy_GBps"] = round(2 * nbytes / t / 1e9, 1)  # read + write

    red = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))
    t = time_program(red, x, iters=args.iters)
    report["reduce_GBps"] = round(nbytes / t / 1e9, 1)

    idx = jnp.asarray(np.random.default_rng(0).permutation(rows), jnp.int32)
    gather = jax.jit(lambda a, i: jnp.take(a, i, axis=0))
    t = time_program(gather, x, idx, iters=args.iters)
    report["gather_GBps"] = round(2 * nbytes / t / 1e9, 1)

    # the dot formulation PROFILE.md ships (int8 operand straight into the
    # dot): 16 stacked 4096->12288 GEMMs at batch 128
    L, D, F, B = 16, 4096, 12288, 128
    w8 = jnp.ones((L, D, F), jnp.int8)
    a = jnp.ones((B, D), jnp.bfloat16)

    def dots(acts, ws):
        # chained like tools/probe_w8a8.py (each layer feeds the next, only
        # one column kept per layer) so the measured traffic is the weight
        # stream itself — an unchained stack+sum adds ~100 MB of f32
        # output traffic and lets XLA schedule the dots independently
        h = acts
        outs = []
        for i in range(L):
            y = jnp.einsum("bd,df->bf", h, ws[i].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            outs.append(y[:, :1])
            h = jnp.tanh(y[:, : acts.shape[1]]).astype(jnp.bfloat16)
        return jnp.concatenate(outs, axis=1)

    t = time_program(jax.jit(dots), a, w8, iters=args.iters)
    report["dot_weight_stream_GBps"] = round(L * D * F / t / 1e9, 1)

    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
