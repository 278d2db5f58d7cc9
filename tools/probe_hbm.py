"""Pin the chip's ACHIEVABLE HBM bandwidth independently of matmuls.

MEASUREMENT LESSON (this probe's own history): every timing window on this
tunnel-attached part carries a FIXED ~30-45 ms overhead (dispatch queue +
sync round trip). Averaging a window over N iterations leaves overhead/N
per iteration — at 8 iterations of a 3-7 ms program that's a 2-3x
understatement of bandwidth. Round 3's "~280 GB/s dot ceiling"
(docs/PROFILE.md) was exactly this artifact. This probe therefore reports
MARGINAL rates: time a window of ``lo`` iterations and one of ``hi``
iterations of the same compiled program and divide the difference —
the fixed overhead cancels.

Marginal results on this v5e (2 GB arrays, lo=10/hi=40):

  reduce   ~826 GB/s read      (the nominal 819 GB/s HBM figure)
  copy     ~648 GB/s read+write
  dot      ~609 GB/s int8 weight stream (48x 4096->12288 GEMM walk, B=128)
  gather   row-shuffle gather, KV-cache-shaped traffic

So the chip streams at spec, XLA's dot reaches ~75% of pure-read, and the
right roofline floor for the 8B decode step's 7.7 GB weight stream is
~13 ms — NOT the ~27 ms the contaminated 280 GB/s figure implied.

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


def marginal_time(fn, *args, lo=10, hi=40, warmup=3):
    """Marginal seconds/iteration between a lo- and hi-iteration window of
    the same program: the fixed window overhead (tunnel RTT + dispatch
    latency, ~30-45 ms here) cancels in the difference."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)

    def window(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0

    return (window(hi) - window(lo)) / (hi - lo)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=2.0,
                    help="array size in GB (bf16 elements)")
    ap.add_argument("--lo", type=int, default=10)
    ap.add_argument("--hi", type=int, default=40)
    args = ap.parse_args(argv)

    n = int(args.gb * (1 << 30) / 2)  # bf16 elements
    rows = 1 << 14
    cols = n // rows
    x = jnp.ones((rows, cols), jnp.bfloat16)
    nbytes = x.size * 2
    report = {"array_gb": round(nbytes / (1 << 30), 2),
              "device": str(jax.devices()[0]),
              "timing": f"marginal over {args.lo}->{args.hi} iters"}

    copy = jax.jit(lambda a: a + 1)
    t = marginal_time(copy, x, lo=args.lo, hi=args.hi)
    report["copy_GBps"] = round(2 * nbytes / t / 1e9, 1)  # read + write

    red = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))
    t = marginal_time(red, x, lo=args.lo, hi=args.hi)
    report["reduce_GBps"] = round(nbytes / t / 1e9, 1)

    idx = jnp.asarray(np.random.default_rng(0).permutation(rows), jnp.int32)
    gather = jax.jit(lambda a, i: jnp.take(a, i, axis=0))
    t = marginal_time(gather, x, idx, lo=args.lo, hi=args.hi)
    report["gather_GBps"] = round(2 * nbytes / t / 1e9, 1)

    # the serving dot formulation (int8 operand straight into the dot,
    # scale folded after): a 48-layer 4096->12288 GEMM walk at batch 128,
    # chained through tanh so XLA cannot reorder the weight stream
    L, D, F, B = 48, 4096, 12288, 128
    w8 = jnp.ones((L, D, F), jnp.int8)
    a = jnp.ones((B, D), jnp.bfloat16)

    def dots(acts, ws):
        h = acts
        outs = []
        for i in range(L):
            y = jnp.einsum("bd,df->bf", h, ws[i].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            outs.append(y[:, :1])
            h = jnp.tanh(y[:, : acts.shape[1]]).astype(jnp.bfloat16)
        return jnp.concatenate(outs, axis=1)

    t = marginal_time(jax.jit(dots), a, w8, lo=args.lo, hi=args.hi)
    report["dot_weight_stream_GBps"] = round(L * D * F / t / 1e9, 1)

    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
