"""Replicate the bench --batch-server load with per-step wall timing to
find where the paged run loses vs linear (mid-run compiles, admissions,
polls).  Prints the 10 slowest steps per server and a wall breakdown.

Usage: python tools/probe_paged_bench_trace.py [--which both|linear|paged]
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

from mosstts_tpu.core.config import DelayConfig, qwen3_1p7b  # noqa: E402
from mosstts_tpu.engine.batch_server import DelayBatchServer  # noqa: E402
from mosstts_tpu.models.delay import init_delay_params, make_sampling  # noqa: E402
from mosstts_tpu.ops.quant import random_quantized_like  # noqa: E402


def run_one(paged: bool, params, cfg, sampling, prompts, max_news):
    name = "paged" if paged else "linear"
    server = DelayBatchServer(
        params, cfg, slots=16, cache_len=1024, out_capacity=256,
        prompt_bucket=32, dtype=jnp.bfloat16, sampling=sampling,
        kv_quant=True, paged=paged, page_size=128,
    )
    server.warmup(prompt_lens=(64, 96), attend_upto=256)

    for g, mn in zip(prompts, max_news):
        server.submit(g, max_new_tokens=mn)
    t0 = time.perf_counter()
    times = []
    frames = 0
    for i in range(100000):
        s0 = time.perf_counter()
        done = server.step()
        dt = time.perf_counter() - s0
        times.append((dt, i, len(server._active), len(server._queue)))
        frames += sum(c.steps for c in done)
        if not server._active and not server._queue:
            break
    wall = time.perf_counter() - t0
    times.sort(reverse=True)
    print(f"\n{name}: wall={wall:.1f}s steps={len(times)} "
          f"frames={frames} fps={frames / wall:.1f}", flush=True)
    top = times[:10]
    print(f"{name}: 10 slowest steps (dt_s, step#, active, queued):")
    for t in top:
        print(f"   {t[0]:8.3f}  #{t[1]:<5d} act={t[2]:<3d} q={t[3]}")
    rest = sum(t[0] for t in times[10:])
    print(f"{name}: top-10 sum={sum(t[0] for t in top):.1f}s, "
          f"remaining {len(times) - 10} steps sum={rest:.1f}s", flush=True)
    return wall


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", choices=["both", "linear", "paged"],
                    default="both")
    args = ap.parse_args(argv)

    cfg = DelayConfig(language_config=qwen3_1p7b(), n_vq=32)
    shapes = jax.eval_shape(
        lambda k: init_delay_params(k, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    params = random_quantized_like(shapes, seed=0)
    sampling = make_sampling(text_temperature=1.7, audio_temperature=1.7,
                             audio_top_p=0.8)
    rng = np.random.default_rng(0)
    prompts = []
    for _ in range(48):
        T = int(rng.integers(48, 96))
        g = rng.integers(0, 1000, (T, cfg.channels))
        g[..., 1:] = rng.integers(0, 1024, (T, cfg.n_vq))
        g[-1, 0] = cfg.audio_assistant_gen_slot_token_id
        prompts.append(g)
    max_news = [int(x) for x in rng.integers(32, 64, 48)]

    print(f"device={jax.devices()[0]}", flush=True)
    if args.which in ("both", "linear"):
        run_one(False, params, cfg, sampling, prompts, max_news)
    if args.which in ("both", "paged"):
        run_one(True, params, cfg, sampling, prompts, max_news)


if __name__ == "__main__":
    main()
