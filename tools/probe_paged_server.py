"""TPU probe: where does the paged DelayBatchServer spend its time vs the
linear one?  Separates (a) admission cost (prefill + row insert), (b)
steady-state decode step cost, for both servers at the bench shape
(1.7B int8, 16 slots, kv_int8).  All timings tunnel-synced via device_get.

Usage: python tools/probe_paged_server.py [--slots 16] [--steps 40]
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


def build(paged: bool, slots: int, params, cfg, sampling):
    return DelayBatchServer(
        params, cfg, slots=slots, cache_len=1024, out_capacity=256,
        prompt_bucket=32, dtype=jnp.bfloat16, sampling=sampling,
        kv_quant=True, paged=paged, page_size=128,
    )


def sync(server):
    jax.device_get(server.state.pos)


def probe(name: str, server, prompts, steps: int):
    # warmup: one admission + a few steps compiles prefill/insert/step
    server.submit(prompts[0], max_new_tokens=8)
    server.run(max_steps=30)
    sync(server)

    # admission cost (includes per-row insert program compiles — report
    # first-fill separately from a second fill on the SAME rows)
    for rep in range(2):
        t0 = time.perf_counter()
        for g in prompts[: server.slots]:
            server.submit(g, max_new_tokens=steps + 8)
        server.step()
        sync(server)
        t_admit = time.perf_counter() - t0
        tag = "first(+compiles)" if rep == 0 else "warm"
        print(f"{name}: fill {server.slots} slots {tag}: "
              f"{t_admit * 1e3:8.1f} ms", flush=True)
        if rep == 0:
            # drain so the same rows free up -> second fill is compile-free
            while server._active:
                server.step(poll=True)
            sync(server)

    # steady state: all slots busy, no admissions, no polls
    t0 = time.perf_counter()
    for _ in range(steps):
        server.step(poll=False)
    sync(server)
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name}: steady decode step: {dt:8.2f} ms/step", flush=True)
    while server._active:
        server.step(poll=True)
    sync(server)
    return dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--steps", type=int, default=40)
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
    for _ in range(args.slots):
        T = int(rng.integers(48, 96))
        g = rng.integers(0, 1000, (T, cfg.channels))
        g[..., 1:] = rng.integers(0, 1024, (T, cfg.n_vq))
        g[-1, 0] = cfg.audio_assistant_gen_slot_token_id
        prompts.append(g)

    print(f"device={jax.devices()[0]} slots={args.slots}", flush=True)
    lin = probe("linear", build(False, args.slots, params, cfg, sampling),
                prompts, args.steps)
    pag = probe("paged ", build(True, args.slots, params, cfg, sampling),
                prompts, args.steps)
    print(f"paged/linear steady step ratio: {pag / lin:.3f}", flush=True)


if __name__ == "__main__":
    main()
