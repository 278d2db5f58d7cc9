#!/usr/bin/env python
"""Benchmark — prints ONE JSON line.

Headline metric: Delay-model batched decode throughput on one chip at the
FLAGSHIP 8B scale (reference README.md:91-101 ships MossTTSDelay as 8B),
expressed as the realtime multiple (audio seconds generated per wall second;
1 frame = 1/12.5 s). BASELINE.md target: >= 20x realtime per v5e chip ->
vs_baseline is value / 20. ``--size all`` (default) also measures the
1.7B-class config and reports it in detail.sizes.

The 8B engine is built directly in the int8 serving layout
(ops.quant.random_quantized_like): a bf16 8B init (~17 GB) does not fit a
single v5e's 16 GB HBM, int8 weight-only (~8.7 GB incl. bf16 embeddings)
does.
"""
import argparse
import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"bench: {msg}", file=sys.stderr, flush=True)


def build(size: str, batch: int, prompt_len: int, use_int8: bool):
    from mosstts_tpu.core.config import DelayConfig, delay_8b, qwen3_1p7b, tiny_qwen3
    from mosstts_tpu.engine.delay_engine import DelayEngine
    from mosstts_tpu.models.delay import init_delay_params
    from mosstts_tpu.ops.quant import random_quantized_like

    if size == "tiny":
        cfg = DelayConfig(language_config=tiny_qwen3(), n_vq=8)
        engine = DelayEngine.random_init(seed=0, config=cfg, dtype=jnp.float32,
                                         cache_bucket=256)
    elif size == "1p7b":
        cfg = DelayConfig(language_config=qwen3_1p7b(), n_vq=32)
        engine = DelayEngine.random_init(seed=0, config=cfg, dtype=jnp.bfloat16,
                                         cache_bucket=256)
        if use_int8:
            engine.quantize("int8")
    elif size == "8b":
        cfg = delay_8b()
        shapes = jax.eval_shape(
            lambda k: init_delay_params(k, cfg, dtype=jnp.bfloat16),
            jax.random.PRNGKey(0),
        )
        params = random_quantized_like(shapes, seed=0)  # int8 only — bf16 OOMs
        engine = DelayEngine(params, cfg, dtype=jnp.bfloat16, cache_bucket=256)
    else:
        raise ValueError(size)

    rng = np.random.default_rng(0)
    # audio-continuation style prompt: ends in an open audio block
    ids = rng.integers(0, 1000, (batch, prompt_len, cfg.channels))
    ids[..., 1:] = rng.integers(0, 1024, (batch, prompt_len, cfg.n_vq))
    ids[:, -1, 0] = cfg.audio_assistant_gen_slot_token_id
    ids[:, 10, 0] = cfg.im_start_token_id
    ids[:, 12, 0] = cfg.audio_start_token_id
    mask = np.ones((batch, prompt_len), bool)
    return engine, ids, mask


def run_size(size: str, args) -> dict:
    from mosstts_tpu.models.delay import make_sampling

    use_int8 = (size == "8b") or (not args.bf16 and size != "tiny")
    engine, ids, mask = build(size, args.batch, args.prompt, use_int8)
    sampling = make_sampling(
        text_temperature=1.7, text_top_p=0.8,
        audio_temperature=1.7, audio_top_p=0.8, audio_repetition_penalty=1.0,
    )
    max_new = args.steps + args.warmup + 8
    cache_len = ((args.prompt + max_new + 1 + 255) // 256) * 256
    prefill = engine._get_prefill(max_new, cache_len)
    attend = ((args.prompt + max_new + 1 + 255) // 256) * 256
    step = engine._get_step(min(attend, cache_len))

    log(f"[{size}] compiling prefill...")
    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)
    t0 = time.perf_counter()
    state = prefill(engine.params, ids_j, mask_j, jax.random.PRNGKey(0), sampling)
    jax.device_get(state.is_stopping)
    prefill_compile_s = time.perf_counter() - t0
    # second call isolates steady-state prefill latency from compile time
    t0 = time.perf_counter()
    state = prefill(engine.params, ids_j, mask_j, jax.random.PRNGKey(0), sampling)
    jax.device_get(state.is_stopping)
    prefill_run_s = time.perf_counter() - t0
    log(f"[{size}] prefill compile+run {prefill_compile_s:.1f}s, "
        f"steady-state {prefill_run_s * 1000:.0f}ms; compiling step...")

    for i in range(args.warmup):
        state = step(engine.params, state, sampling)
        if i == 0:
            jax.device_get(state.is_stopping)
            log(f"[{size}] step compiled; warming up...")
    jax.device_get(state.is_stopping)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state = step(engine.params, state, sampling)
    # device_get: on the axon platform block_until_ready does NOT wait;
    # only a host transfer truly synchronizes
    jax.device_get(state.is_stopping)
    elapsed = time.perf_counter() - t0

    frames_per_sec = args.batch * args.steps / elapsed
    rtf = frames_per_sec / 12.5
    del engine, state
    gc.collect()
    return {
        "realtime_multiple": round(rtf, 3),
        "batch": args.batch,
        "prompt_len": args.prompt,
        "steps": args.steps,
        "step_ms": round(1000 * elapsed / args.steps, 2),
        "prefill_compile_s": round(prefill_compile_s, 2),
        "prefill_ms": round(1000 * prefill_run_s, 1),
        "frames_per_sec": round(frames_per_sec, 1),
        "int8": use_int8,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", choices=["tiny", "1p7b", "8b", "all"], default="all",
                    help="model scale; 'all' benches 1.7B then the 8B flagship")
    ap.add_argument("--tiny", action="store_true", help="alias for --size tiny")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--bf16", action="store_true",
                    help="disable int8 weight-only quantization for the 1.7B "
                         "config (8B is int8-only: bf16 exceeds v5e HBM)")
    args = ap.parse_args()
    size = "tiny" if args.tiny else args.size

    if size == "all":
        sizes = {}
        for s in ("1p7b", "8b"):
            try:
                sizes[s] = run_size(s, args)
            except Exception as e:  # report partial results rather than dying
                log(f"[{s}] FAILED: {type(e).__name__}: {e}")
                sizes[s] = {"error": f"{type(e).__name__}: {e}"}
        head = sizes.get("8b") if "realtime_multiple" in sizes.get("8b", {}) else sizes.get("1p7b")
        headline_size = "8b" if head is sizes.get("8b") else "1p7b"
    else:
        sizes = {size: run_size(size, args)}
        head, headline_size = sizes[size], size

    rtf = head["realtime_multiple"]
    result = {
        "metric": "delay_decode_realtime_multiple_per_chip",
        "value": rtf,
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 20.0, 3),
        "detail": {
            "headline_size": headline_size,
            "device": str(jax.devices()[0]),
            "sizes": sizes,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
