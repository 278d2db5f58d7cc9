#!/usr/bin/env python
"""Benchmark — prints ONE JSON line.

Metric: Delay-model batched decode throughput on one chip, expressed as the
realtime multiple (audio seconds generated per wall second; 1 frame =
1/12.5 s). BASELINE.md target: >= 20x realtime per v5e chip -> vs_baseline
is value / 20.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np


def build(tiny: bool, batch: int, prompt_len: int):
    from mosstts_tpu.core.config import DelayConfig, Qwen3Config, tiny_qwen3
    from mosstts_tpu.engine.delay_engine import DelayEngine

    if tiny:
        cfg = DelayConfig(language_config=tiny_qwen3(), n_vq=8)
        dtype = jnp.float32
    else:
        # Qwen3-1.7B-class backbone (flagship Local/Realtime scale; the 8B
        # Delay checkpoint needs TP over a pod slice)
        cfg = DelayConfig(
            language_config=Qwen3Config(
                vocab_size=151936, hidden_size=2048, intermediate_size=6144,
                num_hidden_layers=28, num_attention_heads=16,
                num_key_value_heads=8, head_dim=128,
            ),
            n_vq=32,
        )
        dtype = jnp.bfloat16

    engine = DelayEngine.random_init(seed=0, config=cfg, dtype=dtype, cache_bucket=256)
    rng = np.random.default_rng(0)
    # audio-continuation style prompt: ends in an open audio block
    ids = rng.integers(0, 1000, (batch, prompt_len, cfg.channels))
    ids[..., 1:] = rng.integers(0, 1024, (batch, prompt_len, cfg.n_vq))
    ids[:, -1, 0] = cfg.audio_assistant_gen_slot_token_id
    ids[:, 10, 0] = cfg.im_start_token_id
    ids[:, 12, 0] = cfg.audio_start_token_id
    mask = np.ones((batch, prompt_len), bool)
    return engine, ids, mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="small config (CPU smoke)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--bf16", action="store_true", help="disable int8 weight-only quantization (default on: production serving config, greedy-argmax stable)")
    args = ap.parse_args()

    from mosstts_tpu.models.delay import make_sampling

    engine, ids, mask = build(args.tiny, args.batch, args.prompt)
    use_int8 = not args.bf16 and not args.tiny
    if use_int8:
        engine.quantize("int8")
    sampling = make_sampling(
        text_temperature=1.7, text_top_p=0.8,
        audio_temperature=1.7, audio_top_p=0.8, audio_repetition_penalty=1.0,
    )
    max_new = args.steps + args.warmup + 8
    cache_len = ((args.prompt + max_new + 1 + 255) // 256) * 256
    prefill = engine._get_prefill(max_new, cache_len)
    attend = ((args.prompt + max_new + 1 + 255) // 256) * 256
    step = engine._get_step(min(attend, cache_len))

    print("bench: compiling prefill...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state = prefill(engine.params, jnp.asarray(ids), jnp.asarray(mask),
                    jax.random.PRNGKey(0), sampling)
    jax.device_get(state.is_stopping)
    prefill_s = time.perf_counter() - t0
    print(f"bench: prefill done in {prefill_s:.1f}s; compiling step...",
          file=sys.stderr, flush=True)

    for i in range(args.warmup):
        state = step(engine.params, state, sampling)
        if i == 0:
            jax.device_get(state.is_stopping)
            print("bench: step compiled; warming up...", file=sys.stderr, flush=True)
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
    result = {
        "metric": "delay_decode_realtime_multiple_per_chip",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 20.0, 3),
        "detail": {
            "batch": args.batch,
            "prompt_len": args.prompt,
            "steps": args.steps,
            "step_ms": round(1000 * elapsed / args.steps, 2),
            "prefill_s": round(prefill_s, 2),
            "frames_per_sec": round(frames_per_sec, 1),
            "device": str(jax.devices()[0]),
            "tiny": args.tiny,
            "int8": use_int8,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
