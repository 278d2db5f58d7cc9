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


def build(size: str, batch: int, prompt_len: int, use_int8: bool,
          kv_int8: bool = False):
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
                                         cache_bucket=256, kv_quant=kv_int8)
        if use_int8:
            engine.quantize("int8")
    elif size == "8b":
        cfg = delay_8b()
        shapes = jax.eval_shape(
            lambda k: init_delay_params(k, cfg, dtype=jnp.bfloat16),
            jax.random.PRNGKey(0),
        )
        params = random_quantized_like(shapes, seed=0)  # int8 only — bf16 OOMs
        engine = DelayEngine(params, cfg, dtype=jnp.bfloat16, cache_bucket=256,
                             kv_quant=kv_int8)
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
    batch = args.batch if args.batch else (128 if size in ("1p7b", "8b") else 64)
    # the 8B flagship's bf16 KV cache exceeds HBM beyond batch ~64; the
    # serving config at batch 128 uses the int8 cache (QuantKVCache)
    kv_int8 = getattr(args, "kv_int8", False) or (size == "8b" and batch > 64)
    args = argparse.Namespace(**{**vars(args), "batch": batch})
    engine, ids, mask = build(size, batch, args.prompt, use_int8,
                              kv_int8=kv_int8)
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
    # second call isolates steady-state prefill latency from compile time;
    # drop the first state FIRST — two live multi-GB KV caches OOM the chip
    # at long attend lengths
    del state
    gc.collect()
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
        "kv_int8": bool(kv_int8),
    }


def run_ttfa(args) -> dict:
    """Measured end-to-end time-to-first-audio for the realtime stack:
    reset -> prefill(turn grid + 12 text tokens) -> frames -> first codec
    chunk (3 frames = 240 ms of audio, the reference examples' default
    decode_chunk_frames, moss_tts_realtime/example_llm_stream_to_tts.py:201).
    Wall-clock from 'text available' to first audible samples; p50/p95 over
    --ttfa-runs runs. North star: < 200 ms (BASELINE.md)."""
    from mosstts_tpu.codec.model import MossAudioTokenizer
    from mosstts_tpu.core.config import CodecConfig, RealtimeConfig
    from mosstts_tpu.engine.realtime_engine import RealtimeEngine
    from mosstts_tpu.engine.streaming import (
        AudioStreamDecoder,
        RealtimeStreamingSession,
        RealtimeTextStreamBridge,
    )
    from mosstts_tpu.processing.realtime_processor import RealtimeProcessor
    from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer

    cfg = RealtimeConfig()  # flagship realtime scale: 1.7B backbone + depth txf
    engine = RealtimeEngine.random_init(seed=0, config=cfg, dtype=jnp.bfloat16)
    engine.quantize("int8")
    proc = RealtimeProcessor(ByteFallbackTokenizer(), channels=cfg.rvq)
    codec = MossAudioTokenizer.random_init(
        seed=0, config=CodecConfig(n_q=cfg.rvq))
    session = RealtimeStreamingSession(engine, proc, codec=codec)

    rng = np.random.default_rng(0)
    user_audio = rng.integers(0, 1024, (4, cfg.rvq))
    text_tokens = proc.tokenizer.encode(
        "Hello there, this is a latency measurement run for the realtime "
        "text to speech stack.")

    def one_run() -> float:
        session.reset_turn(user_text="hi", user_audio_tokens=user_audio,
                           reset_cache=True)
        decoder = AudioStreamDecoder(codec, chunk_frames=3, overlap_frames=0)
        bridge = RealtimeTextStreamBridge(session, decoder)
        # LLM-delta-sized pushes: 12 tokens trigger prefill (frame 1), then
        # each small push steps one frame per token
        pushes = [text_tokens[:12]] + [
            text_tokens[i:i + 2] for i in range(12, len(text_tokens), 2)
        ]
        t0 = time.perf_counter()
        with codec.streaming(batch_size=1):
            first = None
            for push in pushes:
                for wav in bridge.push_text_tokens(push):
                    first = wav
                    break
                if first is not None:
                    break
            if first is None:
                raise RuntimeError("no audio chunk emitted")
        return (time.perf_counter() - t0) * 1000.0

    log("[ttfa] warmup (compiles prefill/frame/codec programs)...")
    for _ in range(2):
        one_run()
    lat = sorted(one_run() for _ in range(args.ttfa_runs))
    p50 = lat[len(lat) // 2]
    p95 = lat[min(len(lat) - 1, int(len(lat) * 0.95))]
    return {
        "metric": "realtime_ttfa_ms_p50",
        "value": round(p50, 1),
        "unit": "ms",
        "vs_baseline": round(200.0 / p50, 3),  # target <200 ms; >1 is better
        "detail": {
            "p95_ms": round(p95, 1),
            "runs": args.ttfa_runs,
            "first_chunk_frames": 3,
            "prefill_text_tokens": 12,
            "device": str(jax.devices()[0]),
            "int8": True,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", choices=["tiny", "1p7b", "8b", "all"], default="all",
                    help="model scale; 'all' benches 1.7B then the 8B flagship")
    ap.add_argument("--tiny", action="store_true", help="alias for --size tiny")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: serving preset 128 for 1p7b/8b, 64 tiny")
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--kv-int8", action="store_true", dest="kv_int8",
                    help="int8 KV cache (QuantKVCache): halves decode "
                         "attention HBM traffic via the q8 Pallas kernel")
    ap.add_argument("--bf16", action="store_true",
                    help="disable int8 weight-only quantization for the 1.7B "
                         "config (8B is int8-only: bf16 exceeds v5e HBM)")
    ap.add_argument("--ttfa", action="store_true",
                    help="measure end-to-end realtime time-to-first-audio "
                         "instead of decode throughput")
    ap.add_argument("--ttfa-runs", type=int, default=20)
    args = ap.parse_args()
    size = "tiny" if args.tiny else args.size

    if args.ttfa:
        print(json.dumps(run_ttfa(args)))
        return

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
