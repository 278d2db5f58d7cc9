#!/usr/bin/env python
"""Decode-step cost ablation on TPU (VERDICT round-1 item 5 groundwork).

Times each piece of the Delay decode step at bench shapes (batch 64,
attend-bucket sweep) so kernel work targets the real bottleneck.

IMPORTANT (axon): a single host->device->host sync costs ~37 ms over the
remote TPU tunnel — far more than the on-device step. All timings here
enqueue ``iters`` calls back-to-back and sync ONCE (the same pipelined
pattern the bench and the engines use); per-call time = elapsed / iters.
A "sync_rtt_ms" measurement of a trivial program is reported so absolute
numbers can be read against the tunnel floor.

Run solo on the TPU (no PALLAS_AXON_POOL_IPS override). Prints a JSON report.
"""
from __future__ import annotations

import argparse
import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"profile: {msg}", file=sys.stderr, flush=True)


def timeit_pipelined(fn, iters=50, warmup=3, sync=None, chain=False, state=None):
    """Enqueue iters calls, one sync at the end; returns (ms/call, last_out).

    chain=True: fn(state) -> state (donating step fns chain the carry).
    chain=False: fn() called repeatedly (idempotent program)."""
    get = sync or (lambda o: jax.tree.leaves(o)[0].ravel()[:1])
    if chain:
        for _ in range(warmup):
            state = fn(state)
        jax.device_get(get(state))
        t0 = time.perf_counter()
        for _ in range(iters):
            state = fn(state)
        jax.device_get(get(state))
        return (time.perf_counter() - t0) * 1000 / iters, state
    out = None
    for _ in range(warmup):
        out = fn()
    jax.device_get(get(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(get(out))
    return (time.perf_counter() - t0) * 1000 / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", choices=["1p7b", "8b"], default="1p7b")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--kv-int8", action="store_true", dest="kv_int8")
    args = ap.parse_args()

    from bench import build
    from mosstts_tpu.models.delay import (
        _delay_sample_and_update, delay_embed, delay_forward, make_sampling,
    )
    from mosstts_tpu.nn.qwen3 import qwen3_forward

    engine, ids, mask = build(args.size, args.batch, args.prompt, True,
                              kv_int8=args.kv_int8)
    cfg = engine.config
    lc = cfg.language_config
    B = args.batch
    sampling = make_sampling()

    max_new = 80
    cache_len = ((args.prompt + max_new + 1 + 255) // 256) * 256
    prefill = engine._get_prefill(max_new, cache_len)
    state = prefill(engine.params, jnp.asarray(ids), jnp.asarray(mask),
                    jax.random.PRNGKey(0), sampling)
    jax.device_get(state.is_stopping)
    report = {"size": args.size, "batch": B, "cache_len": cache_len,
              "device": str(jax.devices()[0]), "iters": args.iters}

    def dump():
        log("partial: " + json.dumps(report))

    # 0) tunnel sync floor: one trivial program, per-sync cost
    tiny = jnp.zeros((8,), jnp.float32)
    bump = jax.jit(lambda x: x + 1)
    jax.device_get(bump(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(bump(tiny))
    report["sync_rtt_ms"] = round((time.perf_counter() - t0) * 100, 2)

    log("timing full step...")
    step = engine._get_step(cache_len)
    ms, state = timeit_pipelined(
        lambda s: step(engine.params, s, sampling), iters=args.iters,
        chain=True, state=state, sync=lambda s: s.is_stopping)
    report["full_step_ms"] = round(ms, 3)
    dump()

    log("timing backbone only (donated, in-place)...")
    # IMPORTANT: pieces that update the KV cache MUST donate the state and
    # chain it, exactly like the real step program — a non-donated
    # update_slice forces XLA to copy the multi-GB cache every call, which
    # inflated the 8B backbone reading by ~6-7 ms before this was fixed

    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def backbone_step(params, st):
        embeds = delay_embed(params, cfg, st.cur_ids)
        hidden, cache = qwen3_forward(
            params["backbone"], lc, embeds,
            positions=st.pos[:, None].astype(jnp.int32), kv_valid=st.kv_valid,
            cache=st.cache, cache_offset=st.pos, attend_len=cache_len)
        # advance pos mod the cache so successive writes move like a real
        # decode (staying < cache_len keeps the attend bucket fixed); fold a
        # scalar of the hidden in so the last layer's output is not DCE'd
        digest = (hidden[:, -1, 0] * 0).astype(jnp.int32)
        return st._replace(cache=cache,
                           pos=jnp.minimum(st.pos + 1, cache_len - 2) + digest)

    ms, state = timeit_pipelined(
        lambda s: backbone_step(engine.params, s), iters=args.iters,
        chain=True, state=state, sync=lambda s: s.pos)
    report["backbone_ms"] = round(ms, 3)
    dump()

    log("timing forward (backbone+heads, donated)...")

    @functools.partial(jax.jit, donate_argnums=(1,))
    def fwd_step(params, st):
        t, a, cache = delay_forward(
            params, cfg, st.cur_ids,
            positions=st.pos[:, None].astype(jnp.int32), kv_valid=st.kv_valid,
            cache=st.cache, cache_offset=st.pos, attend_len=cache_len)
        return (st._replace(cache=cache,
                            pos=jnp.minimum(st.pos + 1, cache_len - 2)),
                t[:, -1], a[:, -1])

    def fwd_chain(pack):
        st, _t, _a = pack
        return fwd_step(engine.params, st)

    _st, t_logits, a_logits = fwd_step(engine.params, state)
    ms, (state, t_logits, a_logits) = timeit_pipelined(
        fwd_chain, iters=args.iters, chain=True,
        state=(_st, t_logits, a_logits), sync=lambda p: p[0].pos)
    report["forward_ms"] = round(ms, 3)
    dump()

    log("timing sampling tail (donated)...")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def tail_step(st, tl, al):
        return _delay_sample_and_update(st, cfg, sampling, 50, 25, tl, al)

    ms, state = timeit_pipelined(
        lambda s: tail_step(s, t_logits, a_logits), iters=args.iters,
        chain=True, state=state, sync=lambda s: s.is_stopping)
    report["sample_tail_ms"] = round(ms, 3)
    dump()

    log("timing text top_k...")
    topk = jax.jit(lambda x: jax.lax.top_k(x, 50))
    ms, _ = timeit_pipelined(lambda: topk(t_logits), iters=args.iters)
    report["text_topk_ms"] = round(ms, 3)
    dump()

    log("timing text head...")
    from mosstts_tpu.ops.basic import dense

    hid = jnp.zeros((B, 1, lc.hidden_size), jnp.bfloat16)
    texthead = jax.jit(lambda h, w: dense(h, w).astype(jnp.float32))
    ms, _ = timeit_pipelined(
        lambda: texthead(hid, engine.params["text_head"]), iters=args.iters)
    report["text_head_ms"] = round(ms, 3)
    dump()

    log("attend sweep...")
    # 2048 would need a 15 GB cache at 1.7B/batch-64; free prior states as
    # we grow so 1024 fits.
    sweep = {}
    kv_itemsize = 1 if args.kv_int8 else 2
    param_gb = 9.3 if args.size == "8b" else 2.6
    for attend in (256, 512, 1024):
        kv_gb = (lc.num_hidden_layers * B * attend * lc.num_key_value_heads
                 * lc.head_dim * 2 * kv_itemsize) / 2**30
        if param_gb + kv_gb > 13.0:
            log(f"attend {attend}: skipped (params {param_gb} GB + KV "
                f"{kv_gb:.1f} GB exceeds the v5e HBM budget)")
            sweep[str(attend)] = None
            continue
        if attend > cache_len:
            del state
            gc.collect()
            prefill2 = engine._get_prefill(max_new, attend)
            state = prefill2(engine.params, jnp.asarray(ids), jnp.asarray(mask),
                             jax.random.PRNGKey(0), sampling)
            cl2 = attend
        else:
            cl2 = cache_len

        @functools.partial(jax.jit, donate_argnums=(1,),
                           static_argnames=("attend",))
        def bb(params, st, attend):
            # donated + chained like the real step (a non-donated cache
            # update would copy the whole multi-GB cache per call)
            embeds = delay_embed(params, cfg, st.cur_ids)
            hidden, cache = qwen3_forward(
                params["backbone"], lc, embeds,
                positions=st.pos[:, None].astype(jnp.int32), kv_valid=st.kv_valid,
                cache=st.cache, cache_offset=st.pos, attend_len=attend)
            digest = (hidden[:, -1, 0] * 0).astype(jnp.int32)
            return st._replace(
                cache=cache,
                pos=jnp.minimum(st.pos + 1, cl2 - 2) + digest)

        ms, state = timeit_pipelined(
            lambda s, a=min(attend, cl2): bb(engine.params, s, attend=a),
            iters=args.iters, chain=True, state=state, sync=lambda s: s.pos)
        sweep[str(attend)] = round(ms, 3)
        dump()
    report["backbone_attend_sweep_ms"] = sweep

    pts = [a for a in (256, 512, 1024) if sweep.get(str(a))]
    if len(pts) >= 2:
        a0, a1 = pts[0], pts[-1]
        kv_bytes = {a: lc.num_hidden_layers * B * int(a)
                    * lc.num_key_value_heads * lc.head_dim * 2 * kv_itemsize
                    for a in (a0, a1)}
        dt_ms = sweep[str(a1)] - sweep[str(a0)]
        db = kv_bytes[a1] - kv_bytes[a0]
        if dt_ms > 0:
            report["kv_slope_implied_GBps"] = round(db / (dt_ms / 1000) / 1e9, 1)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
