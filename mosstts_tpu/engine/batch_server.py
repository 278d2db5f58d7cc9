"""Continuous-batching server for the Delay model family.

Production multi-stream serving beyond the reference's capabilities (the
reference serves one gradio request at a time): a fixed pool of batch slots
decodes in lock-step, and whenever a slot finishes its utterance a queued
request is admitted into that slot mid-flight — prefilled at batch 1 and
spliced into the running batch — so the chip never drains.

Built on the per-row-cursor DelayGenState: each slot has its own cache
cursor (`pos`), step counter, delay-pattern counters, and repetition-penalty
bitmask, all advanced by the same jitted decode step.

``paged=True`` swaps the per-slot linear KV cache for a shared page pool
(nn/qwen3.PagedKVCache + ops/pallas/paged_attn.py): slots borrow fixed-size
pages as their utterances grow and return them on completion, so KV memory
is sized for the expected load, not slots x cache_len worst case. The
allocator runs entirely off the host pos mirrors (zero extra device syncs);
pool exhaustion triggers vLLM-style recompute preemption.
"""
from __future__ import annotations

import itertools
import logging
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DelayConfig
from ..models.delay import (
    DelayGenState,
    DelaySampling,
    SENTINEL,
    delay_decode_step,
    delay_decode_until_event,
    delay_prefill,
    make_sampling,
)
from ..nn.qwen3 import init_kv_cache, init_paged_kv_cache, init_quant_kv_cache
from .delay_engine import attend_bucket


@dataclass
class _Request:
    request_id: int
    input_ids: np.ndarray  # (T, C)
    max_new_tokens: int
    start_length: int
    sampling: Optional[dict] = None  # per-request generation config
    seed: Optional[int] = None  # caller rng seed; None = derive from id


@dataclass
class CompletedRequest:
    request_id: int
    start_length: int
    tokens: np.ndarray  # (start .. prompt+generated, C) reference output shape
    steps: int


def _splice_fields(big: DelayGenState, small: DelayGenState, r: int, cache) -> DelayGenState:
    return DelayGenState(
        cache=cache,
        kv_valid=big.kv_valid.at[r].set(small.kv_valid[0]),
        cur_ids=big.cur_ids.at[r].set(small.cur_ids[0]),
        pos=big.pos.at[r].set(small.pos[0]),
        step=big.step.at[r].set(small.step[0]),
        # per-row keys: the admitted request carries its own (possibly
        # seeded) stream into the slot
        rng=big.rng.at[r].set(small.rng[0]),
        is_stopping=big.is_stopping.at[r].set(small.is_stopping[0]),
        is_audio=big.is_audio.at[r].set(small.is_audio[0]),
        audio_lengths=big.audio_lengths.at[r].set(small.audio_lengths[0]),
        delayed=big.delayed.at[r].set(small.delayed[0]),
        seen=big.seen.at[r].set(small.seen[0]),
        out=big.out.at[r].set(
            jnp.zeros_like(big.out[r]).at[: small.out.shape[1]].set(small.out[0])
        ),
        out_valid=big.out_valid.at[r].set(
            jnp.zeros_like(big.out_valid[r]).at[: small.out_valid.shape[1]].set(small.out_valid[0])
        ),
    )


def _insert_row(big: DelayGenState, small: DelayGenState, row: int) -> DelayGenState:
    """Splice a batch-1 prefilled state into slot ``row`` of the running
    batch (all per-row fields + the slot's cache lane)."""
    # fieldwise splice works for KVCache and QuantKVCache alike (every
    # cache field has B on axis 1)
    cache = type(big.cache)(*(
        bf.at[:, row].set(sf[:, 0]) for bf, sf in zip(big.cache, small.cache)
    ))
    return _splice_fields(big, small, row, cache)


def _insert_row_paged(
    big: DelayGenState, small: DelayGenState, row: int,
    pages: jax.Array, table_row: jax.Array, n0: int,
) -> DelayGenState:
    """Paged splice: copy the batch-1 LINEAR prefill cache into the ``n0``
    freshly allocated pool pages and point slot ``row``'s table at them.
    Pool buffers pair with the small cache's buffers fieldwise (k/v[,
    k_scale/v_scale]); the table is the pool's last field."""
    psz = big.cache.page_size

    def scatter(pool_buf, small_buf):
        blk = small_buf[:, 0, :, : n0 * psz]  # (L, KV, n0*P[, hd])
        if blk.ndim == 4:
            L_, KV_, _, hd_ = blk.shape
            blk = blk.reshape(L_, KV_, n0, psz, hd_).transpose(0, 2, 1, 3, 4)
        else:
            L_, KV_, _ = blk.shape
            blk = blk.reshape(L_, KV_, n0, psz).transpose(0, 2, 1, 3)
        return pool_buf.at[:, pages].set(blk.astype(pool_buf.dtype))

    pool = big.cache
    bufs = [scatter(pb, sb) for pb, sb in zip(pool[:-1], small.cache)]
    cache = type(pool)(*bufs, pool.table.at[row].set(table_row))
    return _splice_fields(big, small, row, cache)


class DelayBatchServer:
    def __init__(
        self,
        params,
        config: DelayConfig,
        *,
        slots: int = 8,
        cache_len: int = 2048,
        out_capacity: int = 1024,
        prompt_bucket: int = 64,
        dtype=jnp.bfloat16,
        sampling: Optional[DelaySampling] = None,
        top_k_text: int = 50,
        top_k_audio: int = 25,
        kv_quant: bool = False,
        poll_every: int = 4,
        mesh=None,
        paged: bool = False,
        page_size: int = 128,
        num_pages: Optional[int] = None,
    ):
        self.params = params
        self.config = config
        self.slots = slots
        self.cache_len = cache_len
        self.out_capacity = out_capacity
        self.prompt_bucket = prompt_bucket
        self.dtype = dtype
        self.sampling = sampling or make_sampling()
        self.top_k_text = top_k_text
        self.top_k_audio = top_k_audio
        # int8 KV cache for the running batch AND per-request prefills
        # (halves the dominant long-context HBM stream; see docs/PROFILE.md)
        self.kv_quant = kv_quant
        # Device completion flags are polled every ``poll_every`` steps (or
        # when a host-side step counter says a slot must be done). pos/step
        # advance deterministically (+1 per decode step, models/delay.py:500)
        # so they are mirrored on host — the old per-step device_get of
        # pos/step cost ~3 tunnel syncs (~100 ms) per step on this box.
        self.poll_every = poll_every
        # Tensor-parallel serving mesh; continuous batching splices batch-1
        # prefills into the pool, which cannot shard on 'data', so only
        # model-parallel meshes are accepted here.
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import delay_param_specs, shard_params

            if mesh.shape.get("data", 1) != 1:
                raise ValueError(
                    "DelayBatchServer mesh must have data=1 (batch-1 prefill "
                    "splice); shard the backbone on 'model' only")
            self.params = shard_params(self.params, mesh, delay_param_specs())

        # Paged KV: physical storage is a shared page pool; each slot's
        # logical [0, cache_len) maps through a page table. num_pages sizes
        # the pool (default: 1 trash page + 60% of the linear footprint —
        # the memory win paging exists for); admission waits in the queue
        # when the prompt doesn't fit and decode-time growth draws one page
        # at a time from the free list.
        self.paged = paged
        self.page_size = page_size
        if paged:
            assert cache_len % page_size == 0, (cache_len, page_size)
            full = slots * (cache_len // page_size)
            self.num_pages = num_pages if num_pages else 1 + (full * 6) // 10
            self._free_pages = list(range(self.num_pages - 1, 0, -1))
            self._slot_pages: Dict[int, List[int]] = {s: [] for s in range(slots)}

        self._jit: Dict[Any, Any] = {}
        self._ids = itertools.count()
        self._queue: List[_Request] = []
        self._active: Dict[int, _Request] = {}  # slot -> request
        self.state = self._empty_state()
        self.total_steps = 0
        self.util_sum = 0.0  # sum over steps of active/slots (mean = /total_steps)
        self.total_preemptions = 0
        self.total_dispatches = 0  # device programs launched (dispatch-floor accounting)
        # host mirrors of state.pos / state.step (exact: both advance by 1
        # per decode step for every row, stopped or not)
        self._pos_host = np.zeros(self.slots, np.int64)
        self._step_host = np.full(self.slots, self.out_capacity, np.int64)

        # Per-SLOT sampling (multi-tenant serving: each request carries its
        # own generation config; every DelaySampling knob broadcasts per
        # batch row via ops.sampling.align_rows, so ONE compiled step serves
        # any mix). Host arrays hold the TRANSFORMED fields; the device
        # pytree is rebuilt only when an admission changes a slot.
        d = self.sampling

        def _f(x):
            return float(np.asarray(x))

        self._samp_default = {
            "text_temperature": _f(d.text_temperature),
            "text_top_p": _f(d.text_top_p),
            "audio_temperature": _f(d.audio_temperature),
            "audio_top_p": _f(d.audio_top_p),
            "audio_repetition_penalty": _f(d.audio_repetition_penalty),
            "text_do_sample": bool(np.asarray(d.text_do_sample)),
            "audio_do_sample": bool(np.asarray(d.audio_do_sample)),
        }
        sd = self._samp_default
        self._samp_host = {
            k: np.full(self.slots, v,
                       np.bool_ if isinstance(v, bool) else np.float32)
            for k, v in sd.items()
        }
        self._batch_sampling: Optional[DelaySampling] = None

    # ------------------------------------------------------------------
    def _empty_state(self) -> DelayGenState:
        B, C = self.slots, self.config.channels
        Va = self.config.audio_emb_vocab
        if self.paged:
            cache = init_paged_kv_cache(
                self.config.language_config, B, self.cache_len,
                num_pages=self.num_pages, page_size=self.page_size,
                dtype=self.dtype, quant=self.kv_quant)
        elif self.kv_quant:
            cache = init_quant_kv_cache(self.config.language_config, B, self.cache_len)
        else:
            cache = init_kv_cache(self.config.language_config, B, self.cache_len, self.dtype)
        return DelayGenState(
            cache=cache,
            kv_valid=jnp.zeros((B, self.cache_len), jnp.bool_),
            cur_ids=jnp.zeros((B, 1, C), jnp.int32),
            pos=jnp.zeros((B,), jnp.int32),
            step=jnp.full((B,), self.out_capacity, jnp.int32),  # idle: out writes drop
            rng=jax.random.split(jax.random.PRNGKey(0), B),
            is_stopping=jnp.ones((B,), jnp.bool_),  # idle slots are "stopped"
            is_audio=jnp.zeros((B,), jnp.bool_),
            audio_lengths=jnp.zeros((B,), jnp.int32),
            delayed=jnp.full((B,), SENTINEL, jnp.int32),
            seen=jnp.zeros((B, self.config.n_vq, Va), jnp.bool_),
            out=jnp.zeros((B, self.out_capacity, C), jnp.int32),
            out_valid=jnp.zeros((B, self.out_capacity), jnp.bool_),
        )

    def _prefill_fn(self, T: int):
        key = ("prefill", T)
        if key not in self._jit:
            cfg, tkt, tka, dt = (self.config, self.top_k_text,
                                 self.top_k_audio, self.dtype)
            cl, oc, kvq = self.cache_len, self.out_capacity, self.kv_quant
            self._jit[key] = jax.jit(
                lambda p, ids, mask, rng, s: delay_prefill(
                    p, cfg, ids, mask, max_new_tokens=oc, cache_len=cl, rng=rng,
                    sampling=s, top_k_text=tkt, top_k_audio=tka, dtype=dt,
                    kv_quant=kvq,
                )
            )
        return self._jit[key]

    # ---- per-slot sampling -------------------------------------------
    _SAMP_KEYS = ("text_temperature", "text_top_p", "audio_temperature",
                  "audio_top_p", "audio_repetition_penalty")

    def _request_sampling_values(self, overrides: Optional[dict]) -> dict:
        """Resolved per-request sampling scalars: server defaults with the
        request's overrides applied (temperature <= 0 = greedy). One source
        of truth for _set_slot_sampling and run_drain's staged arrays."""
        vals = dict(self._samp_default)
        overrides = overrides or {}
        for chan in ("text", "audio"):
            t = overrides.get(f"{chan}_temperature")
            if t is not None:
                vals[f"{chan}_temperature"] = t if t > 0 else 1.0
                vals[f"{chan}_do_sample"] = t > 0
        for k in ("text_top_p", "audio_top_p", "audio_repetition_penalty"):
            if overrides.get(k) is not None:
                vals[k] = overrides[k]
        return vals

    def _set_slot_sampling(self, slot: int, overrides: dict):
        h = self._samp_host
        for k, v in self._request_sampling_values(overrides).items():
            h[k][slot] = v
        self._batch_sampling = None  # device pytree is stale

    def _slot_sampling(self, slot: int) -> DelaySampling:
        """Scalar DelaySampling for this slot (the admission prefill)."""
        h = self._samp_host
        return make_sampling(
            text_temperature=(float(h["text_temperature"][slot])
                              if h["text_do_sample"][slot] else 0.0),
            text_top_p=float(h["text_top_p"][slot]),
            audio_temperature=(float(h["audio_temperature"][slot])
                               if h["audio_do_sample"][slot] else 0.0),
            audio_top_p=float(h["audio_top_p"][slot]),
            audio_repetition_penalty=float(
                h["audio_repetition_penalty"][slot]),
            audio_rp_cross_batch=bool(
                np.asarray(self.sampling.audio_rp_cross_batch)),
        )

    def _batch_sampling_dev(self) -> DelaySampling:
        if self._batch_sampling is None:
            h = self._samp_host
            self._batch_sampling = DelaySampling(
                text_temperature=jnp.asarray(h["text_temperature"]),
                text_top_p=jnp.asarray(h["text_top_p"]),
                audio_temperature=jnp.asarray(h["audio_temperature"]),
                audio_top_p=jnp.asarray(h["audio_top_p"]),
                audio_repetition_penalty=jnp.asarray(
                    h["audio_repetition_penalty"]),
                text_do_sample=jnp.asarray(h["text_do_sample"]),
                audio_do_sample=jnp.asarray(h["audio_do_sample"]),
                audio_rp_cross_batch=self.sampling.audio_rp_cross_batch,
            )
        return self._batch_sampling

    # `row` is a TRACED argument in the splice/table programs below: keying
    # the jit cache on the slot index compiled a separate program per row
    # (16 slots = 16 remote compiles, each surfacing as a 0.5-0.9 s stall
    # the first time a slot was reused mid-serve — measured in
    # tools/probe_paged_bench_trace.py). One program covers every slot.
    def _insert_fn(self):
        if "insert" not in self._jit:
            self._jit["insert"] = jax.jit(
                _insert_row, donate_argnums=(0,))
        return self._jit["insert"]

    def _insert_paged_fn(self, n0: int):
        key = ("insertp", n0)
        if key not in self._jit:
            self._jit[key] = jax.jit(
                lambda big, small, row, pages, trow: _insert_row_paged(
                    big, small, row, pages, trow, n0),
                donate_argnums=(0,),
            )
        return self._jit[key]

    def _table_entry_fn(self):
        if "table_entry" not in self._jit:
            self._jit["table_entry"] = jax.jit(
                lambda t, row, col, pg: t.at[row, col].set(pg),
                donate_argnums=(0,))
        return self._jit["table_entry"]

    def _table_clear_fn(self):
        if "table_clear" not in self._jit:
            self._jit["table_clear"] = jax.jit(
                lambda t, row: t.at[row].set(0), donate_argnums=(0,))
        return self._jit["table_clear"]

    # ---- host page allocator (driven by the pos mirrors: zero syncs) ----
    def _grow_pages(self, slot: int, upto_slot: int) -> bool:
        """Ensure slot's logical pages cover write position ``upto_slot``;
        allocates from the free list and patches the device table. Returns
        False when the pool is exhausted."""
        need = min(upto_slot // self.page_size + 1,
                   self.cache_len // self.page_size)
        pages = self._slot_pages[slot]
        while len(pages) < need:
            if not self._free_pages:
                return False
            pg = self._free_pages.pop()
            tbl = self._table_entry_fn()(
                self.state.cache.table, slot, len(pages), pg)
            self.state = self.state._replace(
                cache=self.state.cache._replace(table=tbl))
            pages.append(pg)
        return True

    def _free_slot_pages(self, slot: int):
        """Return slot's pages to the pool; its table row then points at the
        trash page 0, so the idle row's masked writes land in trash instead
        of pages now owned by other slots."""
        self._free_pages.extend(reversed(self._slot_pages[slot]))
        self._slot_pages[slot] = []
        self.state = self.state._replace(
            cache=self.state.cache._replace(
                table=self._table_clear_fn()(self.state.cache.table, slot)))

    def _step_fn(self, attend: int):
        key = ("step", attend)
        if key not in self._jit:
            cfg, tkt, tka = self.config, self.top_k_text, self.top_k_audio
            self._jit[key] = jax.jit(
                lambda p, st, s: delay_decode_step(
                    p, cfg, st, s, top_k_text=tkt, top_k_audio=tka,
                    attend_len=attend,
                ),
                donate_argnums=(1,),
            )
        return self._jit[key]

    def _block_fn(self, attend: int, k: int):
        """ONE device program = ``k`` decode steps (lax.fori_loop over the
        step). Every program launch pays a fixed dispatch floor (~30 ms on
        this tunnel; still real on local hardware), so per-step serving
        dispatch caps throughput at slots/floor no matter how fast the chip
        is — measured 34 ms/step vs the ~3 ms device-bound step at 16 slots.
        Blocked dispatch amortizes the floor over k steps (the multi-step
        scheduling trick from GPU serving stacks); completions and
        admissions already only happen at poll boundaries, so the serving
        contract is unchanged."""
        key = ("block", attend, k)
        if key not in self._jit:
            cfg, tkt, tka = self.config, self.top_k_text, self.top_k_audio

            def block(p, st, s):
                return jax.lax.fori_loop(
                    0, k,
                    lambda i, cur: delay_decode_step(
                        p, cfg, cur, s, top_k_text=tkt, top_k_audio=tka,
                        attend_len=attend),
                    st)

            self._jit[key] = jax.jit(block, donate_argnums=(1,))
        return self._jit[key]

    def _dispatch_block(self, k: int) -> int:
        """Admit queued requests into free slots, then enqueue ONE k-step
        block program. Returns the steps dispatched (0 if nothing active).
        A slot that hits its token budget mid-block overshoots by at most
        k-1 masked-out steps (k <= poll_every, which submit() reserves as
        cache slack); _collect trims the output to the requested count."""
        self._fill_free_slots()
        if not self._active:
            return 0
        if self.paged:
            # Grow every active slot's pages to cover the whole block. The
            # grow pass establishes an invariant: every slot still in
            # _active afterwards is grown through the block (ungrown slots
            # were preempted out). Dispatching MUST only happen under that
            # invariant — an ungrown slot's decode writes route through
            # table entry 0 (the shared trash page) and silently corrupt
            # its KV — so on total preemption we re-admit (the pool is now
            # free; the requeued front request fits by submit()'s
            # worst-case check) and re-run the grow pass, never falling
            # through to dispatch after a refill. The attempt bound only
            # breaks admit->grow-fail->preempt livelock (possible when a
            # preempt-merged prompt outgrew the pool); active is empty at
            # that point, so returning 0 just requeues the window.
            attempts = 0
            while True:
                for slot in sorted(self._active):
                    if not self._grow_pages(slot,
                                            int(self._pos_host[slot]) + k - 1):
                        self._preempt(slot)
                if self._active:
                    break  # invariant holds: all surviving slots are grown
                attempts += 1
                if attempts > self.slots + 2:
                    return 0
                self._fill_free_slots()
                if not self._active:
                    return 0
        active = sorted(self._active)
        max_pos = int(self._pos_host[active].max())
        attend = attend_bucket(max_pos + k + 1, 256, self.cache_len)
        self.state = self._block_fn(attend, k)(
            self.params, self.state, self._batch_sampling_dev())
        self.total_steps += k
        self.total_dispatches += 1
        self.util_sum += k * (len(self._active) / self.slots)
        self._pos_host += k
        self._step_host += k
        return k

    def _event_fn(self, attend: int):
        """ONE device program = decode UNTIL A SCHEDULING EVENT (any active
        slot stops or exhausts its budget), watched on device by the
        while_loop cond. Dispatch cost then scales with the completion
        rate instead of the step rate — the fixed program-dispatch floor
        (~30-45 ms on this tunnel, still real locally) is paid once per
        collect/refill opportunity rather than once per poll window. The
        step cap rides as a traced scalar so the jit cache stays keyed on
        the attend bucket alone."""
        key = ("event", attend)
        if key not in self._jit:
            cfg, tkt, tka = self.config, self.top_k_text, self.top_k_audio
            self._jit[key] = jax.jit(
                lambda p, st, s, w, bl, mk: delay_decode_until_event(
                    p, cfg, st, s, w, bl, mk,
                    top_k_text=tkt, top_k_audio=tka, attend_len=attend),
                donate_argnums=(1,),
            )
        return self._jit[key]

    def _dispatch_event(self, max_k: int):
        """Admit queued requests, then run ONE event block. Returns
        ``(steps_executed, stop_flags | None)`` — flags are fetched in the
        same transfer as the step count, and no admission happens between
        dispatch and fetch, so they map directly onto current occupants."""
        self._fill_free_slots()
        attempts = 0
        while True:  # recompute geometry whenever occupancy changes
            if not self._active:
                return 0, None
            active = sorted(self._active)
            max_pos = int(self._pos_host[active].max())
            # one compiled program per attend bucket: cap the block at the
            # bucket boundary (the next block re-enters the larger bucket)
            attend = attend_bucket(max_pos + 2, 256, self.cache_len)
            k_bucket = attend - max_pos - 1
            budget = np.full(self.slots, 1 << 30, np.int64)
            for s, req in self._active.items():
                budget[s] = req.max_new_tokens - self._step_host[s]
            k_cap = int(min(max_k, k_bucket, int(budget[active].min())))
            if k_cap <= 0:
                return 0, None
            if not self.paged:
                break
            # same growth invariant as _dispatch_block: every slot still
            # active after the grow pass covers the whole block (ungrown
            # slots were preempted out); the surviving set's k_cap only
            # shrinks when budgets shrink, so their coverage stays valid
            for slot in active:
                if not self._grow_pages(
                        slot, int(self._pos_host[slot]) + k_cap - 1):
                    self._preempt(slot)
            if self._active:
                break
            attempts += 1
            if attempts > self.slots + 2:
                return 0, None
            # total preemption: pool is free again — re-admit and loop to
            # RECOMPUTE attend/k_cap (a preempt-merged prompt can exceed
            # the previous max_pos)
            self._fill_free_slots()
        # watch only CURRENT occupants: the grow pass may have preempted
        # slots out of `active`, and a preempted row's stale stop flag or
        # budget entry must not end the block
        watch = np.zeros(self.slots, bool)
        watch[sorted(self._active)] = True
        st, i_dev = self._event_fn(attend)(
            self.params, self.state, self._batch_sampling_dev(),
            jnp.asarray(watch), jnp.asarray(budget.astype(np.int32)),
            jnp.int32(k_cap))
        self.state = st
        did, flags = jax.device_get((i_dev, st.is_stopping))
        did = int(did)
        self.total_steps += did
        self.total_dispatches += 1
        self.util_sum += did * (len(self._active) / self.slots)
        self._pos_host += did
        self._step_host += did
        return did, np.asarray(flags)

    def run_events(self, max_steps: int = 100000) -> List[CompletedRequest]:
        """Drain queue + active slots with EVENT-DRIVEN dispatch: each
        device program runs until a slot actually needs scheduler attention
        (EOS or budget), so long stretches with no completions cost one
        dispatch instead of steps/poll_every of them. Token streams are
        bit-equal to run() — only the dispatch grouping differs."""
        out: List[CompletedRequest] = []
        steps = 0
        while True:
            if self._active:
                # budget completions are host-knowable: free those slots
                # before dispatching so the block admits into them
                out.extend(self._collect(stopped=np.zeros(self.slots, bool)))
            if not (self._active or self._queue):
                break
            did, flags = self._dispatch_event(max_steps - steps)
            steps += did
            collected = 0
            if flags is not None:
                got = self._collect(stopped=flags)
                collected = len(got)
                out.extend(got)
            if did == 0 and collected == 0:
                # truly no progress possible (max_steps exhausted, paged
                # admission failure) — surface abandoned requests
                if self._queue:
                    stuck = [r.request_id for r in self._queue]
                    logging.getLogger(__name__).warning(
                        "run_events() stopping with %d undrained request(s)"
                        " still queued (ids %s)", len(stuck), stuck)
                break
        return out

    # ---- device-resident drain scheduler -------------------------------
    def _drain_fn(self, attend: int, buckets: Tuple[int, ...], nqcap: int):
        """ONE device program = the WHOLE continuous-batching scheduler for
        a batch of queued requests, inside a single while_loop:

          admit (batch-1 prefill via lax.switch over the distinct prompt
          buckets + row splice — the exact programs _admit composes) ->
          decode step -> collect (completed slots' outputs scattered into
          per-request result rows) -> repeat,

        exiting only when everything drained, the attend bucket must grow,
        or a step cap hits. The host then pays ONE dispatch + ONE sync per
        attend bucket instead of one per poll window or per completion —
        on hardware with a fixed program-dispatch floor (tunneled TPU:
        ~30-45 ms; local chips: smaller but real) this is the difference
        between scheduler-bound and device-bound serving. Token streams
        are bit-equal to run()/run_events(): same prefill shapes (each
        request keeps its own prompt bucket — RoPE positions depend on the
        left-pad, so a shared bucket would change tokens), same per-row
        rng streams, same sampling-override semantics.

        The reference serves one request at a time from a host loop
        (moss_tts_realtime/app.py:951-954); this is the TPU-native inverse:
        the scheduler itself compiled onto the device."""
        key = ("drain", attend, buckets, nqcap)
        if key not in self._jit:
            cfg, tkt, tka = self.config, self.top_k_text, self.top_k_audio
            dt, cl, oc, kvq = (self.dtype, self.cache_len,
                               self.out_capacity, self.kv_quant)
            C = cfg.channels
            t_max = buckets[-1]

            def drain(params, carry, prompts, masks, qbucket, qbudget,
                      rngs, qsamp, qn, cap):
                # carry: st, samp, qi, active, slot_rid, budget, results,
                #        rsteps, i

                def cond(c):
                    st, _samp, qi, active, _rid, _b, _res, _rs, i = c
                    work = (qi < qn) | jnp.any(active)
                    pos_ok = ~jnp.any(active & (st.pos >= attend))
                    return work & pos_ok & (i < cap)

                def admit(op):
                    st, samp, qi, active, slot_rid, budget = op
                    slot = jnp.argmin(active)  # first free slot

                    def mk_branch(tb):
                        def branch(_):
                            ids = jax.lax.dynamic_slice(
                                prompts, (qi, t_max - tb, 0), (1, tb, C))
                            mask = jax.lax.dynamic_slice(
                                masks, (qi, t_max - tb), (1, tb))
                            samp_scalar = DelaySampling(
                                *(f[qi] if f.ndim else f for f in qsamp))
                            return delay_prefill(
                                params, cfg, ids, mask,
                                max_new_tokens=oc, cache_len=cl,
                                rng=rngs[qi], sampling=samp_scalar,
                                top_k_text=tkt, top_k_audio=tka, dtype=dt,
                                kv_quant=kvq)
                        return branch

                    small = jax.lax.switch(
                        qbucket[qi], [mk_branch(tb) for tb in buckets], None)
                    st = _insert_row(st, small, slot)
                    samp = DelaySampling(
                        *(f.at[slot].set(qf[qi]) if f.ndim else f
                          for f, qf in zip(samp, qsamp)))
                    return (st, samp, qi + 1, active.at[slot].set(True),
                            slot_rid.at[slot].set(qi),
                            budget.at[slot].set(qbudget[qi]))

                def body(c):
                    st, samp, qi, active, slot_rid, budget, results, rsteps, i = c
                    can_admit = jnp.any(~active) & (qi < qn)
                    st, samp, qi, active, slot_rid, budget = jax.lax.cond(
                        can_admit, admit, lambda op: op,
                        (st, samp, qi, active, slot_rid, budget))
                    st = delay_decode_step(
                        params, cfg, st, samp,
                        top_k_text=tkt, top_k_audio=tka, attend_len=attend)
                    stopped = active & (st.is_stopping | (st.step >= budget))
                    # completed slots' outputs land in their request row;
                    # untriggered slots write the trash row nqcap
                    rid_w = jnp.where(stopped, slot_rid, nqcap)
                    results = results.at[rid_w].set(st.out)
                    rsteps = rsteps.at[rid_w].set(
                        jnp.minimum(st.step, budget))
                    return (st, samp, qi, active & ~stopped, slot_rid,
                            budget, results, rsteps, i + 1)

                return jax.lax.while_loop(cond, body, carry)

            self._jit[key] = jax.jit(drain, donate_argnums=(1,))
        return self._jit[key]

    def run_drain(self, max_steps: int = 100000) -> List[CompletedRequest]:
        """Drain the queue with the DEVICE-RESIDENT scheduler (_drain_fn):
        one dispatch + one small sync per attend bucket for the whole
        batch. Linear-cache servers only (the paged pool's host allocator
        needs per-completion control — use run()/run_events there).
        Requires an idle pool (no in-flight slots)."""
        if self.paged:
            raise ValueError("run_drain requires the linear cache; use "
                             "run()/run_events for paged serving")
        if self._active:
            raise ValueError("run_drain requires an idle pool")
        reqs = list(self._queue)
        self._queue.clear()
        if not reqs:
            return []
        cfg = self.config
        C = cfg.channels
        NQ = len(reqs)
        nqcap = -(-NQ // 16) * 16  # bound program count: one per 16-size
        pb = self.prompt_bucket

        def bucket_of(r):
            return ((r.input_ids.shape[0] + pb - 1) // pb) * pb

        buckets = tuple(sorted({bucket_of(r) for r in reqs}))
        t_max = buckets[-1]
        prompts = np.full((nqcap, t_max, C), cfg.audio_pad_code, np.int64)
        prompts[..., 0] = cfg.pad_token_id
        masks = np.zeros((nqcap, t_max), bool)
        qbucket = np.zeros(nqcap, np.int32)
        qbudget = np.zeros(nqcap, np.int32)
        rngs = np.zeros((nqcap, 2), np.uint32)
        samp_vals = {k: np.zeros(nqcap, np.bool_ if isinstance(v, bool)
                                 else np.float32)
                     for k, v in self._samp_default.items()}
        for idx, r in enumerate(reqs):
            T = r.input_ids.shape[0]
            prompts[idx, t_max - T:] = r.input_ids
            masks[idx, t_max - T:] = True
            qbucket[idx] = buckets.index(bucket_of(r))
            qbudget[idx] = min(r.max_new_tokens, self.out_capacity)
            # identical seeding to _admit (cross-lifetime reproducibility)
            rngs[idx] = np.asarray(jax.random.PRNGKey(
                hash((0xD317A9,
                      r.seed if r.seed is not None else r.request_id))
                & 0x7FFFFFFF))
            for k, v in self._request_sampling_values(r.sampling).items():
                samp_vals[k][idx] = v
        base = self.sampling
        qsamp = DelaySampling(
            text_temperature=jnp.asarray(samp_vals["text_temperature"]),
            text_top_p=jnp.asarray(samp_vals["text_top_p"]),
            audio_temperature=jnp.asarray(samp_vals["audio_temperature"]),
            audio_top_p=jnp.asarray(samp_vals["audio_top_p"]),
            audio_repetition_penalty=jnp.asarray(
                samp_vals["audio_repetition_penalty"]),
            text_do_sample=jnp.asarray(samp_vals["text_do_sample"]),
            audio_do_sample=jnp.asarray(samp_vals["audio_do_sample"]),
            # fresh buffer: the carry donates _batch_sampling_dev(), whose
            # cross_batch scalar is this same array — aliasing a donated
            # buffer into a non-donated arg is an XLA error
            audio_rp_cross_batch=jnp.bool_(
                bool(np.asarray(base.audio_rp_cross_batch))),
        )
        # the carry is DONATED into the loop: give it a private copy of the
        # slot-sampling pytree — donating _batch_sampling_dev() itself would
        # delete the cached pytree AND the server's base
        # sampling.audio_rp_cross_batch scalar it shares, breaking every
        # later run()/run_drain() on this server ("Array has been deleted")
        samp0 = jax.tree.map(lambda x: x.copy(), self._batch_sampling_dev())
        carry = (
            self.state, samp0, jnp.int32(0),
            jnp.zeros(self.slots, bool), jnp.zeros(self.slots, jnp.int32),
            jnp.full(self.slots, 1 << 30, jnp.int32),
            jnp.zeros((nqcap + 1, self.out_capacity, C), jnp.int32),
            jnp.zeros(nqcap + 1, jnp.int32), jnp.int32(0),
        )
        prompts_j, masks_j = jnp.asarray(prompts), jnp.asarray(masks)
        qbucket_j, qbudget_j = jnp.asarray(qbucket), jnp.asarray(qbudget)
        rngs_j, qn_j = jnp.asarray(rngs), jnp.int32(NQ)
        pos_floor = t_max  # any new admission lands at its bucket <= t_max
        steps_done = 0
        prev_i = -1
        while True:
            attend = attend_bucket(pos_floor + 2, 256, self.cache_len)
            carry = self._drain_fn(attend, buckets, nqcap)(
                self.params, carry, prompts_j, masks_j, qbucket_j,
                qbudget_j, rngs_j, qsamp, qn_j,
                jnp.int32(max_steps))
            self.total_dispatches += 1
            qi_h, act_h, pos_h, i_h = jax.device_get(
                (carry[2], carry[3], carry[0].pos, carry[8]))
            done = (int(qi_h) >= NQ) and not bool(np.any(act_h))
            stuck = int(i_h) == prev_i and attend >= self.cache_len
            if done or int(i_h) >= max_steps or stuck:
                steps_done = int(i_h)
                if not done:
                    logging.getLogger(__name__).warning(
                        "run_drain() stopped with work remaining "
                        "(steps=%d, stuck=%s)", steps_done, stuck)
                break
            prev_i = int(i_h)
            active_pos = int(np.max(np.where(act_h, pos_h, 0)))
            pos_floor = max(active_pos,
                            t_max if int(qi_h) < NQ else 0)
        self.total_steps += steps_done
        # (per-step occupancy stays on device; util_sum is not updated —
        # utilization reads 0 for drain-only servers rather than a guess)
        results, rsteps = jax.device_get((carry[6], carry[7]))
        self.state = carry[0]
        self._pos_host[:] = np.asarray(jax.device_get(carry[0].pos))
        self._step_host[:] = 1 << 30
        out: List[CompletedRequest] = []
        for idx, req in enumerate(reqs):
            n = int(rsteps[idx])
            gen = np.asarray(results[idx, :n], np.int64)
            full = np.concatenate([req.input_ids, gen], axis=0)
            start_idx = req.input_ids.shape[0] - req.start_length
            out.append(CompletedRequest(
                request_id=req.request_id,
                start_length=req.start_length,
                tokens=full[start_idx:],
                steps=n,
            ))
        return out

    def step_block(self, k: Optional[int] = None) -> List[CompletedRequest]:
        """One poll window in a single dispatch: admit, run ``k`` (default
        poll_every) decode steps as ONE device program, then collect. The
        serving-loop building block for hosts that interleave their own
        work (HTTP pools) between windows; completions lag <= k-1 steps."""
        k = self.poll_every if k is None else k
        if self._dispatch_block(k) == 0:
            return []
        return self._collect()

    # ------------------------------------------------------------------
    def submit(self, input_ids: np.ndarray, *, max_new_tokens: int = 256,
               sampling: Optional[dict] = None,
               seed: Optional[int] = None) -> int:
        """Queue a request; (T, C) grid from the processor. Returns id.

        ``sampling`` optionally overrides the server defaults for THIS
        request: any of text_temperature / text_top_p / audio_temperature /
        audio_top_p / audio_repetition_penalty (temperature <= 0 = greedy).
        Per-slot values ride the one compiled step as (slots,) arrays."""
        if sampling:
            bad = set(sampling) - {f"{c}_temperature" for c in ("text", "audio")} \
                - {"text_top_p", "audio_top_p", "audio_repetition_penalty"}
            if bad:
                raise ValueError(f"unknown sampling overrides: {sorted(bad)}")
        input_ids = np.asarray(input_ids, np.int64)
        if input_ids.ndim != 2 or input_ids.shape[1] != self.config.channels:
            raise ValueError(f"expected (T, {self.config.channels}) grid")
        cfg = self.config
        matches = np.nonzero(input_ids[:, 0] == cfg.im_start_token_id)[0]
        start_idx = int(matches[-1]) + 3 if len(matches) else 0
        Tb = (-(-input_ids.shape[0] // self.prompt_bucket)) * self.prompt_bucket
        if not self.paged:
            # linear mode: KV writes past cache_len are masked drops — a
            # request that can't fit must be rejected here, not produce
            # silently degraded audio (mirrors LocalBatchServer.submit)
            if Tb + min(max_new_tokens, self.out_capacity) + self.poll_every \
                    > self.cache_len:
                raise ValueError(
                    f"prompt ({Tb} bucketed) + max_new_tokens "
                    f"({min(max_new_tokens, self.out_capacity)}) exceeds "
                    f"cache_len={self.cache_len}; raise cache_len or use "
                    f"paged mode")
        else:
            # reject requests the pool can NEVER satisfy even solo —
            # otherwise the sole active slot self-preempts forever
            worst = min(
                -(-(Tb + min(max_new_tokens, self.out_capacity)) // self.page_size),
                self.cache_len // self.page_size)
            if worst > self.num_pages - 1:
                raise ValueError(
                    f"request needs up to {worst} pages but the pool has "
                    f"{self.num_pages - 1}; raise num_pages or shorten the prompt")
        rid = next(self._ids)
        self._queue.append(_Request(
            request_id=rid, input_ids=input_ids,
            max_new_tokens=min(max_new_tokens, self.out_capacity),
            start_length=input_ids.shape[0] - start_idx,
            sampling=dict(sampling) if sampling else None,
            seed=seed,
        ))
        return rid

    def _admit(self, slot: int, req: _Request) -> bool:
        T = req.input_ids.shape[0]
        Tb = ((T + self.prompt_bucket - 1) // self.prompt_bucket) * self.prompt_bucket
        if self.paged:
            n0 = -(-Tb // self.page_size)
            if len(self._free_pages) < n0:
                return False  # request waits for pages to free up
            pages = [self._free_pages.pop() for _ in range(n0)]
            self._slot_pages[slot] = pages
        ids = np.full((1, Tb, self.config.channels), self.config.audio_pad_code, np.int64)
        ids[..., 0] = self.config.pad_token_id
        ids[0, Tb - T:] = req.input_ids
        mask = np.zeros((1, Tb), bool)
        mask[0, Tb - T:] = True
        # explicit seeds reproduce across server lifetimes (the request id
        # is monotonic per-process, so it must NOT enter a seeded stream).
        # int-only hash input: tuples containing a str hash differently in
        # every process (PYTHONHASHSEED salting), which would silently break
        # the cross-lifetime guarantee.
        rng = jax.random.PRNGKey(
            hash((0xD317A9,
                  req.seed if req.seed is not None else req.request_id))
            & 0x7FFFFFFF)
        self._set_slot_sampling(slot, req.sampling or {})
        small = self._prefill_fn(Tb)(
            self.params, jnp.asarray(ids), jnp.asarray(mask), rng,
            self._slot_sampling(slot))
        if self.paged:
            trow = np.zeros(self.cache_len // self.page_size, np.int32)
            trow[:n0] = pages
            self.state = self._insert_paged_fn(n0)(
                self.state, small, slot, jnp.asarray(pages, jnp.int32),
                jnp.asarray(trow))
        else:
            self.state = self._insert_fn()(self.state, small, slot)
        self._active[slot] = req
        # mirror the spliced cursors (delay_prefill sets pos=T, step=0)
        self._pos_host[slot] = Tb
        self._step_host[slot] = 0
        return True

    def _fill_free_slots(self):
        if not self._queue:
            return
        busy = set(self._active)
        for slot in range(self.slots):
            if not self._queue:
                break
            if slot not in busy:
                if not self._admit(slot, self._queue[0]):
                    break  # FIFO: wait for pages rather than skip ahead
                self._queue.pop(0)

    def step(self, *, poll: Optional[bool] = None) -> List[CompletedRequest]:
        """Admit queued requests into free slots, run one decode step for the
        whole batch, and collect completions.

        The decode step itself needs ZERO host syncs: the attend bucket comes
        from the host pos mirror. The device is only consulted (one transfer
        for the stop flags) every ``poll_every`` steps, or when the host step
        mirror proves some slot hit its token budget; pass ``poll=True`` to
        force a check. A finished slot may therefore idle for up to
        poll_every-1 masked steps before being collected — the processor
        trims at im_end so the extra tail is inert.
        """
        self._fill_free_slots()
        if not self._active:
            return []
        if self.paged:
            # pos mirrors say which slots write into a fresh logical page
            # this step; draw from the free list, preempting (recompute
            # style: prompt+generated requeued at the front) on exhaustion
            for slot in sorted(self._active):
                if not self._grow_pages(slot, int(self._pos_host[slot])):
                    self._preempt(slot)
            if not self._active:
                return []
        # attend bucket covers the furthest ACTIVE cursor (idle slots keep
        # advancing but their writes/reads are masked + dropped)
        active = sorted(self._active)
        max_pos = int(self._pos_host[active].max())
        attend = attend_bucket(max_pos + 2, 256, self.cache_len)
        self.state = self._step_fn(attend)(
            self.params, self.state, self._batch_sampling_dev())
        self.total_steps += 1
        self.total_dispatches += 1
        self.util_sum += len(self._active) / self.slots
        self._pos_host += 1
        self._step_host += 1

        if poll is None:
            poll = (
                self.total_steps % self.poll_every == 0
                or any(self._step_host[s] >= self._active[s].max_new_tokens
                       for s in active)
            )
        return self._collect() if poll else []

    def _preempt(self, slot: int):
        """Pool exhausted: evict this slot, folding its generated tokens
        into the prompt and requeueing at the FRONT (vLLM-style recompute
        preemption — one extra prefill instead of a crash). Progress needs
        the pool to hold at least one full stream (cache_len/page_size
        pages); smaller pools eventually requeue forever."""
        req = self._active.pop(slot)
        self.total_preemptions += 1
        n = int(min(self._step_host[slot], req.max_new_tokens))
        # full-buffer fetch: out[slot] with a static index would compile one
        # slice program per slot (same trap as _collect's gather)
        gen = np.asarray(jax.device_get(self.state.out))[slot, :n]
        self._free_slot_pages(slot)
        # delay_prefill reconstructs the state machine from the grid's LAST
        # text token (models/delay.py:272-279); a fold ending inside the
        # delay-drain window (trailing delay_slot rows) would reconstruct
        # as "not generating audio", so trim back to the last gen-slot row
        # and let the resumed decode re-decide the drain
        cfg = self.config
        while n and gen[n - 1, 0] in (
                cfg.audio_assistant_delay_slot_token_id, cfg.audio_end_token_id):
            n -= 1
        merged = np.concatenate([req.input_ids, gen[:n].astype(np.int64)], axis=0)
        self._queue.insert(0, _Request(
            request_id=req.request_id, input_ids=merged,
            max_new_tokens=req.max_new_tokens - n,
            start_length=req.start_length + n))

    def _collect(self, stopped: Optional[np.ndarray] = None
                 ) -> List[CompletedRequest]:
        """One transfer for the stop flags, then one batched transfer for the
        finished slots' token grids."""
        if stopped is None:
            stopped = np.asarray(jax.device_get(self.state.is_stopping))
        finished = [
            (slot, req) for slot, req in sorted(self._active.items())
            if stopped[slot] or self._step_host[slot] >= req.max_new_tokens
        ]
        if not finished:
            return []
        # fetch the WHOLE out buffer in one fixed-shape transfer: indexing
        # state.out[rows] on device would compile a gather program per
        # distinct finished-count (measured as ~0.5-3 s first-completion
        # stalls); the full buffer is slots x out_capacity x C int32 —
        # sub-MB, cheaper than one compile amortized over any run
        outs_all = np.asarray(jax.device_get(self.state.out))
        outs = outs_all[[slot for slot, _ in finished]]
        done: List[CompletedRequest] = []
        for (slot, req), gen_full in zip(finished, outs):
            n = int(min(self._step_host[slot], req.max_new_tokens))
            full = np.concatenate(
                [req.input_ids, gen_full[:n].astype(np.int64)], axis=0)
            start_idx = req.input_ids.shape[0] - req.start_length
            done.append(CompletedRequest(
                request_id=req.request_id,
                start_length=req.start_length,
                tokens=full[start_idx:],
                steps=n,
            ))
            del self._active[slot]
            if self.paged:
                self._free_slot_pages(slot)
        return done

    def _snap_flags(self):
        """On-device copy of the stop flags. The step program donates the
        state, so a raw reference held across the next block would point at
        a donated buffer; the copy survives donation, and fetching it later
        overlaps the transfer with the next block's device execution."""
        if "snap" not in self._jit:
            self._jit["snap"] = jax.jit(lambda x: jnp.logical_or(x, False))
        return self._jit["snap"](self.state.is_stopping)

    def run(self, max_steps: int = 100000,
            pipelined: bool = True) -> List[CompletedRequest]:
        """Drain queue + active slots; returns completions in finish order.

        ``pipelined`` hides each poll's host round trip behind device work:
        the stop flags are snapshotted ON DEVICE at a poll boundary, the
        next poll_every decode steps are enqueued, and only then is the
        snapshot fetched — the transfer rides while the device decodes
        ahead instead of idling out the tunnel RTT every poll. EOS
        detection thereby lags up to one block (masked idle steps the
        processor's im_end trim discards — the existing poll-slack
        contract, doubled); budget completions come from host mirrors and
        stay exact."""
        out: List[CompletedRequest] = []
        if not pipelined:
            for _ in range(max_steps):
                out.extend(self.step())
                if not self._active and not self._queue:
                    break
            return out
        pending = None  # (device snapshot, slot->request_id) awaiting resolve
        steps = 0
        while True:
            # budget completions are host-knowable (step mirrors): resolve
            # them BEFORE dispatching so a request whose budget completed
            # inside the previous window frees its slot now instead of
            # burning up to another full window of masked overshoot steps
            # (which would exceed the poll_every cache slack submit()
            # reserves, and in paged mode force spurious page growth)
            if self._active:
                out.extend(self._collect(stopped=np.zeros(self.slots, bool)))
            did = 0
            k = min(self.poll_every, max_steps - steps)
            if k > 0 and (self._active or self._queue):
                # one dispatch for the whole poll window; the previous
                # window's flag snapshot is fetched while this block runs
                did = self._dispatch_block(k)
                steps += did
            if pending is not None:
                flags_dev, snap_rids = pending
                flags = np.asarray(jax.device_get(flags_dev))
                # a slot freed+readmitted since the snapshot carries the OLD
                # occupant's flag — only trust flags whose occupant is
                # unchanged
                stopped = np.zeros(self.slots, bool)
                for slot, rid in snap_rids.items():
                    if (slot in self._active
                            and self._active[slot].request_id == rid):
                        stopped[slot] = flags[slot]
                out.extend(self._collect(stopped=stopped))
                pending = None
            if not (self._active or self._queue):
                break
            if did == 0:
                # max_steps exhausted, or (paged) nothing could be admitted
                # this window — either way no progress is possible. Surface
                # any abandoned requests: callers waiting on those ids must
                # be able to tell "drained" from "stuck in queue".
                if self._queue:
                    stuck = [r.request_id for r in self._queue]
                    logging.getLogger(__name__).warning(
                        "batch server run() stopping with %d undrained "
                        "request(s) still queued (ids %s): no progress was "
                        "possible this window (max_steps exhausted or paged "
                        "admission failure)", len(stuck), stuck)
                break
            if self._active:
                pending = (self._snap_flags(),
                           {s: r.request_id for s, r in self._active.items()})
        return out

    def warmup(self, *, prompt_lens=(64,), attend_upto: Optional[int] = None):
        """Compile every program the serving loop can hit, so live traffic
        never stalls on a (minutes-long on this box) remote compile: the
        prefill + insert programs for each prompt-length bucket in
        ``prompt_lens``, the collect transfers, and the decode step at every
        attend bucket up to ``attend_upto`` (default: the full cache).

        Runs real dummy requests through the normal submit/run path (so the
        programs compiled are exactly the serving ones), then drives the
        step program across the remaining attend buckets on the idle state —
        idle rows' cache writes are masked and their out writes drop, and an
        admission overwrites every per-row field, so the extra idle steps
        cannot leak into later requests."""
        assert not self._active and not self._queue, "warmup on a busy server"
        cfg = self.config
        for T in prompt_lens:
            g = np.full((int(T), cfg.channels), cfg.audio_pad_code, np.int64)
            g[:, 0] = cfg.pad_token_id
            g[-1, 0] = cfg.audio_assistant_gen_slot_token_id
            self.submit(g, max_new_tokens=2)
        self.run()
        if self.paged:
            # compile the page-growth table write too (first fires mid-serve
            # when a slot's pos crosses a page boundary; the dummy requests
            # above are too short to hit it). Python-int args to match
            # _grow_pages' weak-typed jit signature. Rows are cleared
            # post-run, so writing 0 to cell (0, 0) changes nothing.
            self.state = self.state._replace(
                cache=self.state.cache._replace(
                    table=self._table_entry_fn()(
                        self.state.cache.table, 0, 0, 0)))
        upto = min(attend_upto or self.cache_len, self.cache_len)
        pos, seen = 2, set()
        idle = (jnp.zeros(self.slots, bool),  # watch: nothing, exits at once
                jnp.zeros(self.slots, jnp.int32), jnp.int32(0))
        while True:
            a = attend_bucket(pos, 256, self.cache_len)
            if a not in seen:
                seen.add(a)
                self.state = self._step_fn(a)(
                    self.params, self.state, self._batch_sampling_dev())
                # the pipelined run() dispatches poll_every-step blocks
                self.state = self._block_fn(a, self.poll_every)(
                    self.params, self.state, self._batch_sampling_dev())
                # run_events' event block (0-cap: compiles, executes no step)
                self.state, _i = self._event_fn(a)(
                    self.params, self.state, self._batch_sampling_dev(),
                    *idle)
            if a >= upto:
                break
            pos = a + 1
        jax.device_get(self.state.pos)  # wait out the compiles

    @property
    def utilization(self) -> float:
        return len(self._active) / self.slots
