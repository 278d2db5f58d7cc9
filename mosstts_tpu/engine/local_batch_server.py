"""Continuous-batching server for the Local (depth-transformer) family.

The Local 1.7B is the reference's best-quality checkpoint
(docs/moss_tts_model_card.md:427); this gives it the same production
serving story as the Delay and Realtime families: a slot pool decodes
frames in lock-step (backbone step + O(Nq) cached depth scan per frame),
finished slots admit queued requests mid-flight (batch-1 prefill spliced
into the running state), zero host syncs per decode step, and the
completion flags polled every ``poll_every`` steps.

Enabled by LocalGenState accepting (B,) per-row pos/step cursors
(models/local.py local_frame_step): each slot's backbone KV writes at its
own cursor, only ADVANCING rows validate their next cache slot, and
stopped/idle rows freeze.
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LocalConfig
from ..models.local import (
    LocalGenState,
    LocalSampling,
    local_frame_step,
    local_prefill_split,
    make_local_sampling,
)
from ..nn.qwen3 import init_kv_cache
from .delay_engine import attend_bucket


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class _LocalRequest:
    request_id: int
    input_ids: np.ndarray  # (T, C)
    max_new_tokens: int


@dataclass
class CompletedLocal:
    request_id: int
    start_length: int
    tokens: np.ndarray  # ids from last audio_start (engine-format output)
    steps: int


def _insert_local_row(big: LocalGenState, small: LocalGenState, row, pos0) -> LocalGenState:
    """Splice a batch-1 scalar-cursor prefilled state into slot ``row``
    (traced row/pos0: one compiled program for every slot)."""
    cache = type(big.cache)(*(
        bf.at[:, row].set(sf[:, 0]) for bf, sf in zip(big.cache, small.cache)
    ))
    return LocalGenState(
        cache=cache,
        kv_valid=big.kv_valid.at[row].set(small.kv_valid[0]),
        cur_ids=big.cur_ids.at[row].set(small.cur_ids[0]),
        pos=big.pos.at[row].set(pos0),
        step=big.step.at[row].set(0),
        rng=big.rng,
        unfinished=big.unfinished.at[row].set(True),
        seen_text=big.seen_text.at[row].set(small.seen_text[0]),
        seen_audio=big.seen_audio.at[row].set(small.seen_audio[0]),
        out=big.out.at[row].set(
            jnp.zeros_like(big.out[row]).at[: small.out.shape[1]].set(small.out[0])
        ),
    )


class LocalBatchServer:
    def __init__(
        self,
        params,
        config: LocalConfig,
        *,
        slots: int = 8,
        cache_len: int = 1024,
        out_capacity: int = 256,
        prompt_bucket: int = 32,
        dtype=jnp.bfloat16,
        layers: Optional[List[dict]] = None,
        do_samples: Optional[List[bool]] = None,
        n_vq_for_inference: Optional[int] = None,
        eos_token_id: int = 151653,
        poll_every: int = 4,
    ):
        self.params = params
        self.config = config
        self.slots = slots
        self.cache_len = cache_len
        self.out_capacity = out_capacity
        self.prompt_bucket = prompt_bucket
        self.dtype = dtype
        self.sampling: LocalSampling = make_local_sampling(
            layers, do_samples, config.channels)
        self.n_vq_infer = int(n_vq_for_inference or config.n_vq)
        self.eos_token_id = eos_token_id
        self.poll_every = poll_every

        self._jit: Dict[Any, Any] = {}
        self._ids = itertools.count()
        self._queue: List[_LocalRequest] = []
        self._active: Dict[int, _LocalRequest] = {}
        self.state = self._empty_state()
        self.total_steps = 0
        self.util_sum = 0.0  # sum over steps of active/slots (mean = /total_steps)
        self._pos_host = np.zeros(slots, np.int64)  # upper bound (freezes lag)
        self._step_host = np.full(slots, 1 << 30, np.int64)

    # ------------------------------------------------------------------
    def _empty_state(self) -> LocalGenState:
        B, C = self.slots, self.config.channels
        lc = self.config.language_config
        Va = self.config.audio_emb_vocab
        return LocalGenState(
            cache=init_kv_cache(lc, B, self.cache_len, dtype=self.dtype),
            kv_valid=jnp.zeros((B, self.cache_len), jnp.bool_),
            cur_ids=jnp.zeros((B, 1, C), jnp.int32),
            pos=jnp.zeros((B,), jnp.int32),
            step=jnp.zeros((B,), jnp.int32),
            rng=jax.random.PRNGKey(0),
            unfinished=jnp.zeros((B,), jnp.bool_),  # idle slots are frozen
            seen_text=jnp.zeros((B, lc.vocab_size), jnp.bool_),
            seen_audio=jnp.zeros((B, self.config.n_vq, Va), jnp.bool_),
            out=jnp.zeros((B, self.out_capacity, C), jnp.int32),
        )

    def _prefill_fn(self, T: int):
        key = ("prefill", T)
        if key not in self._jit:
            cfg, dt, nv = self.config, self.dtype, self.n_vq_infer
            cl, oc = self.cache_len, self.out_capacity
            self._jit[key] = jax.jit(
                lambda p, ids, mask, rng: local_prefill_split(
                    p, cfg, ids, mask, max_new_tokens=oc, cache_len=cl,
                    rng=rng, n_vq_infer=nv, dtype=dt,
                )
            )
        return self._jit[key]

    def _step_fn(self, attend: int):
        key = ("step", attend)
        if key not in self._jit:
            cfg, nv, eos = self.config, self.n_vq_infer, self.eos_token_id
            self._jit[key] = jax.jit(
                lambda p, st, s: local_frame_step(
                    p, cfg, st, s, n_vq_infer=nv, eos_token_id=eos,
                    attend_len=attend,
                ),
                donate_argnums=(1,),
            )
        return self._jit[key]

    def _block_fn(self, attend: int, k: int):
        """ONE device program = ``k`` frame steps (lax.fori_loop over the
        step). Amortizes the fixed per-dispatch floor (~30 ms on this
        tunnel) over k steps — see DelayBatchServer._block_fn for the
        measured rationale; the poll contract is unchanged."""
        key = ("block", attend, k)
        if key not in self._jit:
            cfg, nv, eos = self.config, self.n_vq_infer, self.eos_token_id

            def block(p, st, s):
                return jax.lax.fori_loop(
                    0, k,
                    lambda i, cur: local_frame_step(
                        p, cfg, cur, s, n_vq_infer=nv, eos_token_id=eos,
                        attend_len=attend),
                    st)

            self._jit[key] = jax.jit(block, donate_argnums=(1,))
        return self._jit[key]

    def _dispatch_block(self, k: int) -> int:
        """Admit, then enqueue ONE k-step block program; returns steps
        dispatched. Budget overshoot is bounded by k-1 <= poll_every-1
        frames (submit() reserves poll_every cache slack); EOS-frozen rows
        hold their device cursor, so the host mirrors only over-count
        (attend bucket over-estimate — safe)."""
        self._fill_free_slots()
        if not self._active:
            return 0
        active = sorted(self._active)
        max_pos = int(self._pos_host[active].max())
        attend = attend_bucket(max_pos + k + 1, 256, self.cache_len)
        self.state = self._block_fn(attend, k)(
            self.params, self.state, self.sampling)
        self.total_steps += k
        self.util_sum += k * (len(self._active) / self.slots)
        self._pos_host[active] += k
        self._step_host[active] += k
        return k

    def step_block(self, k: Optional[int] = None) -> List[CompletedLocal]:
        """One poll window in a single dispatch: admit, run ``k`` (default
        poll_every) frame steps as ONE device program, then collect."""
        k = self.poll_every if k is None else k
        if self._dispatch_block(k) == 0:
            return []
        return self._collect()

    def _event_fn(self, attend: int):
        """ONE device program = frames UNTIL A SCHEDULING EVENT (any active
        slot finishes or exhausts its budget), watched on device by the
        while_loop cond — the delay server's run_events recipe
        (engine/batch_server.py:_event_fn) on the local frame loop."""
        key = ("event", attend)
        if key not in self._jit:
            cfg, nv, eos = self.config, self.n_vq_infer, self.eos_token_id

            def run_block(p, st, s, w, bl, kc):
                def cond(carry):
                    cur, i = carry
                    event = w & (~cur.unfinished | (i >= bl))
                    return (i < kc) & ~jnp.any(event)

                def body(carry):
                    cur, i = carry
                    cur = local_frame_step(
                        p, cfg, cur, s, n_vq_infer=nv, eos_token_id=eos,
                        attend_len=attend)
                    return cur, i + 1

                return jax.lax.while_loop(cond, body, (st, jnp.int32(0)))

            self._jit[key] = jax.jit(run_block, donate_argnums=(1,))
        return self._jit[key]

    def _dispatch_event(self, max_k: int):
        """Admit, then one event block; returns ``(steps_executed,
        finished_mask | None)`` — the mask rides the same transfer as the
        counter, and no admission happens in between."""
        self._fill_free_slots()
        if not self._active:
            return 0, None
        active = sorted(self._active)
        max_pos = int(self._pos_host[active].max())
        attend = attend_bucket(max_pos + 2, 256, self.cache_len)
        k_bucket = attend - max_pos - 1
        budget = np.full(self.slots, 1 << 30, np.int64)
        for s, req in self._active.items():
            budget[s] = req.max_new_tokens - self._step_host[s]
        k_cap = int(min(max_k, k_bucket, int(budget[active].min())))
        if k_cap <= 0:
            return 0, None
        watch = np.zeros(self.slots, bool)
        watch[active] = True
        st, i_dev = self._event_fn(attend)(
            self.params, self.state, self.sampling,
            jnp.asarray(watch), jnp.asarray(budget.astype(np.int32)),
            jnp.int32(k_cap))
        self.state = st
        did, unfinished = jax.device_get((i_dev, st.unfinished))
        did = int(did)
        self.total_steps += did
        self.util_sum += did * (len(self._active) / self.slots)
        self._pos_host[active] += did
        self._step_host[active] += did
        return did, ~np.asarray(unfinished)

    def run_events(self, max_steps: int = 100000) -> List[CompletedLocal]:
        """Drain queue + active slots with EVENT-DRIVEN dispatch (device-
        side stop-flag polling; see DelayBatchServer.run_events). Frame
        streams are identical to run() — only dispatch grouping differs."""
        done: List[CompletedLocal] = []
        steps = 0
        while True:
            if self._active:
                # budget completions are host-knowable: free those slots
                # before dispatching so the block admits into them
                done.extend(self._collect(
                    finished_mask=np.zeros(self.slots, bool)))
            if not (self._active or self._queue):
                break
            did, finished = self._dispatch_event(max_steps - steps)
            steps += did
            collected = 0
            if finished is not None:
                got = self._collect(finished_mask=finished)
                collected = len(got)
                done.extend(got)
            if did == 0 and collected == 0:
                if self._queue:
                    import logging

                    logging.getLogger(__name__).warning(
                        "run_events() stopping with %d undrained request(s)"
                        " still queued", len(self._queue))
                break
        return done

    def _insert_fn(self):
        if "insert" not in self._jit:
            self._jit["insert"] = jax.jit(_insert_local_row, donate_argnums=(0,))
        return self._jit["insert"]

    # ------------------------------------------------------------------
    def submit(self, input_ids: np.ndarray, *, max_new_tokens: int = 256) -> int:
        input_ids = np.asarray(input_ids, np.int64)
        if input_ids.ndim != 2 or input_ids.shape[1] != self.config.channels:
            raise ValueError(f"expected (T, {self.config.channels}) grid")
        Tb = _round_up(input_ids.shape[0], self.prompt_bucket)
        max_new_tokens = min(max_new_tokens, self.out_capacity)
        if Tb + max_new_tokens + self.poll_every > self.cache_len:
            raise ValueError(
                f"prompt ({Tb}) + max_new_tokens ({max_new_tokens}) exceeds "
                f"cache_len={self.cache_len}")
        rid = next(self._ids)
        self._queue.append(_LocalRequest(
            request_id=rid, input_ids=input_ids,
            max_new_tokens=max_new_tokens))
        return rid

    def _admit(self, slot: int, req: _LocalRequest):
        cfg = self.config
        T = req.input_ids.shape[0]
        Tb = _round_up(T, self.prompt_bucket)
        ids = np.full((1, Tb, cfg.channels), cfg.audio_pad_code, np.int64)
        ids[..., 0] = cfg.pad_token_id
        ids[0, Tb - T:] = req.input_ids
        mask = np.zeros((1, Tb), bool)
        mask[0, Tb - T:] = True
        rng = jax.random.PRNGKey(hash((0x10CA1, req.request_id)) & 0x7FFFFFFF)
        small = self._prefill_fn(Tb)(
            self.params, jnp.asarray(ids), jnp.asarray(mask), rng)
        # local_prefill_split leaves pos = Tb-1 (the cur_ids row's slot)
        self.state = self._insert_fn()(
            self.state, small, jnp.int32(slot), jnp.int32(Tb - 1))
        self._active[slot] = req
        self._pos_host[slot] = Tb - 1
        self._step_host[slot] = 0

    def _fill_free_slots(self):
        busy = set(self._active)
        for slot in range(self.slots):
            if not self._queue:
                break
            if slot not in busy:
                self._admit(slot, self._queue.pop(0))

    # ------------------------------------------------------------------
    def step(self, *, poll: Optional[bool] = None) -> List[CompletedLocal]:
        self._fill_free_slots()
        if not self._active:
            return []
        active = sorted(self._active)
        max_pos = int(self._pos_host[active].max())
        attend = attend_bucket(max_pos + 2, 256, self.cache_len)
        self.state = self._step_fn(attend)(self.params, self.state, self.sampling)
        self.total_steps += 1
        self.util_sum += len(self._active) / self.slots
        self._pos_host[active] += 1
        self._step_host[active] += 1

        if poll is None:
            poll = (
                self.total_steps % self.poll_every == 0
                or any(self._step_host[s] >= self._active[s].max_new_tokens
                       for s in active)
            )
        return self._collect() if poll else []

    def _collect(self, finished_mask: Optional[np.ndarray] = None
                 ) -> List[CompletedLocal]:
        if finished_mask is None:
            finished_mask = ~np.asarray(jax.device_get(self.state.unfinished))
        finished = [
            (slot, req) for slot, req in sorted(self._active.items())
            if finished_mask[slot]
            or self._step_host[slot] >= req.max_new_tokens
        ]
        if not finished:
            return []
        outs_all = np.asarray(jax.device_get(self.state.out))
        cfg = self.config
        done: List[CompletedLocal] = []
        for slot, req in finished:
            n = int(min(self._step_host[slot], req.max_new_tokens,
                        self.out_capacity))
            gen = outs_all[slot, :n]
            # trim AFTER the first EOS row on the text channel (the engine
            # keeps the eos frame; frames beyond it are freeze repeats)
            eos = np.nonzero(gen[:, 0] == self.eos_token_id)[0]
            if len(eos):
                gen = gen[: int(eos[0]) + 1]
            full = np.concatenate(
                [req.input_ids, gen.astype(np.int64)], axis=0)
            T = req.input_ids.shape[0]
            matches = np.nonzero(full[:, 0] == cfg.audio_start_token_id)[0]
            start_idx = int(matches[-1]) if len(matches) else 0
            done.append(CompletedLocal(
                request_id=req.request_id,
                start_length=T - start_idx - 1,  # reference :472
                tokens=full[start_idx:],
                steps=len(gen),
            ))
            del self._active[slot]
            self._step_host[slot] = 1 << 30
            self.state = self.state._replace(
                unfinished=self.state.unfinished.at[slot].set(False))
        return done

    def _snap_flags(self):
        """On-device copy of the run flags (the step donates the state, so a
        raw reference would point at a donated buffer after the next step);
        fetching the copy later overlaps the transfer with device work."""
        if "snap" not in self._jit:
            self._jit["snap"] = jax.jit(lambda x: jnp.logical_or(x, False))
        return self._jit["snap"](self.state.unfinished)

    def run(self, max_steps: int = 100000,
            pipelined: bool = True) -> List[CompletedLocal]:
        """Drain queue + active slots; returns completions in finish order.

        ``pipelined`` hides each poll's host round trip behind device work
        (snapshot the flags on device, enqueue the next block, then fetch
        the snapshot while the device decodes ahead). EOS detection lags up
        to one block (freeze-repeat frames the EOS trim discards — the
        poll-slack contract, doubled); budget completions come from host
        mirrors and stay exact."""
        done: List[CompletedLocal] = []
        if not pipelined:
            for _ in range(max_steps):
                done.extend(self.step())
                if not self._active and not self._queue:
                    break
            return done
        pending = None  # (device snapshot, slot->request_id) awaiting resolve
        steps = 0
        while True:
            did = 0
            k = min(self.poll_every, max_steps - steps)
            if k > 0 and (self._active or self._queue):
                # one dispatch for the whole poll window; the previous
                # window's flag snapshot is fetched while this block runs
                did = self._dispatch_block(k)
                steps += did
            if pending is not None:
                flags_dev, snap_rids = pending
                unfinished = np.asarray(jax.device_get(flags_dev))
                # a slot freed+readmitted since the snapshot carries the OLD
                # occupant's flag — only trust flags whose occupant is
                # unchanged
                finished = np.zeros(self.slots, bool)
                for slot, rid in snap_rids.items():
                    if (slot in self._active
                            and self._active[slot].request_id == rid):
                        finished[slot] = not unfinished[slot]
                done.extend(self._collect(finished_mask=finished))
                pending = None
            if not (self._active or self._queue):
                break
            if did == 0:
                break  # max_steps exhausted: no progress possible
            if self._active:
                pending = (self._snap_flags(),
                           {s: r.request_id for s, r in self._active.items()})
        return done

    def warmup(self, *, prompt_lens=(32,), attend_upto: Optional[int] = None):
        """Compile every program the serving loop can hit (mirrors
        DelayBatchServer.warmup): the prefill + insert programs for each
        prompt-length bucket, and the step + block programs at every attend
        bucket up to ``attend_upto``. Idle rows are frozen (unfinished is
        False), so the extra idle steps cannot leak into later requests."""
        assert not self._active and not self._queue, "warmup on a busy server"
        cfg = self.config
        for T in prompt_lens:
            g = np.full((int(T), cfg.channels), cfg.audio_pad_code, np.int64)
            g[:, 0] = cfg.pad_token_id
            g[min(2, T - 1), 0] = cfg.audio_start_token_id
            self.submit(g, max_new_tokens=2)
        self.run()
        upto = min(attend_upto or self.cache_len, self.cache_len)
        pos, seen = 2, set()
        idle = (jnp.zeros(self.slots, bool),  # watch nothing: exits at once
                jnp.zeros(self.slots, jnp.int32), jnp.int32(0))
        while True:
            a = attend_bucket(pos, 256, self.cache_len)
            if a not in seen:
                seen.add(a)
                self.state = self._step_fn(a)(
                    self.params, self.state, self.sampling)
                self.state = self._block_fn(a, self.poll_every)(
                    self.params, self.state, self.sampling)
                # run_events' event block (0-cap: compiles, runs no frame)
                self.state, _i = self._event_fn(a)(
                    self.params, self.state, self.sampling, *idle)
            if a >= upto:
                break
            pos = a + 1
        jax.device_get(self.state.pos)  # wait out the compiles

    @property
    def utilization(self) -> float:
        return len(self._active) / self.slots
