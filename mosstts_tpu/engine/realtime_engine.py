"""Step-wise inference engine for MossTTSRealtime (prefill/step/finish API).

Contract parity with the reference ``MossTTSRealtimeInference``
(streaming_mossttsrealtime.py:35-418), TPU-native: the carried state is a
pytree of static-shape buffers (donated between steps) and every frame is a
single jitted program. Multi-turn context reuse = keeping the state and
concatenating the new turn's rows at the cache cursor (:78-87,177-179).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import RealtimeConfig
from ..models.realtime import (
    RealtimeState,
    init_realtime_params,
    init_realtime_state,
    make_rt_sampling,
    realtime_decode_step,
    realtime_prefill_step,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class RealtimeEngine:
    """prefill/step/finish over a carried RealtimeState."""

    def __init__(
        self,
        params,
        config: RealtimeConfig,
        *,
        dtype=jnp.bfloat16,
        max_length: int = 1000,
        cache_len: int = 4096,
        max_context: int = 32768,
        prefill_bucket: int = 16,
        top_k: int = 30,
    ):
        self.params = params
        self.config = config
        self.dtype = dtype
        self.max_length = max_length
        self.cache_len = cache_len
        self.max_context = max_context
        self.prefill_bucket = prefill_bucket
        self.top_k = top_k
        self._jit: Dict[Any, Any] = {}

        self.state: Optional[RealtimeState] = None
        # self._generated holds np frames AND in-flight device handles; frames
        # are fetched in batches (one tunnel round-trip for K frames) instead
        # of per step — host<->device latency dominated the per-frame cost.
        self._generated: List[Any] = []
        self._batch: Optional[int] = None
        self._seed = 0
        # host mirrors of device state, so the hot step path never blocks on
        # a device read: cache cursor and per-row sticky EOS
        self._host_len = 0
        self._stopped: Optional[np.ndarray] = None

    @classmethod
    def random_init(cls, seed: int = 0, config: Optional[RealtimeConfig] = None,
                    dtype=jnp.float32, **kw) -> "RealtimeEngine":
        config = config or RealtimeConfig()
        params = init_realtime_params(jax.random.PRNGKey(seed), config, dtype=dtype)
        return cls(params, config, dtype=dtype, **kw)

    def quantize(self, mode: str = "int8"):
        """Weight-only int8 serving quantization (see ops.quant)."""
        if mode != "int8":
            raise ValueError(f"unknown quantization mode: {mode}")
        from ..ops.quant import quantize_tree

        self.params = quantize_tree(self.params)
        self._jit.clear()
        return self

    # ------------------------------------------------------------------
    @property
    def is_finished(self) -> bool:
        """Host-side: sticky EOS derived from fetched frames — no device
        read. In-flight (unfetched) frames may already contain an EOS; that
        only means a few extra no-op steps get enqueued (stopped rows freeze
        their frame on device)."""
        if self._stopped is None:
            return False
        return bool(self._stopped.all())

    @property
    def generated_tokens(self) -> List[np.ndarray]:
        self._materialize_generated()
        return list(self._generated)

    def reset_generation_state(self, keep_cache: bool = True):
        """Start a new turn; with keep_cache the backbone KV (and mask)
        carries over for multi-turn context (reference :78-87)."""
        self._generated = []
        self._stopped = None
        if not keep_cache or self.state is None:
            self.state = None
            self._host_len = 0
        else:
            self.state = self.state._replace(
                is_stopping=jnp.zeros_like(self.state.is_stopping),
                last_audio=jnp.full_like(self.state.last_audio, self.config.audio_pad_token),
                hist_len=jnp.int32(0),
            )

    # ------------------------------------------------------------------
    def _note_frames(self, frames_np: np.ndarray):
        """Update the host EOS mirror from fetched frames (B, rvq) or
        (T, B, rvq)."""
        if self._stopped is None:
            return
        f = frames_np if frames_np.ndim == 3 else frames_np[None]
        eos = (f[..., 0] == self.config.audio_eos_token).any(axis=0)
        self._stopped |= eos

    def fetch_frames(self, handles: List[jax.Array]) -> List[np.ndarray]:
        """Fetch K in-flight frames in ONE host transfer: stack on device,
        single device_get (each individual fetch costs a tunnel round-trip;
        the stack is free)."""
        if not handles:
            return []
        stacked = np.asarray(jax.device_get(jnp.stack(handles)))  # (K, B, rvq)
        self._note_frames(stacked)
        return [stacked[i] for i in range(stacked.shape[0])]

    def _materialize_generated(self):
        pending = [(i, h) for i, h in enumerate(self._generated)
                   if not isinstance(h, np.ndarray)]
        if not pending:
            return
        fetched = self.fetch_frames([h for _, h in pending])
        for (i, _), f in zip(pending, fetched):
            self._generated[i] = f

    # ------------------------------------------------------------------
    def _prefill_fn(self, T: int, attend_len=None):
        key = ("prefill", T, attend_len, self.top_k)
        if key not in self._jit:
            cfg, tk = self.config, self.top_k
            self._jit[key] = jax.jit(
                lambda p, st, ids, rv, s: realtime_prefill_step(
                    p, cfg, st, ids, rv, s, top_k=tk, attend_len=attend_len
                ),
                donate_argnums=(1,),
            )
        return self._jit[key]

    def _step_fn(self, attend_len=None):
        key = ("step", attend_len, self.top_k)
        if key not in self._jit:
            cfg, tk = self.config, self.top_k
            self._jit[key] = jax.jit(
                lambda p, st, t, s: realtime_decode_step(
                    p, cfg, st, t, s, top_k=tk, attend_len=attend_len
                ),
                donate_argnums=(1,),
            )
        return self._jit[key]

    def _ensure_capacity(self, needed_total: int):
        """Grow the backbone cache toward ``max_context`` (32K ~ 40 min of
        multi-turn dialogue, docs/moss_tts_realtime_model_card.md:17) instead
        of overflowing; doubles the S dimension and pads state buffers."""
        if needed_total <= self.cache_len or self.state is None:
            return
        from .delay_engine import attend_bucket
        from ..nn.qwen3 import KVCache
        import jax.numpy as jnp

        new_len = attend_bucket(needed_total, self.cache_len, self.max_context)
        if new_len < needed_total:
            raise RuntimeError(
                f"conversation exceeds max_context={self.max_context} slots; "
                "reset the conversation."
            )
        pad = new_len - self.cache_len
        st = self.state
        kpad = jnp.zeros(st.cache.k.shape[:3] + (pad, st.cache.k.shape[4]), st.cache.k.dtype)
        self.state = st._replace(
            cache=KVCache(
                jnp.concatenate([st.cache.k, kpad], axis=3),
                jnp.concatenate([st.cache.v, kpad], axis=3),
            ),
            kv_valid=jnp.concatenate(
                [st.kv_valid, jnp.zeros((st.kv_valid.shape[0], pad), jnp.bool_)], axis=1
            ),
        )
        self.cache_len = new_len

    def _attend_bucket(self, needed: int) -> int:
        from .delay_engine import attend_bucket

        return attend_bucket(needed, max(self.prefill_bucket, 128), self.cache_len)

    # ------------------------------------------------------------------
    def _normalize_input_ids(self, input_ids) -> List[np.ndarray]:
        if isinstance(input_ids, np.ndarray):
            if input_ids.ndim == 2:
                return [input_ids]
            if input_ids.ndim == 3:
                return [input_ids[i] for i in range(input_ids.shape[0])]
        if isinstance(input_ids, (list, tuple)):
            return [np.asarray(x) for x in input_ids]
        raise ValueError("input_ids must be [T, C] or [B, T, C] or a list of [T, C].")

    def _normalize_text_prefix(self, text_prefix_ids, batch: int) -> List[List[int]]:
        if text_prefix_ids is None:
            raise ValueError("text_prefix_ids must be provided for prefill.")
        if isinstance(text_prefix_ids, np.ndarray):
            text_prefix_ids = text_prefix_ids.tolist()
        if isinstance(text_prefix_ids, (list, tuple)):
            if len(text_prefix_ids) == 0:
                return [[] for _ in range(batch)]
            if isinstance(text_prefix_ids[0], (int, np.integer)):
                return [list(text_prefix_ids)]
            if len(text_prefix_ids) == 1 and batch > 1:
                return [list(text_prefix_ids[0])] * batch
            if len(text_prefix_ids) != batch:
                raise ValueError("text_prefix_ids batch size mismatch.")
            return [list(x) for x in text_prefix_ids]
        raise ValueError("text_prefix_ids must be list-like.")

    # ------------------------------------------------------------------
    def prefill(
        self,
        input_ids,
        text_prefix_ids,
        *,
        max_prefill_len: Optional[int] = None,
        temperature: float = 0.8,
        top_p: float = 0.6,
        top_k: int = 30,
        do_sample: bool = True,
        repetition_penalty: Optional[float] = 1.1,
        seed: Optional[int] = None,
        text_pad_id: int = 151655,
        pad_token_id: int = 151643,
    ) -> np.ndarray:
        """Turn grid + first <=12 text rows (audio_bos planted on the last
        prefix row's channel 1), left-pad batch, backbone prefill, first
        frame (reference :122-208). Returns the first frame (B, rvq)."""
        cfg = self.config
        grids = self._normalize_input_ids(input_ids)
        B = len(grids)
        prefixes = self._normalize_text_prefix(text_prefix_ids, B)

        rows = []
        for grid, prefix in zip(grids, prefixes):
            if max_prefill_len is not None:
                prefix = prefix[:max_prefill_len]
            if len(prefix) == 0:
                raise ValueError("Prefill requires at least one text token.")
            seg = np.full((len(prefix), cfg.rvq + 1), cfg.audio_pad_token, np.int64)
            seg[:, 0] = prefix
            seg[len(prefix) - 1, 1] = cfg.audio_bos_token
            rows.append(np.concatenate([np.asarray(grid, np.int64), seg], axis=0))

        max_len = max(r.shape[0] for r in rows)
        max_len = _round_up(max_len, self.prefill_bucket)
        ids = np.full((B, max_len, cfg.rvq + 1), cfg.audio_pad_token, np.int64)
        ids[..., 0] = pad_token_id
        valid = np.zeros((B, max_len), bool)
        for i, r in enumerate(rows):
            ids[i, max_len - r.shape[0]:] = r
            valid[i, max_len - r.shape[0]:] = True

        self.top_k = top_k
        sampling = make_rt_sampling(temperature, top_p, repetition_penalty, do_sample)
        if self.state is None or self._batch != B:
            if seed is not None:
                self._seed = seed
            self.state = init_realtime_state(
                cfg, B, self.cache_len, self.max_length + 64,
                jax.random.PRNGKey(self._seed), dtype=self.dtype,
            )
            self._batch = B
            self._host_len = 0
        # capacity check (cache overflow would silently clamp); the cursor is
        # mirrored on host so no device read is needed
        used = self._host_len
        self._ensure_capacity(used + max_len)

        attend = self._attend_bucket(used + max_len)
        self.state, frame = self._prefill_fn(max_len, attend)(
            self.params, self.state, jnp.asarray(ids), jnp.asarray(valid), sampling
        )
        self._host_len = used + max_len
        self._stopped = np.zeros((B,), bool)
        frame_np = np.asarray(jax.device_get(frame))
        self._note_frames(frame_np)
        self._generated = [frame_np]
        return frame_np

    def step_async(
        self,
        text_token,
        *,
        temperature: float = 0.8,
        top_p: float = 0.6,
        top_k: int = 30,
        do_sample: bool = True,
        repetition_penalty: Optional[float] = 1.1,
        text_pad_id: int = 151655,
    ) -> jax.Array:
        """Enqueue one frame step and return the in-flight device handle
        WITHOUT waiting (~0.2 ms). The state dependency chains on device, so
        callers can enqueue many steps back-to-back and then fetch all frames
        in one transfer via ``fetch_frames`` — per-frame host<->device round
        trips (tens of ms over a remote tunnel) were the dominant realtime
        latency, not the 10 ms on-device step."""
        if self.state is None or not self._generated:
            raise ValueError("You must call prefill() before step().")
        B = self._batch
        if text_token is None:
            toks = [text_pad_id] * B
        elif isinstance(text_token, (int, np.integer)):
            toks = [int(text_token)]
        elif isinstance(text_token, np.ndarray):
            toks = text_token.tolist()
        else:
            toks = list(text_token)
        if len(toks) != B:
            raise ValueError(f"text_token batch size mismatch: got {len(toks)}, expected {B}.")
        self._ensure_capacity(self._host_len + 1)

        sampling = make_rt_sampling(temperature, top_p, repetition_penalty, do_sample)
        attend = self._attend_bucket(self._host_len + 1)
        self.state, frame = self._step_fn(attend)(
            self.params, self.state, jnp.asarray(toks, jnp.int32), sampling
        )
        self._host_len += 1
        self._generated.append(frame)
        return frame

    def step(self, text_token, **kw) -> np.ndarray:
        """Synchronous single frame step (prefill() must come first)."""
        if self.is_finished:
            self._materialize_generated()
            return self._generated[-1]
        handle = self.step_async(text_token, **kw)
        frame_np = self.fetch_frames([handle])[0]
        self._generated[-1] = frame_np
        return frame_np

    def step_block(self, token_rows: List, **kw) -> List[np.ndarray]:
        """Enqueue one step per entry of ``token_rows`` (each a per-batch
        token list, or None for pads) and fetch all frames in one transfer."""
        if self.is_finished or not token_rows:
            return []
        start = len(self._generated)
        handles = [self.step_async(t, **kw) for t in token_rows]
        frames = self.fetch_frames(handles)
        for i, f in enumerate(frames):
            self._generated[start + i] = f
        return frames

    def finish(self, max_steps: Optional[int] = None, drain_block: int = 8,
               **sampling_kw) -> List[np.ndarray]:
        """Drain with text pads until EOS (reference :273-299). Steps are
        enqueued in ``drain_block`` batches and fetched with one transfer per
        block — EOS is detected up to a block late; the surplus frames are
        frozen repeats that downstream EOS-sanitization drops."""
        outputs: List[np.ndarray] = []
        steps_left = max_steps if max_steps is not None else self.max_length
        while steps_left > 0 and not self.is_finished:
            block = min(drain_block, steps_left)
            start = len(self._generated)
            handles = [self.step_async(None, **sampling_kw) for _ in range(block)]
            frames = self.fetch_frames(handles)
            for i, f in enumerate(frames):
                self._generated[start + i] = f
            steps_left -= block
            outputs.extend(frames)
        return outputs

    # ------------------------------------------------------------------
    def generate(
        self,
        input_ids,
        text_ids: List[List[int]],
        *,
        max_length: Optional[int] = None,
        prefill_text_len: int = 12,
        text_pad_id: int = 151655,
        **sampling_kw,
    ) -> List[np.ndarray]:
        """Non-streaming batch path (reference inferencer.py:178-297): feed
        one real text token per frame while any remains, then pads."""
        self.reset_generation_state(keep_cache=False)
        grids = self._normalize_input_ids(input_ids)
        B = len(grids)
        prefixes = [t[:prefill_text_len] for t in text_ids]
        rest = [t[prefill_text_len:] for t in text_ids]
        self.prefill(grids, prefixes, **sampling_kw)
        limit = max_length or self.max_length
        step_i = 0
        while not self.is_finished and step_i < limit:
            # pipeline a block of steps, then one fetch for the whole block
            block = min(8, limit - step_i)
            start = len(self._generated)
            handles = []
            for _ in range(block):
                toks = [
                    rest[b][step_i] if step_i < len(rest[b]) else text_pad_id
                    for b in range(B)
                ]
                handles.append(self.step_async(toks, text_pad_id=text_pad_id,
                                               **sampling_kw))
                step_i += 1
            for i, f in enumerate(self.fetch_frames(handles)):
                self._generated[start + i] = f
        self._materialize_generated()
        frames = np.stack(self._generated, axis=1)  # (B, T, rvq)
        out = []
        for b in range(B):
            row = frames[b]
            eos = np.nonzero(row[:, 0] == self.config.audio_eos_token)[0]
            out.append(row[: int(eos[0])] if len(eos) else row)
        return out
