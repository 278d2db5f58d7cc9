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
        self._generated: List[np.ndarray] = []
        self._batch: Optional[int] = None
        self._seed = 0

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
        if self.state is None:
            return False
        return bool(jax.device_get(self.state.is_stopping).all())

    @property
    def generated_tokens(self) -> List[np.ndarray]:
        return list(self._generated)

    def reset_generation_state(self, keep_cache: bool = True):
        """Start a new turn; with keep_cache the backbone KV (and mask)
        carries over for multi-turn context (reference :78-87)."""
        self._generated = []
        if not keep_cache or self.state is None:
            self.state = None
        else:
            self.state = self.state._replace(
                is_stopping=jnp.zeros_like(self.state.is_stopping),
                last_audio=jnp.full_like(self.state.last_audio, self.config.audio_pad_token),
                hist_len=jnp.int32(0),
            )

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
        kpad = jnp.zeros(st.cache.k.shape[:2] + (pad,) + st.cache.k.shape[3:], st.cache.k.dtype)
        self.state = st._replace(
            cache=KVCache(
                jnp.concatenate([st.cache.k, kpad], axis=2),
                jnp.concatenate([st.cache.v, kpad], axis=2),
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
        # capacity check (cache overflow would silently clamp)
        used = int(jax.device_get(self.state.cur_len))
        self._ensure_capacity(used + max_len)

        attend = self._attend_bucket(used + max_len)
        self.state, frame = self._prefill_fn(max_len, attend)(
            self.params, self.state, jnp.asarray(ids), jnp.asarray(valid), sampling
        )
        frame_np = np.asarray(jax.device_get(frame))
        self._generated = [frame_np]
        return frame_np

    def step(
        self,
        text_token,
        *,
        temperature: float = 0.8,
        top_p: float = 0.6,
        top_k: int = 30,
        do_sample: bool = True,
        repetition_penalty: Optional[float] = 1.1,
        text_pad_id: int = 151655,
    ) -> np.ndarray:
        if self.state is None or not self._generated:
            raise ValueError("You must call prefill() before step().")
        B = self._batch
        if self.is_finished:
            return self._generated[-1]
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
        used = int(jax.device_get(self.state.cur_len))
        self._ensure_capacity(used + 1)

        sampling = make_rt_sampling(temperature, top_p, repetition_penalty, do_sample)
        attend = self._attend_bucket(used + 1)
        self.state, frame = self._step_fn(attend)(
            self.params, self.state, jnp.asarray(toks, jnp.int32), sampling
        )
        frame_np = np.asarray(jax.device_get(frame))
        self._generated.append(frame_np)
        return frame_np

    def finish(self, max_steps: Optional[int] = None, **sampling_kw) -> List[np.ndarray]:
        """Drain with text pads until EOS (reference :273-299)."""
        outputs = []
        steps_left = max_steps if max_steps is not None else self.max_length
        while steps_left > 0 and not self.is_finished:
            outputs.append(self.step(None, **sampling_kw))
            steps_left -= 1
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
            toks = [
                rest[b][step_i] if step_i < len(rest[b]) else text_pad_id
                for b in range(B)
            ]
            self.step(toks, text_pad_id=text_pad_id, **sampling_kw)
            step_i += 1
        frames = np.stack(self._generated, axis=1)  # (B, T, rvq)
        out = []
        for b in range(B):
            row = frames[b]
            eos = np.nonzero(row[:, 0] == self.config.audio_eos_token)[0]
            out.append(row[: int(eos[0])] if len(eos) else row)
        return out
