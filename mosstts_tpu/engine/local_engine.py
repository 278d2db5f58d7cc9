"""Host-facing generation engine for MossTTSLocal (depth-transformer family).

Mirrors the reference driver contract (moss_tts_local/README.md S7 +
CustomMixin._sample): per-channel sampling config (``layers`` +
``do_samples``), ``n_vq_for_inference`` variable bitrate, EOS on the text
channel, and (start_length, ids-from-last-audio_start) outputs.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LocalConfig
from ..models.local import (
    LocalSampling,
    init_local_params,
    local_frame_step,
    local_prefill_split,
    make_local_sampling,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m

from .delay_engine import attend_bucket


class LocalEngine:
    def __init__(self, params, config: LocalConfig, *, dtype=jnp.bfloat16,
                 cache_bucket: int = 256):
        self.params = params
        self.config = config
        self.dtype = dtype
        self.cache_bucket = cache_bucket
        self._jit: Dict[Any, Any] = {}

    @classmethod
    def random_init(cls, seed: int = 0, config: Optional[LocalConfig] = None,
                    dtype=jnp.bfloat16, **kw) -> "LocalEngine":
        config = config or LocalConfig()
        params = init_local_params(jax.random.PRNGKey(seed), config, dtype=dtype)
        return cls(params, config, dtype=dtype, **kw)

    def quantize(self, mode: str = "int8"):
        """Weight-only int8 serving quantization (see ops.quant)."""
        if mode != "int8":
            raise ValueError(f"unknown quantization mode: {mode}")
        from ..ops.quant import quantize_tree

        self.params = quantize_tree(self.params)
        self._jit.clear()
        return self

    def _prefill_fn(self, max_new: int, cache_len: int, n_vq_infer: int):
        key = ("prefill", max_new, cache_len, n_vq_infer)
        if key not in self._jit:
            cfg, dt = self.config, self.dtype
            self._jit[key] = jax.jit(
                lambda p, ids, mask, rng: local_prefill_split(
                    p, cfg, ids, mask, max_new_tokens=max_new,
                    cache_len=cache_len, rng=rng, n_vq_infer=n_vq_infer, dtype=dt,
                )
            )
        return self._jit[key]

    def _step_fn(self, n_vq_infer: int, eos_token_id: int, attend_len=None):
        key = ("step", n_vq_infer, eos_token_id, attend_len)
        if key not in self._jit:
            cfg = self.config
            self._jit[key] = jax.jit(
                lambda p, st, s: local_frame_step(
                    p, cfg, st, s, n_vq_infer=n_vq_infer,
                    eos_token_id=eos_token_id, attend_len=attend_len,
                ),
                donate_argnums=(1,),
            )
        return self._jit[key]

    def generate(
        self,
        input_ids: np.ndarray,
        attention_mask: Optional[np.ndarray] = None,
        *,
        max_new_tokens: int = 1000,
        layers: Optional[List[dict]] = None,
        do_samples: Optional[List[bool]] = None,
        n_vq_for_inference: Optional[int] = None,
        eos_token_id: int = 151653,
        seed: int = 0,
        poll_every: int = 8,
        streamer=None,
    ) -> List[Tuple[int, np.ndarray]]:
        """``streamer``: optional object with put(np.ndarray)/end() receiving
        each step's text-channel tokens (reference CustomMixin :435-436)."""
        cfg = self.config
        input_ids = np.asarray(input_ids, np.int64)
        B, T, C = input_ids.shape
        if attention_mask is None:
            attention_mask = np.ones((B, T), bool)
        n_vq_infer = int(n_vq_for_inference or cfg.n_vq)
        sampling = make_local_sampling(layers, do_samples, cfg.channels)

        cache_len = _round_up(T + max_new_tokens + 1, self.cache_bucket)
        state = self._prefill_fn(max_new_tokens, cache_len, n_vq_infer)(
            self.params, jnp.asarray(input_ids), jnp.asarray(attention_mask),
            jax.random.PRNGKey(seed),
        )
        steps = 0
        while steps < max_new_tokens:
            attend = attend_bucket(T + steps + 1, self.cache_bucket, cache_len)
            state = self._step_fn(n_vq_infer, eos_token_id, attend)(self.params, state, sampling)
            steps += 1
            if streamer is not None:
                streamer.put(np.asarray(jax.device_get(state.cur_ids))[:, 0, 0])
            if steps % poll_every == 0 and not bool(jax.device_get(state.unfinished).any()):
                break

        if streamer is not None:
            streamer.end()
        out = np.asarray(jax.device_get(state.out))[:, :steps]
        full = np.concatenate([input_ids, out.astype(np.int64)], axis=1)

        results: List[Tuple[int, np.ndarray]] = []
        for b in range(B):
            matches = np.nonzero(full[b, :, 0] == cfg.audio_start_token_id)[0]
            start_idx = int(matches[-1]) if len(matches) else 0
            # reference: start_length = prompt_len - start_idx - 1 (:472)
            start_length = T - start_idx - 1
            results.append((start_length, full[b, start_idx:]))
        return results
