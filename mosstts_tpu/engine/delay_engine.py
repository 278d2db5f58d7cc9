"""Host-facing generation engine for the Delay model family (MOSS-TTS 8B,
MOSS-TTSD, MOSS-VoiceGenerator, MOSS-SoundEffect — all Delay checkpoints,
SURVEY.md S0).

Two decode drivers over the same jitted step:
  * ``generate`` — host loop polling the stop flag every ``poll_every`` steps
    (streams progress, supports callbacks);
  * ``generate_on_device`` — a single ``lax.while_loop`` program with zero
    host round-trips (benchmark / max-throughput path; the reference instead
    loops in python with a tqdm bar per token,
    moss_tts_delay/modeling_moss_tts.py:442).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DelayConfig
from ..models.delay import (
    DelaySampling,
    delay_decode_step,
    delay_generate_on_device,
    delay_prefill,
    init_delay_params,
    make_sampling,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m

def attend_bucket(needed: int, base: int, cap: int) -> int:
    """Exponentially growing attend-length buckets: smallest base*2^k >= needed,
    capped. Keeps the number of distinct compiled step programs at
    O(log(max_len)) for hour-long generations (vs linear buckets)."""
    b = base
    while b < needed:
        b *= 2
    return min(b, cap)


class DelayEngine:
    def __init__(
        self,
        params,
        config: DelayConfig,
        *,
        dtype=jnp.bfloat16,
        cache_bucket: int = 256,
        top_k_text: int = 50,
        top_k_audio: int = 25,
        hidden_out_layers: Optional[tuple] = None,
        kv_quant: bool = False,
        mesh=None,
    ):
        self.params = params
        self.config = config
        self.dtype = dtype
        self.cache_bucket = cache_bucket
        self.top_k_text = top_k_text
        self.top_k_audio = top_k_audio
        # int8 KV cache (QuantKVCache): halves the decode-attention HBM
        # stream; near-lossless (per-token/head absmax scales)
        self.kv_quant = kv_quant
        # per-head backbone source layers (checkpoint-level, static in jit;
        # reference modeling_moss_tts.py:236,280-289)
        self.hidden_out_layers = tuple(hidden_out_layers) if hidden_out_layers else None
        # Sharded serving over a ('data','model') mesh (SURVEY §2.b: streams
        # shard on data, the backbone tensor-parallel on model). Params are
        # device_put with delay_param_specs; batch inputs go on 'data'; GSPMD
        # propagates shardings through the jitted prefill/step programs and
        # emits the ICI collectives.
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import delay_param_specs, shard_params

            self.params = shard_params(self.params, mesh, delay_param_specs())
        self._prefill_jit: Dict[Any, Any] = {}
        self._step_jit: Dict[Any, Any] = {}
        self._device_gen_jit: Dict[Any, Any] = {}

    @classmethod
    def random_init(cls, seed: int = 0, config: Optional[DelayConfig] = None,
                    dtype=jnp.bfloat16, **kw) -> "DelayEngine":
        config = config or DelayConfig()
        params = init_delay_params(jax.random.PRNGKey(seed), config, dtype=dtype)
        return cls(params, config, dtype=dtype, **kw)

    def quantize(self, mode: str = "int8", kv_cache: bool = False) -> "DelayEngine":
        """Weight-only int8 serving quantization (halves decode HBM traffic);
        embeddings/norms stay in the original dtype. ``kv_cache=True`` also
        switches future prefills to the int8 KV cache (QuantKVCache)."""
        if mode != "int8":
            raise ValueError(f"unknown quantization mode: {mode}")
        from ..ops.quant import quantize_tree

        self.params = quantize_tree(self.params)
        if kv_cache:
            self.kv_quant = True
        self._prefill_jit.clear()
        self._step_jit.clear()
        self._device_gen_jit.clear()
        return self

    # ------------------------------------------------------------------
    def _get_prefill(self, max_new: int, cache_len: int):
        key = (max_new, cache_len, self.hidden_out_layers, self.kv_quant)
        if key not in self._prefill_jit:
            cfg, tkt, tka, dt = self.config, self.top_k_text, self.top_k_audio, self.dtype
            hol, kvq = self.hidden_out_layers, self.kv_quant
            self._prefill_jit[key] = jax.jit(
                lambda p, ids, mask, rng, s: delay_prefill(
                    p, cfg, ids, mask,
                    max_new_tokens=max_new, cache_len=cache_len, rng=rng,
                    sampling=s, top_k_text=tkt, top_k_audio=tka, dtype=dt,
                    hidden_out_layers=hol, kv_quant=kvq,
                )
            )
        return self._prefill_jit[key]

    def _get_step(self, attend_len=None):
        key = ("step", attend_len, self.top_k_text, self.top_k_audio,
               self.hidden_out_layers)
        if key not in self._step_jit:
            cfg, tkt, tka = self.config, self.top_k_text, self.top_k_audio
            hol = self.hidden_out_layers
            self._step_jit[key] = jax.jit(
                # uniform_slots: the solo engine left-pads the batch to one
                # length and pos advances unconditionally, so every row's
                # cursor stays equal -> KV writes take the sliced-write path
                # (the per-row scatter costs 7.7 ms/step at 8B batch 128)
                lambda p, st, s: delay_decode_step(
                    p, cfg, st, s, top_k_text=tkt, top_k_audio=tka,
                    attend_len=attend_len, hidden_out_layers=hol,
                    uniform_slots=True,
                ),
                donate_argnums=(1,),
            )
        return self._step_jit[key]

    def _get_device_gen(self, max_new: int, attend_len=None):
        key = (max_new, attend_len, self.top_k_text, self.top_k_audio,
               self.hidden_out_layers)
        if key not in self._device_gen_jit:
            cfg, tkt, tka = self.config, self.top_k_text, self.top_k_audio
            hol = self.hidden_out_layers
            self._device_gen_jit[key] = jax.jit(
                lambda p, st, s: delay_generate_on_device(
                    p, cfg, st, s, max_new_tokens=max_new,
                    top_k_text=tkt, top_k_audio=tka, attend_len=attend_len,
                    hidden_out_layers=hol, uniform_slots=True,
                ),
                donate_argnums=(1,),
            )
        return self._device_gen_jit[key]

    # ------------------------------------------------------------------
    def generate(
        self,
        input_ids: np.ndarray,  # (B, T, 1+n_vq) left-padded
        attention_mask: Optional[np.ndarray] = None,  # (B, T) bool
        *,
        max_new_tokens: int = 1000,
        text_temperature: float = 1.5,
        text_top_p: float = 1.0,
        text_top_k: int = 50,
        audio_temperature: float = 1.7,
        audio_top_p: float = 0.8,
        audio_top_k: int = 25,
        audio_repetition_penalty: float = 1.0,
        audio_rp_cross_batch: bool = False,
        seed: int = 0,
        on_device: bool = False,
        poll_every: int = 8,
    ) -> List[Tuple[int, np.ndarray]]:
        """Batched synthesis; returns per-sample (start_length, token grid)
        exactly like the reference generate (:518-525) so ``processor.decode``
        consumes it directly."""
        cfg = self.config
        input_ids = np.asarray(input_ids, np.int64)
        B, T, C = input_ids.shape
        if C != cfg.channels:
            raise ValueError(f"input_ids must have {cfg.channels} channels, got {C}")
        if attention_mask is None:
            attention_mask = np.ones((B, T), bool)

        # static top-k widths come from the engine; allow per-call override
        self.top_k_text = text_top_k
        self.top_k_audio = audio_top_k

        sampling = make_sampling(
            text_temperature=text_temperature, text_top_p=text_top_p,
            audio_temperature=audio_temperature, audio_top_p=audio_top_p,
            audio_repetition_penalty=audio_repetition_penalty,
            audio_rp_cross_batch=audio_rp_cross_batch,
        )
        cache_len = _round_up(T + max_new_tokens + 1, self.cache_bucket)
        rng = jax.random.PRNGKey(seed)

        ids_dev = jnp.asarray(input_ids)
        mask_dev = jnp.asarray(attention_mask)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = self.mesh.shape["data"]
            if B % n_data:
                raise ValueError(
                    f"batch {B} not divisible by mesh data axis {n_data}")
            ids_dev = jax.device_put(ids_dev, NamedSharding(self.mesh, P("data")))
            mask_dev = jax.device_put(mask_dev, NamedSharding(self.mesh, P("data")))

        state = self._get_prefill(max_new_tokens, cache_len)(
            self.params, ids_dev, mask_dev, rng, sampling
        )

        bucket = self.cache_bucket
        if on_device:
            # segmented device loops: each segment runs under a while_loop
            # with a static attend_len bucket so attention only streams the
            # used cache prefix
            steps = 1
            while steps < max_new_tokens:
                attend = attend_bucket(T + steps + 2, bucket, cache_len)
                seg_end = min(attend - T - 1, max_new_tokens)
                state = self._get_device_gen(seg_end, attend)(self.params, state, sampling)
                steps = int(jax.device_get(state.step).max())
                if bool(jax.device_get(state.is_stopping).all()):
                    break
        else:
            steps = 1
            while steps < max_new_tokens:
                attend = attend_bucket(T + steps + 1, bucket, cache_len)
                state = self._get_step(attend)(self.params, state, sampling)
                steps += 1
                if steps % poll_every == 0 and bool(jax.device_get(state.is_stopping).all()):
                    break

        out = np.asarray(jax.device_get(state.out))[:, :steps]  # (B, steps, C)
        full = np.concatenate([input_ids, out.astype(np.int64)], axis=1)

        # slice from last <|im_start|> + 3 (reference :518-524)
        results: List[Tuple[int, np.ndarray]] = []
        for b in range(B):
            text_row = input_ids[b, :, 0]
            matches = np.nonzero(text_row == cfg.im_start_token_id)[0]
            start_idx = int(matches[-1]) + 3 if len(matches) else 0
            start_length = T - start_idx
            results.append((start_length, full[b, start_idx:]))
        return results
