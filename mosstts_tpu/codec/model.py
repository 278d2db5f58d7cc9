"""MOSS-Audio-Tokenizer ("Cat") equivalent: TPU-native neural audio codec.

The reference fetches this codec from HF with trust_remote_code and ships no
source (SURVEY.md S2.9); this module implements the documented contract from
its call sites so the rest of the framework (and user code written against
the reference) works unchanged:

    batch_encode(wav_list, num_quantizers) -> .audio_codes (NQ,B,T), .audio_codes_lengths (B,)
    encode(input_values (B,1,L), padding_mask=..., num_quantizers=..., return_dict=True)
    encode(wav (B,1,L), chunk_duration=s) -> {"audio_codes": (NQ,B,T)}
    decode(audio_codes (NQ,B,T), padding_mask=..., return_dict=True, chunk_duration=8)
        -> .audio (B,1,L), .audio_lengths (B,)
    decode(tokens (NQ,T), chunk_duration=...) -> {"audio": [wav]}
    streaming(batch_size) context manager (stateful chunked decode)
    .codebook_size / .config.codebook_size / .sampling_rate / .frame_rate

Architecture (CNN-free, causal, streaming — per README.md:378-389):
24 kHz wav -> 1920-sample frame patchify -> linear -> causal transformer
(sliding window) -> linear -> 32-level RVQ -> (decode) linear -> causal
transformer -> linear frame head -> 24 kHz wav. Chunked processing carries a
window of K/V so streaming decode is bit-identical to one-shot decode.
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
import math
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CodecConfig, Qwen3Config
from ..nn.qwen3 import init_qwen3_params
from ..ops.basic import dense, rms_norm
from .rvq import init_rvq_params, rvq_decode, rvq_encode
from .transformer import StreamState, init_stream_state, run_chunk


@dataclass
class EncodeOutput:
    audio_codes: np.ndarray  # (NQ, B, T)
    audio_codes_lengths: np.ndarray  # (B,)

    def __getitem__(self, key):
        return getattr(self, key)


@dataclass
class DecodeOutput:
    audio: np.ndarray  # (B, 1, L)
    audio_lengths: np.ndarray  # (B,)

    def __getitem__(self, key):
        if key == "audio" and isinstance(self.audio, list):
            return self.audio
        return getattr(self, key)


def _txf_cfg(cfg: CodecConfig, n_layers: int) -> Qwen3Config:
    return Qwen3Config(
        vocab_size=1,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=n_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
    )


def init_codec_params(rng: jax.Array, cfg: CodecConfig, dtype=jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(rng, 8)
    D, hop, dlat = cfg.hidden_size, cfg.hop, cfg.codebook_dim
    std = 0.02

    def nrm(key, shape, scale=std):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    return {
        "enc_in": nrm(ks[0], (hop, D), scale=1.0 / math.sqrt(hop)),
        "encoder": init_qwen3_params(ks[1], _txf_cfg(cfg, cfg.num_encoder_layers), dtype, with_embed=False),
        "enc_out": nrm(ks[2], (D, dlat)),
        "rvq": init_rvq_params(ks[3], cfg.n_q, cfg.codebook_size, dlat, dtype),
        "dec_in": nrm(ks[4], (dlat, D)),
        "decoder": init_qwen3_params(ks[5], _txf_cfg(cfg, cfg.num_decoder_layers), dtype, with_embed=False),
        "dec_out_norm": jnp.ones((D,), dtype),
        # overlap-add head: each frame predicts hop + overlap samples
        "dec_out": nrm(ks[6], (D, hop + cfg.overlap)),
    }


# ------------------------- jitted chunk kernels ----------------------------


def _encode_chunk(params, cfg: CodecConfig, state: StreamState, frames, valid_len, num_quantizers: int):
    """frames: (B, c, hop) -> codes (NQ, B, c), new state."""
    x = dense(frames, params["enc_in"])
    h, state = run_chunk(params["encoder"], _txf_cfg(cfg, cfg.num_encoder_layers), state, x, valid_len)
    lat = dense(h, params["enc_out"])
    codes, _ = rvq_encode(params["rvq"], lat, num_quantizers)
    return codes, state


def overlap_add(frames: "jax.Array", prev_tail: "jax.Array", hop: int, ov: int):
    """frames: (B, c, hop+ov); prev_tail: (B, ov) carried from the previous
    frame. Linear crossfade of each frame's head with the preceding frame's
    tail removes frame-boundary discontinuities (vocoder-style synthesis).
    Returns (wav (B, c*hop), new_tail (B, ov))."""
    B, c, _ = frames.shape
    heads = frames[:, :, :hop]
    tails = frames[:, :, hop:]
    prev = jnp.concatenate([prev_tail[:, None, :], tails[:, :-1, :]], axis=1)
    w = (jnp.arange(ov, dtype=jnp.float32) + 1.0) / (ov + 1.0)
    w = w.astype(frames.dtype)
    blended = heads[:, :, :ov] * w + prev * (1.0 - w)
    heads = jnp.concatenate([blended, heads[:, :, ov:]], axis=-1)
    return heads.reshape(B, c * hop), tails[:, -1, :]


def _decode_chunk(params, cfg: CodecConfig, state, codes, valid_len):
    """codes: (NQ, B, c) -> wav chunk (B, c*hop), new state.
    ``state`` = (transformer StreamState, overlap tail (B, ov))."""
    txf_state, prev_tail = state
    lat = rvq_decode(params["rvq"], codes)
    x = dense(lat.astype(params["dec_in"].dtype), params["dec_in"])
    h, txf_state = run_chunk(params["decoder"], _txf_cfg(cfg, cfg.num_decoder_layers), txf_state, x, valid_len)
    h = rms_norm(h, params["dec_out_norm"], cfg.rms_norm_eps)
    frames = dense(h, params["dec_out"])  # (B, c, hop+ov)
    wav, last_tail = overlap_add(frames, prev_tail, cfg.hop, cfg.overlap)
    # carry the tail of the last VALID frame (padded chunk frames are garbage)
    B, c, _ = frames.shape
    tails = frames[:, :, cfg.hop :]
    new_tail = jax.lax.dynamic_index_in_dim(
        tails, jnp.clip(valid_len - 1, 0, c - 1), axis=1, keepdims=False
    )
    return wav, (txf_state, new_tail)


class CodecStreamSession:
    """Stateful chunked decoder used by the ``streaming()`` context: K/V and
    positions persist across ``decode`` calls so chunk boundaries are
    seamless (reference contract: streaming_mossttsrealtime.py:881-884)."""

    def __init__(self, codec: "MossAudioTokenizer", batch_size: int):
        self.codec = codec
        self.batch_size = batch_size
        self.state = None  # (StreamState, overlap tail)

    def reset(self):
        self.state = None


class MossAudioTokenizer:
    DEFAULT_CHUNK_FRAMES = 100  # 8 s at 12.5 Hz

    def __init__(self, params, config: Optional[CodecConfig] = None):
        self.config = config or CodecConfig()
        self.params = params
        # the active streaming session is THREAD-LOCAL: one codec object is
        # shared across a ThreadingHTTPServer's request threads, and two
        # concurrent `with codec.streaming()` blocks must not clobber each
        # other's causal decode state
        self._stream_tls = threading.local()
        self._enc_jit: Dict[Any, Any] = {}
        self._dec_jit: Dict[Any, Any] = {}

    @property
    def _stream(self) -> Optional["CodecStreamSession"]:
        return getattr(self._stream_tls, "value", None)

    @_stream.setter
    def _stream(self, sess: Optional["CodecStreamSession"]):
        self._stream_tls.value = sess

    # ------------------------------ plumbing -------------------------------
    @property
    def codebook_size(self) -> int:
        return self.config.codebook_size

    @property
    def sampling_rate(self) -> int:
        return self.config.sampling_rate

    @property
    def frame_rate(self) -> float:
        return self.config.frame_rate

    @property
    def device(self):
        return jax.devices()[0]

    @classmethod
    def from_pretrained(cls, path: str | Path, dtype=jnp.float32) -> "MossAudioTokenizer":
        path = Path(path)
        with open(path / "config.json") as f:
            cfg = CodecConfig.from_hf_dict(json.load(f))
        from ..utils.hf_loader import load_safetensors_dir

        flat = load_safetensors_dir(path)
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), _unflatten(flat))
        return cls(params, cfg)

    def save_pretrained(self, path: str | Path):
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        with open(path / "config.json", "w") as f:
            json.dump(dataclasses.asdict(self.config), f, indent=2)
        from safetensors.numpy import save_file

        save_file(_flatten(self.params), str(path / "model.safetensors"))

    @classmethod
    def random_init(cls, seed: int = 0, config: Optional[CodecConfig] = None,
                    dtype=jnp.float32) -> "MossAudioTokenizer":
        config = config or CodecConfig()
        return cls(init_codec_params(jax.random.PRNGKey(seed), config, dtype), config)

    def _encode_fn(self, num_quantizers: int):
        key = num_quantizers
        if key not in self._enc_jit:
            cfg = self.config
            self._enc_jit[key] = jax.jit(
                lambda p, s, f, v: _encode_chunk(p, cfg, s, f, v, num_quantizers),
                donate_argnums=(1,),
            )
        return self._enc_jit[key]

    def _decode_fn(self, nq: int):
        if nq not in self._dec_jit:
            cfg = self.config
            self._dec_jit[nq] = jax.jit(
                lambda p, s, c, v: _decode_chunk(p, cfg, s, c, v),
                donate_argnums=(1,),
            )
        return self._dec_jit[nq]

    # ------------------------------- encode --------------------------------
    def _encode_array(self, wav: np.ndarray, num_quantizers: int,
                      chunk_frames: Optional[int] = None) -> np.ndarray:
        """wav: (B, L) -> codes (NQ, B, T_frames)."""
        cfg = self.config
        hop = cfg.hop
        B, L = wav.shape
        T = math.ceil(L / hop) if L else 0
        if T == 0:
            return np.zeros((num_quantizers, B, 0), np.int64)
        pad = T * hop - L
        wav = np.pad(wav.astype(np.float32), ((0, 0), (0, pad)))
        frames = wav.reshape(B, T, hop)

        cf = chunk_frames or self.DEFAULT_CHUNK_FRAMES
        state = init_stream_state(
            _txf_cfg(cfg, cfg.num_encoder_layers), B, cfg.causal_context,
            dtype=self.params["enc_in"].dtype,
        )
        fn = self._encode_fn(num_quantizers)
        outs = []
        for start in range(0, T, cf):
            chunk = frames[:, start : start + cf]
            vlen = chunk.shape[1]
            if vlen < cf:
                chunk = np.pad(chunk, ((0, 0), (0, cf - vlen), (0, 0)))
            codes, state = fn(self.params, state, jnp.asarray(chunk), jnp.int32(vlen))
            outs.append(np.asarray(codes[:, :, :vlen]))
        return np.concatenate(outs, axis=2)

    def batch_encode(self, wav_list: Sequence, num_quantizers: Optional[int] = None) -> EncodeOutput:
        nq = int(num_quantizers or self.config.n_q)
        wavs = [np.asarray(w, np.float32).reshape(-1) for w in wav_list]
        lengths = np.array(
            [math.ceil(len(w) / self.config.hop) for w in wavs], np.int64
        )
        max_l = max((len(w) for w in wavs), default=0)
        batch = np.zeros((len(wavs), max_l), np.float32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w
        codes = self._encode_array(batch, nq)
        return EncodeOutput(audio_codes=codes.astype(np.int64), audio_codes_lengths=lengths)

    def encode(self, input_values, padding_mask=None, num_quantizers: Optional[int] = None,
               return_dict: bool = True, chunk_duration: Optional[float] = None, **kw):
        nq = int(num_quantizers or self.config.n_q)
        arr = np.asarray(input_values, np.float32)
        if arr.ndim == 3:  # (B, 1, L)
            arr = arr[:, 0, :]
        elif arr.ndim == 1:
            arr = arr[None]
        if padding_mask is not None:
            mask = np.asarray(padding_mask, bool)
            samples = mask.sum(axis=-1)
        else:
            samples = np.full(arr.shape[0], arr.shape[1])
        lengths = np.ceil(samples / self.config.hop).astype(np.int64)
        cf = None
        if chunk_duration:
            cf = max(1, int(round(float(chunk_duration) * self.config.frame_rate)))
        codes = self._encode_array(arr, nq, chunk_frames=cf)
        out = EncodeOutput(audio_codes=codes.astype(np.int64), audio_codes_lengths=lengths)
        if return_dict:
            return out
        return {"audio_codes": out.audio_codes, "audio_codes_lengths": out.audio_codes_lengths}

    # ------------------------------- decode --------------------------------
    def _init_decode_state(self, B: int):
        cfg = self.config
        dt = self.params["dec_in"].dtype
        txf = init_stream_state(
            _txf_cfg(cfg, cfg.num_decoder_layers), B, cfg.causal_context, dtype=dt
        )
        return (txf, jnp.zeros((B, cfg.overlap), dt))

    def _decode_array(self, codes: np.ndarray, chunk_frames: int,
                      state=None, keep_state: bool = False):
        """codes: (NQ, B, T) -> wav (B, T*hop) [, final state]."""
        cfg = self.config
        NQ, B, T = codes.shape
        if state is None:
            state = self._init_decode_state(B)
        fn = self._decode_fn(NQ)
        outs = []
        for start in range(0, T, chunk_frames):
            chunk = codes[:, :, start : start + chunk_frames]
            vlen = chunk.shape[2]
            if vlen < chunk_frames:
                chunk = np.pad(chunk, ((0, 0), (0, 0), (0, chunk_frames - vlen)))
            wav_chunk, state = fn(self.params, state, jnp.asarray(chunk), jnp.int32(vlen))
            outs.append(np.asarray(wav_chunk[:, : vlen * cfg.hop]))
        wav = np.concatenate(outs, axis=1) if outs else np.zeros((B, 0), np.float32)
        if keep_state:
            return wav, state
        return wav

    def decode(self, audio_codes, padding_mask=None, return_dict: bool = True,
               chunk_duration: Optional[float] = 8, **kw):
        codes = np.asarray(audio_codes, np.int64)
        squeeze = False
        if codes.ndim == 2:  # (NQ, T) single-stream call (realtime path)
            codes = codes[:, None, :]
            squeeze = True
        NQ, B, T = codes.shape
        if chunk_duration is None or (isinstance(chunk_duration, (int, float)) and chunk_duration <= 0):
            cf = max(T, 1)
        else:
            cf = max(1, int(round(float(chunk_duration) * self.config.frame_rate)))

        if self._stream is not None and squeeze:
            # inside streaming(): persist decoder state across calls
            sess = self._stream
            if sess.state is None:
                sess.state = self._init_decode_state(B)
            wav, sess.state = self._decode_array(codes, cf, state=sess.state, keep_state=True)
        else:
            wav = self._decode_array(codes, cf)

        if padding_mask is not None:
            frame_lengths = np.asarray(padding_mask, bool).sum(axis=-1)
        else:
            frame_lengths = np.full(B, T)
        audio_lengths = (frame_lengths * self.config.hop).astype(np.int64)

        if squeeze:
            return {"audio": [wav[0]], "audio_lengths": audio_lengths}
        out = DecodeOutput(audio=wav[:, None, :], audio_lengths=audio_lengths)
        if return_dict:
            return out
        return {"audio": out.audio, "audio_lengths": out.audio_lengths}

    @contextlib.contextmanager
    def streaming(self, batch_size: int = 1):
        """Stateful chunked decode: successive decode() calls continue the
        causal context so chunk boundaries are artifact-free."""
        prev = self._stream
        self._stream = CodecStreamSession(self, batch_size)
        try:
            yield self._stream
        finally:
            self._stream = prev


# --------------------------- pytree <-> flat dict ---------------------------

def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + k + "."))
    else:
        # device_get can return an F-ordered view (XLA layout choice);
        # safetensors writes raw bytes assuming C-order, so force it.
        out[prefix[:-1]] = np.ascontiguousarray(jax.device_get(tree))
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree
