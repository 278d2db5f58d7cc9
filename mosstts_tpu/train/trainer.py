"""Unified training driver for the three TTS model families.

The reference ships NO training entry point (SURVEY.md §0: "no training
loop"; both Delay and Local forwards compute losses but nothing drives
them). This framework's losses (models/delay.delay_loss,
models/local.local_loss, models/realtime.realtime_loss) are pure functions
over pytrees, so one trainer covers all three families:

  * optax AdamW on a warmup-cosine schedule with global-norm clipping
    (the codec trainer's recipe, codec/train.py);
  * a single donated jitted step — params and optimizer state update in
    place on device;
  * optional GSPMD sharding: pass a ``jax.sharding.Mesh`` and the family's
    param specs (parallel/mesh.py) shard the model over ('data', 'model');
    the SAME jitted step then runs data+tensor parallel — no code change
    (tested on the 8-device CPU mesh; tests/test_sharding.py pins
    sharded == single for the delay loss);
  * checkpoints through utils/save.save_model (safetensors + config.json,
    the same format the serving loaders consume).

Real data loading is the caller's: ``fit`` consumes any iterator of
batches ``{"input_ids", "attention_mask", "labels"}`` shaped (B, T, C).
``synthetic_tts_batch`` provides structured random batches (delay-pattern
grids with ignore-masked prompts) for smoke tests and this no-egress box.
"""
from __future__ import annotations

import json
import time
from functools import partial
from typing import Callable, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import DelayConfig, LocalConfig, RealtimeConfig
from ..models.delay import delay_loss, init_delay_params
from ..models.local import init_local_params, local_loss
from ..models.realtime import init_realtime_params, realtime_loss

_FAMILIES = {
    "delay": (init_delay_params, delay_loss, DelayConfig),
    "local": (init_local_params, local_loss, LocalConfig),
    "realtime": (init_realtime_params, realtime_loss, RealtimeConfig),
}


def _optimizer(peak_lr, warmup_steps, total_steps, weight_decay=0.01,
               clip_norm=1.0):
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=peak_lr, warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=peak_lr * 0.05,
    )
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


def synthetic_tts_batch(family: str, cfg, rng: np.random.Generator,
                        batch: int = 2, seq: int = 24) -> Dict[str, np.ndarray]:
    """Structured random batch: a short "prompt" region (labels ignored via
    -100) followed by an audio block of valid frames — enough structure to
    exercise the per-channel losses and masking exactly like real data."""
    C = cfg.channels
    n_audio = C - 1
    text_vocab = cfg.language_config.vocab_size
    audio_hi = (cfg.audio_vocab_size if family == "realtime"
                else cfg.audio_pad_code)

    ids = np.zeros((batch, seq, C), np.int32)
    ids[..., 0] = rng.integers(0, text_vocab, (batch, seq))
    ids[..., 1:] = rng.integers(0, 1024, (batch, seq, n_audio))
    labels = np.full((batch, seq, C), -100, np.int64)
    prompt = seq // 3
    labels[:, prompt:, 0] = ids[:, prompt:, 0]
    labels[:, prompt:, 1:] = np.minimum(ids[:, prompt:, 1:], audio_hi - 1)
    mask = np.ones((batch, seq), bool)
    return {"input_ids": ids, "attention_mask": mask, "labels": labels}


class TTSTrainer:
    """Owns params + optimizer state + one donated jitted step for a model
    family ('delay' | 'local' | 'realtime')."""

    def __init__(self, family: str, cfg, *, seed: int = 0,
                 peak_lr: float = 1e-4, warmup_steps: int = 100,
                 total_steps: int = 10_000, dtype=jnp.float32,
                 mesh=None, channel_weights=None, remat: bool = False,
                 pipeline=None):
        if family not in _FAMILIES:
            raise ValueError(f"unknown family {family!r}; pick from {sorted(_FAMILIES)}")
        if pipeline is not None and family != "delay":
            raise ValueError("pipeline= is supported for the delay family")
        init_fn, loss_fn, _ = _FAMILIES[family]
        self.family = family
        self.cfg = cfg
        self.params = init_fn(jax.random.PRNGKey(seed), cfg, dtype=dtype)
        self.tx = _optimizer(peak_lr, warmup_steps, total_steps)
        self.step_idx = 0
        self.history: List[Dict[str, float]] = []

        if mesh is not None:
            from ..parallel.mesh import (
                delay_param_specs, local_param_specs, realtime_param_specs,
                shard_params,
            )

            specs = {"delay": delay_param_specs, "local": local_param_specs,
                     "realtime": realtime_param_specs}[family]()
            self.params = shard_params(self.params, mesh, specs)
        self.mesh = mesh
        self.opt_state = self.tx.init(self.params)
        if mesh is not None:
            # Moments inherit the params' shardings via zeros_like, but
            # optax scalars (AdamW count, clip state) come up single-device;
            # replicate them over the mesh so the whole opt_state carries
            # consistent committed shardings (a checkpoint restore targets
            # these shardings — mixed-device pytrees fail the jitted step).
            from jax.sharding import NamedSharding, PartitionSpec, SingleDeviceSharding

            rep = NamedSharding(mesh, PartitionSpec())
            self.opt_state = jax.tree.map(
                lambda x: (jax.device_put(x, rep)
                           if isinstance(getattr(x, "sharding", None),
                                         SingleDeviceSharding) else x),
                self.opt_state)

        cw = (jnp.asarray(channel_weights, jnp.float32)
              if channel_weights is not None else None)
        tx = self.tx

        # remat (jax.checkpoint around the backbone layer-scan body):
        # recompute layer activations in the backward pass instead of
        # storing them — required for the 8B at real sequence lengths on a
        # v5e slice. Loss-equal with remat off (tests/test_tts_trainer.py).
        self.remat = bool(remat)
        # pipeline=(Mesh with a 'stage' axis, n_micro): GPipe over the
        # backbone layer stack (parallel/pipeline.py) for training runs
        # whose layers exceed one slice. Delay family only (validated at the
        # top); loss-equal with pipeline off
        # (tests/test_pipeline.py::test_trainer_pipeline_matches_plain).
        self.pipeline = pipeline

        def batch_loss(p, b):
            if family == "delay":
                return delay_loss(p, cfg, b["input_ids"], b["attention_mask"],
                                  b["labels"], channelwise_loss_weight=cw,
                                  remat=self.remat, pipeline=self.pipeline)
            if family == "local":
                return local_loss(p, cfg, b["input_ids"], b["attention_mask"],
                                  b["labels"], channel_weights=cw,
                                  remat=self.remat)
            return realtime_loss(p, cfg, b["input_ids"], b["attention_mask"],
                                 b["labels"], remat=self.remat)

        @partial(jax.jit, donate_argnums=(0, 1))
        def _step(params, opt_state, b):
            (loss, aux), grads = jax.value_and_grad(batch_loss, has_aux=True)(
                params, b)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(grads)
            return params, opt_state, loss, gnorm

        self._jit_step = _step

    # ------------------------------------------------------------------
    def train_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        self.params, self.opt_state, loss, gnorm = self._jit_step(
            self.params, self.opt_state, b)
        rec = {"step": self.step_idx,
               "loss": float(jax.device_get(loss)),
               "grad_norm": float(jax.device_get(gnorm))}
        self.step_idx += 1
        self.history.append(rec)
        return rec

    def fit(self, data: Iterator[Dict[str, np.ndarray]], steps: int,
            log_every: int = 10,
            log_fn: Callable[[str], None] = print) -> List[Dict[str, float]]:
        t0 = time.perf_counter()
        for _ in range(steps):
            rec = self.train_step(next(data))
            if rec["step"] % log_every == 0:
                rate = (rec["step"] + 1) / (time.perf_counter() - t0)
                log_fn(f"{self.family}-train step {rec['step']}: "
                       f"loss={rec['loss']:.4f} |g|={rec['grad_norm']:.3f} "
                       f"({rate:.2f} steps/s)")
        return self.history

    def save_state(self, path, *, use_async: bool = False):
        """Full resumable train state (params + optimizer moments + step)
        via orbax — see train/checkpoint.py. ``save`` below writes only the
        model in the serving format."""
        from .checkpoint import save_train_state

        return save_train_state(path, self, use_async=use_async)

    def restore_state(self, path) -> "TTSTrainer":
        from .checkpoint import restore_train_state

        restore_train_state(path, self)
        return self

    def save(self, path) -> None:
        from ..utils.save import save_model

        # model_type uses the serving loader's registry names
        save_model(path, jax.device_get(self.params), self.cfg,
                   f"moss_tts_{self.family}")
        with open(str(path) + "/train_history.json", "w") as f:
            json.dump(self.history, f)


def main(argv=None):
    import argparse

    from ..core.config import RealtimeLocalConfig, tiny_qwen3

    ap = argparse.ArgumentParser(
        description="Train a TTS family on synthetic batches (smoke driver; "
                    "pass your own data iterator to TTSTrainer.fit for real "
                    "training).")
    ap.add_argument("--family", choices=sorted(_FAMILIES), default="delay")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=24)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--mesh", default=None,
                    help="'DATAxMODEL' e.g. 2x4 to shard over a device mesh")
    ap.add_argument("--remat", action="store_true",
                    help="gradient checkpointing around the backbone layer "
                         "scan (recompute activations in backward; needed "
                         "for 8B at real sequence lengths)")
    ap.add_argument("--save", default=None)
    args = ap.parse_args(argv)

    tiny = tiny_qwen3()
    if args.family == "delay":
        cfg = DelayConfig(language_config=tiny, n_vq=4)
    elif args.family == "local":
        cfg = LocalConfig(language_config=tiny, n_vq=4,
                          additional_mlp_ffn_hidden_size=32,
                          local_ffn_hidden_size=48, local_hidden_size=24,
                          local_num_layers=2)
    else:
        cfg = RealtimeConfig(
            language_config=tiny_qwen3(hidden_size=32, num_attention_heads=2,
                                       num_key_value_heads=2, head_dim=16,
                                       intermediate_size=64),
            local_config=RealtimeLocalConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, num_key_value_heads=2, head_dim=16,
                rvq=4, max_position_embeddings=5),
            rvq=4)

    mesh = None
    if args.mesh:
        from ..parallel.mesh import make_mesh

        d, m = (int(x) for x in args.mesh.split("x"))
        mesh = make_mesh(data=d, model=m)

    trainer = TTSTrainer(args.family, cfg, peak_lr=args.lr,
                         warmup_steps=max(1, args.steps // 10),
                         total_steps=args.steps, mesh=mesh, remat=args.remat)
    rng = np.random.default_rng(0)

    def data():
        while True:
            yield synthetic_tts_batch(args.family, cfg, rng,
                                      batch=args.batch, seq=args.seq)

    hist = trainer.fit(data(), args.steps)
    print(json.dumps({"first_loss": hist[0]["loss"],
                      "last_loss": hist[-1]["loss"]}))
    if args.save:
        trainer.save(args.save)


if __name__ == "__main__":
    main()
