"""Codec training driver: optimizer, LR schedule, loss logging, checkpoints.

The reference ships its 1.6B Cat codec pre-trained with no training code
(README.md:378-408, empty moss_audio_tokenizer/); this driver makes the TPU
codec trainable end-to-end over the objective in ``codec/losses.py`` (L1 +
multi-scale STFT + RVQ commitment). jit/pjit-friendly: one donated train
step, optax optimizer state as a pytree.

Quality gate: ``si_snr`` / ``mel_distance`` below are the metrics the tests
use to require that a short training run actually improves reconstruction
(tests/test_codec_training.py).

CLI smoke (synthetic audio):
    python -m mosstts_tpu.codec.train --steps 50 --hidden 64
"""
from __future__ import annotations

import json
import time
from functools import partial
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import CodecConfig
from .discriminator import (
    disc_forward,
    feature_matching_loss,
    hinge_d_loss,
    hinge_g_loss,
    init_discriminators,
)
from .losses import (
    codec_forward_train,
    codec_loss,
    lag_align,
    multiscale_stft_loss,
    si_snr_loss,
    stft_mag,
)
from .model import MossAudioTokenizer, init_codec_params


# ------------------------------ quality metrics ------------------------------

def si_snr(est: np.ndarray, ref: np.ndarray, eps: float = 1e-8) -> float:
    """Scale-invariant SNR in dB (higher is better; the standard
    reconstruction quality gate for neural codecs)."""
    est = np.asarray(est, np.float64).reshape(-1)
    ref = np.asarray(ref, np.float64).reshape(-1)
    n = min(est.size, ref.size)
    est, ref = est[:n], ref[:n]
    ref_zm = ref - ref.mean()
    est_zm = est - est.mean()
    proj = (est_zm @ ref_zm) / (ref_zm @ ref_zm + eps) * ref_zm
    noise = est_zm - proj
    return float(10.0 * np.log10((proj @ proj + eps) / (noise @ noise + eps)))


def si_snr_shifted(est: np.ndarray, ref: np.ndarray,
                   sample_rate: int = 24000, max_shift_ms: float = 5.0
                   ) -> Tuple[float, int]:
    """SI-SNR maximized over a small integer delay between est and ref.

    Causal encoder/decoder stacks often reconstruct with a constant few-ms
    lag that plain SI-SNR scores as catastrophic (tens of dB down) while
    being perceptually irrelevant; the shift search separates "delayed"
    from "wrong". Returns (best dB, shift in samples; positive = est lags
    ref)."""
    est = np.asarray(est, np.float64).reshape(-1)
    ref = np.asarray(ref, np.float64).reshape(-1)
    n = min(est.size, ref.size)
    est, ref = est[:n], ref[:n]
    m = max(1, int(max_shift_ms * sample_rate / 1000.0))
    best_db, best_k = -np.inf, 0
    for k in range(-m, m + 1):
        if k >= 0:
            e, r = est[k:], ref[: n - k]
        else:
            e, r = est[: n + k], ref[-k:]
        db = si_snr(e, r)
        if db > best_db:
            best_db, best_k = db, k
    return float(best_db), int(best_k)


def mel_distance(est: np.ndarray, ref: np.ndarray, frame: int = 1024,
                 hop: int = 256) -> float:
    """Log-magnitude STFT L1 distance (lower is better)."""
    est = jnp.asarray(np.asarray(est, np.float32).reshape(1, -1))
    ref = jnp.asarray(np.asarray(ref, np.float32).reshape(1, -1))
    n = min(est.shape[1], ref.shape[1])
    me = stft_mag(est[:, :n], frame, hop)
    mr = stft_mag(ref[:, :n], frame, hop)
    return float(jnp.mean(jnp.abs(jnp.log(me + 1e-5) - jnp.log(mr + 1e-5))))


# ------------------------------ synthetic data -------------------------------

def synthetic_audio_batch(rng: np.random.Generator, batch: int, seconds: float,
                          sample_rate: int = 24000) -> np.ndarray:
    """Band-limited harmonic + noise mixtures: enough spectral structure for
    the reconstruction losses to be meaningful without real data (this box
    has no network egress for audio corpora)."""
    L = int(seconds * sample_rate)
    t = np.arange(L, dtype=np.float32) / sample_rate
    out = np.zeros((batch, L), np.float32)
    for b in range(batch):
        f0 = rng.uniform(80.0, 400.0)
        sig = np.zeros(L, np.float32)
        for h in range(1, 6):
            amp = rng.uniform(0.05, 0.4) / h
            sig += amp * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi))
        # amplitude envelope + noise floor
        env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t))
        sig = sig * env.astype(np.float32)
        sig += rng.normal(0, 0.01, L).astype(np.float32)
        out[b] = sig
    return out


def synthetic_data_iter(seed: int, batch: int, seconds: float,
                        sample_rate: int = 24000) -> Iterator[np.ndarray]:
    rng = np.random.default_rng(seed)
    while True:
        yield synthetic_audio_batch(rng, batch, seconds, sample_rate)


# -------------------------------- the trainer --------------------------------

def make_codec_optimizer(peak_lr: float = 3e-4, warmup_steps: int = 500,
                         total_steps: int = 100_000,
                         weight_decay: float = 1e-4,
                         clip_norm: float = 1.0,
                         kind: str = "adamw") -> optax.GradientTransformation:
    """AdamW + global-norm clip on a linear-warmup cosine-decay schedule —
    the standard neural-codec recipe. ``kind='adafactor'`` swaps in a
    factored-second-moment optimizer (no first moment, O(rows+cols) stats
    instead of 2 f32 moments per param): what lets the parity-scale
    ~1.5B ``codec_1p6b`` preset train on one 16 GB v5e — AdamW's moments
    alone are ~12.4 GB there."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=peak_lr * 0.05,
    )
    if kind == "adafactor":
        return optax.chain(
            optax.clip_by_global_norm(clip_norm),
            optax.adafactor(schedule, multiply_by_parameter_scale=False,
                            clipping_threshold=None, momentum=None,
                            weight_decay_rate=weight_decay),
        )
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


class CodecTrainer:
    """Owns params + optimizer state + the jitted step; logs per-step losses."""

    def __init__(self, cfg: CodecConfig, *, seed: int = 0,
                 num_quantizers: Optional[int] = None,
                 peak_lr: float = 3e-4, warmup_steps: int = 500,
                 total_steps: int = 100_000, dtype=jnp.float32,
                 snr_weight: float = 1.0,
                 lag_tolerance: int = 0,
                 adversarial: bool = False,
                 adv_weight: float = 3.0, fm_weight: float = 3.0,
                 disc_lr: float = 3e-4, disc_channels: int = 32,
                 adv_start: int = 0,
                 optimizer: str = "adamw"):
        self.cfg = cfg
        self.num_quantizers = int(num_quantizers or cfg.n_q)
        self.params = init_codec_params(jax.random.PRNGKey(seed), cfg, dtype)
        self.tx = make_codec_optimizer(peak_lr, warmup_steps, total_steps,
                                       kind=optimizer)
        self.opt_state = self.tx.init(self.params)
        self.step_idx = 0
        self.history: List[Dict[str, float]] = []
        # adversarial half (MS-STFT + multi-period discriminators, hinge
        # losses, feature matching): the part of the recipe the pure
        # reconstruction objective lacks (docs/PROFILE.md: "positive SI-SNR
        # needs adversarial training")
        self.adversarial = bool(adversarial)
        self.adv_start = int(adv_start)

        nq, tx, sw = self.num_quantizers, self.tx, float(snr_weight)
        lt = int(lag_tolerance)

        @partial(jax.jit, donate_argnums=(0, 1))
        def _step(params, opt_state, wav):
            (loss, aux), grads = jax.value_and_grad(
                lambda p: codec_loss(p, cfg, wav, num_quantizers=nq,
                                     snr_weight=sw, lag_tolerance=lt),
                has_aux=True,
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        self._jit_step = _step

        if self.adversarial:
            self.d_params = init_discriminators(
                jax.random.PRNGKey(seed + 1), channels=disc_channels)
            self.d_tx = make_codec_optimizer(disc_lr, warmup_steps, total_steps)
            self.d_opt_state = self.d_tx.init(self.d_params)
            aw, fw, dtx = float(adv_weight), float(fm_weight), self.d_tx

            @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
            def _gan_step(params, opt_state, d_params, d_opt_state, wav,
                          adv_on):
                """One G update (recon + adv + feature-matching, D frozen)
                then one D update (hinge real/fake, G output detached) —
                the standard alternating schedule, fused into ONE jitted
                program. ``adv_on`` (0./1.) gates the adversarial terms so
                a warmup schedule does not recompile."""
                def g_loss_fn(p):
                    recon, q_aux = codec_forward_train(p, cfg, wav, nq)
                    target = wav[:, : recon.shape[1]].astype(jnp.float32)
                    reconf = recon.astype(jnp.float32)
                    if lt > 0:
                        reconf, target = lag_align(reconf, target,
                                                   max_shift=lt)
                    l1 = jnp.mean(jnp.abs(reconf - target))
                    spec = multiscale_stft_loss(target, reconf)
                    neg_snr = si_snr_loss(reconf, target)
                    fake_outs = disc_forward(d_params, reconf)
                    real_outs = disc_forward(
                        d_params, jax.lax.stop_gradient(target))
                    adv = hinge_g_loss(fake_outs)
                    fm = feature_matching_loss(real_outs, fake_outs)
                    total = (l1 + spec + sw * neg_snr
                             + 0.25 * q_aux["commitment"] + q_aux["codebook"]
                             + adv_on * (aw * adv + fw * fm))
                    metrics = {"l1": l1, "stft": spec, "neg_si_snr_db": neg_snr,
                               "adv": adv, "fm": fm, **q_aux}
                    return total, (reconf, target, metrics)

                (g_loss, (reconf, target, metrics)), grads = (
                    jax.value_and_grad(g_loss_fn, has_aux=True)(params))
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)

                fake = jax.lax.stop_gradient(reconf)

                def d_loss_fn(dp):
                    return hinge_d_loss(disc_forward(dp, target),
                                        disc_forward(dp, fake))

                d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
                d_updates, d_opt_state = dtx.update(d_grads, d_opt_state,
                                                    d_params)
                d_params = optax.apply_updates(d_params, d_updates)
                metrics["d_loss"] = d_loss
                return params, opt_state, d_params, d_opt_state, g_loss, metrics

            self._jit_gan_step = _gan_step

    def train_step(self, wav: np.ndarray) -> Dict[str, float]:
        wav_j = jnp.asarray(wav, jnp.float32)
        if self.adversarial:
            adv_on = jnp.float32(1.0 if self.step_idx >= self.adv_start else 0.0)
            (self.params, self.opt_state, self.d_params, self.d_opt_state,
             loss, aux) = self._jit_gan_step(
                self.params, self.opt_state, self.d_params, self.d_opt_state,
                wav_j, adv_on)
        else:
            self.params, self.opt_state, loss, aux = self._jit_step(
                self.params, self.opt_state, wav_j)
        # ONE host sync for all scalars — each device_get is a full tunnel
        # round-trip (~34 ms) on this box, so per-metric fetches would cost
        # more than the step itself
        loss_v, aux_v = jax.device_get((loss, aux))
        rec = {"step": self.step_idx, "loss": float(loss_v)}
        rec.update({k: float(v) for k, v in aux_v.items()})
        self.step_idx += 1
        self.history.append(rec)
        return rec

    def fit(self, data: Iterator[np.ndarray], steps: int,
            log_every: int = 10,
            log_fn: Callable[[str], None] = print) -> List[Dict[str, float]]:
        t0 = time.perf_counter()
        for _ in range(steps):
            rec = self.train_step(next(data))
            if rec["step"] % log_every == 0:
                rate = (rec["step"] + 1) / (time.perf_counter() - t0)
                log_fn(f"codec-train step {rec['step']}: loss={rec['loss']:.4f} "
                       f"l1={rec['l1']:.4f} stft={rec['stft']:.4f} "
                       f"commit={rec['commitment']:.4f} ({rate:.2f} steps/s)")
        return self.history

    # ------------------------------ evaluation ------------------------------
    def evaluate(self, wav: np.ndarray) -> Dict[str, float]:
        """Round-trip the (non-ST) inference path and score reconstruction."""
        codec = self.tokenizer()
        codes = codec.batch_encode([w for w in wav],
                                   num_quantizers=self.num_quantizers)
        arr = codes.audio_codes  # (NQ, B, T)
        dec = codec.decode(arr, chunk_duration=None)
        recon = np.asarray(dec.audio)[:, 0]
        n = min(recon.shape[1], wav.shape[1])
        from .speech_synth import mcd_db

        shifted = [si_snr_shifted(recon[b, :n], wav[b, :n],
                                  self.cfg.sampling_rate)
                   for b in range(wav.shape[0])]
        return {
            "si_snr_db": float(np.mean(
                [si_snr(recon[b, :n], wav[b, :n]) for b in range(wav.shape[0])])),
            # delay-tolerant variant (±5 ms search): causal stacks can
            # reconstruct with a constant lag that plain SI-SNR scores as
            # catastrophic while being perceptually irrelevant
            "si_snr_shift_db": float(np.mean([d for d, _ in shifted])),
            "shift_samples": float(np.median([k for _, k in shifted])),
            "mel_dist": float(np.mean(
                [mel_distance(recon[b, :n], wav[b, :n]) for b in range(wav.shape[0])])),
            # ABX proxy: mel-cepstral distortion (phase-insensitive, dB)
            "mcd_db": float(np.mean(
                [mcd_db(recon[b, :n], wav[b, :n], self.cfg.sampling_rate)
                 for b in range(wav.shape[0])])),
        }

    def tokenizer(self) -> MossAudioTokenizer:
        return MossAudioTokenizer(self.params, self.cfg)

    def save(self, path) -> None:
        self.tokenizer().save_pretrained(path)
        with open(str(path) + "/train_history.json", "w") as f:
            json.dump(self.history, f)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="Train the TPU codec on synthetic audio (smoke).")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--n-q", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lag-tol", type=int, default=0,
                    help="waveform-loss lag tolerance in samples (0 = "
                         "strict alignment); lets L1/SI-SNR judge content "
                         "instead of fighting a constant causal delay")
    ap.add_argument("--snr-weight", type=float, default=1.0,
                    help="weight of the differentiable -SI-SNR term (time "
                         "alignment; magnitude STFT alone is phase-blind)")
    ap.add_argument("--adversarial", action="store_true",
                    help="enable the GAN half: MS-STFT + multi-period "
                         "discriminators, hinge losses, feature matching "
                         "(alternating G/D updates in one jitted step)")
    ap.add_argument("--adv-weight", type=float, default=3.0)
    ap.add_argument("--fm-weight", type=float, default=3.0)
    ap.add_argument("--adv-start", type=int, default=0,
                    help="step at which the adversarial terms switch on")
    ap.add_argument("--save", default=None)
    args = ap.parse_args(argv)

    cfg = CodecConfig(
        hidden_size=args.hidden, intermediate_size=args.hidden * 3,
        num_encoder_layers=args.layers, num_decoder_layers=args.layers,
        num_attention_heads=max(2, args.hidden // 32),
        num_key_value_heads=max(2, args.hidden // 32),
        head_dim=32, n_q=args.n_q, codebook_dim=min(64, args.hidden),
    )
    trainer = CodecTrainer(cfg, num_quantizers=args.n_q, peak_lr=args.lr,
                           warmup_steps=max(1, args.steps // 10),
                           total_steps=args.steps, snr_weight=args.snr_weight,
                           lag_tolerance=args.lag_tol,
                           adversarial=args.adversarial,
                           adv_weight=args.adv_weight,
                           fm_weight=args.fm_weight, adv_start=args.adv_start)
    data = synthetic_data_iter(0, args.batch, args.seconds, cfg.sampling_rate)
    eval_wav = synthetic_audio_batch(np.random.default_rng(99), 2, args.seconds,
                                     cfg.sampling_rate)
    before = trainer.evaluate(eval_wav)
    trainer.fit(data, args.steps)
    after = trainer.evaluate(eval_wav)
    print(json.dumps({"before": before, "after": after}))
    if args.save:
        trainer.save(args.save)


if __name__ == "__main__":
    main()
