"""Long codec training run, chunked: periodic held-out eval + checkpoint.

Wraps CodecTrainer for multi-hour runs on the one TPU chip:
  * evaluates SI-SNR / mel on a fixed held-out batch every --eval-every
    steps and prints one JSON line per eval (greppable trajectory),
  * saves the tokenizer checkpoint after every eval (a kill loses at most
    one chunk),
  * stops at --max-minutes wall clock so a bounded run still checkpoints
    and reports, instead of dying mid-step under `timeout`.

The known-good schedule from docs/PROFILE.md: reconstruction-only first
(--adv-start), then the GAN phase — starting discriminators early fights
time-alignment and regresses SI-SNR by ~20 dB.

Usage (the round-3 quality run):
    python tools/train_codec_long.py --steps 14000 --adv-start 5000 \
        --batch 8 --hidden 256 --layers 6 --n-q 32 --snr-weight 2 \
        --save /tmp/codec_long --max-minutes 150
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mosstts_tpu.codec.train import (  # noqa: E402
    CodecTrainer,
    synthetic_audio_batch,
    synthetic_data_iter,
)
from mosstts_tpu.core.config import CodecConfig  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=14000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--n-q", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--snr-weight", type=float, default=2.0)
    ap.add_argument("--lag-tol", type=int, default=0,
                    help="waveform-loss lag tolerance in samples "
                         "(codec/losses.lag_align)")
    ap.add_argument("--adv-start", type=int, default=5000)
    ap.add_argument("--adv-weight", type=float, default=3.0)
    ap.add_argument("--fm-weight", type=float, default=3.0)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--save", default=None)
    ap.add_argument("--max-minutes", type=float, default=0.0,
                    help="stop (checkpoint + report) after this wall time")
    ap.add_argument("--data", choices=("tones", "speech"), default="speech",
                    help="training distribution: harmonic tone mixtures, or "
                         "formant-synthesized speech (pitch/prosody "
                         "trajectories, vowel formant glides, fricatives — "
                         "codec/speech_synth.py)")
    ap.add_argument("--preset", choices=("custom", "1p6b"), default="custom",
                    help="'1p6b' trains the PARITY-SCALE codec_1p6b preset "
                         "(~1.5B params, the reference Cat codec scale) and "
                         "ignores --hidden/--layers; requires "
                         "--optimizer adafactor on one 16 GB chip")
    ap.add_argument("--optimizer", choices=("adamw", "adafactor"),
                    default="adamw",
                    help="adafactor drops AdamW's two f32 moments "
                         "(~12.4 GB at 1p6b scale) for factored stats")
    ap.add_argument("--no-adversarial", action="store_true",
                    help="reconstruction-only trainer (also skips building "
                         "the discriminators — the memory headroom the "
                         "1p6b recon-first run needs)")
    args = ap.parse_args(argv)

    if args.preset == "1p6b":
        from mosstts_tpu.core.config import codec_1p6b

        cfg = codec_1p6b(n_q=args.n_q)
    else:
        cfg = CodecConfig(
            hidden_size=args.hidden, intermediate_size=args.hidden * 3,
            num_encoder_layers=args.layers, num_decoder_layers=args.layers,
            num_attention_heads=max(2, args.hidden // 32),
            num_key_value_heads=max(2, args.hidden // 32),
            head_dim=32, n_q=args.n_q, codebook_dim=min(64, args.hidden),
        )
    trainer = CodecTrainer(
        cfg, num_quantizers=args.n_q, peak_lr=args.lr,
        warmup_steps=max(1, args.steps // 20), total_steps=args.steps,
        snr_weight=args.snr_weight, lag_tolerance=args.lag_tol,
        adversarial=not args.no_adversarial,
        adv_weight=args.adv_weight, fm_weight=args.fm_weight,
        adv_start=args.adv_start, optimizer=args.optimizer)

    if args.data == "speech":
        from mosstts_tpu.codec.speech_synth import (
            synthetic_speech_batch,
            synthetic_speech_iter,
        )

        data = synthetic_speech_iter(0, args.batch, args.seconds,
                                     cfg.sampling_rate)
        # held-out: a different seed than any training batch
        eval_wav = synthetic_speech_batch(np.random.default_rng(99), 4,
                                          args.seconds, cfg.sampling_rate)
    else:
        data = synthetic_data_iter(0, args.batch, args.seconds,
                                   cfg.sampling_rate)
        eval_wav = synthetic_audio_batch(np.random.default_rng(99), 4,
                                         args.seconds, cfg.sampling_rate)

    t0 = time.perf_counter()
    deadline = t0 + args.max_minutes * 60 if args.max_minutes else None
    best = -1e9
    # under --lag-tol the model legitimately converges to a constant-lag
    # output, which plain SI-SNR scores as catastrophic (that mismatch is
    # why si_snr_shift_db exists) — select the checkpoint on the
    # shift-tolerant metric in that mode or the "best" save is noise
    select_key = "si_snr_shift_db" if args.lag_tol > 0 else "si_snr_db"

    def report(tag: str):
        nonlocal best
        m = trainer.evaluate(eval_wav)
        rec = {"tag": tag, "step": trainer.step_idx,
               "wall_min": round((time.perf_counter() - t0) / 60, 1), **m}
        print(json.dumps(rec), flush=True)
        if m[select_key] > best:
            best = m[select_key]
            if args.save:
                trainer.save(args.save)
        return m

    report("init")
    while trainer.step_idx < args.steps:
        n = min(args.eval_every, args.steps - trainer.step_idx)
        trainer.fit(data, n, log_every=100)
        report("eval")
        if deadline and time.perf_counter() > deadline:
            print(json.dumps({"tag": "deadline", "step": trainer.step_idx}),
                  flush=True)
            break
    final = report("final")
    print(json.dumps({"tag": "done", "best_" + select_key: best, **final}),
          flush=True)


if __name__ == "__main__":
    main()
