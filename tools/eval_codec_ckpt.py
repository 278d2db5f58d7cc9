"""Re-score a saved codec checkpoint on the held-out synthetic suite.

Round-trips the checkpoint through the inference path and reports every
quality metric in ``codec/train.py`` (plain + delay-tolerant SI-SNR, mel
distance, MCD) — used to re-evaluate checkpoints saved by runs that
predate a metric (e.g. the ±5 ms shifted SI-SNR), and to compare two
training recipes on the identical eval batch.

Usage (TPU or CPU):
    python tools/eval_codec_ckpt.py /tmp/codec_speech_r4 --data speech
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mosstts_tpu.codec.model import MossAudioTokenizer  # noqa: E402
from mosstts_tpu.codec.speech_synth import mcd_db  # noqa: E402
from mosstts_tpu.codec.train import (  # noqa: E402
    mel_distance,
    si_snr,
    si_snr_shifted,
    synthetic_audio_batch,
)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("ckpt")
    ap.add_argument("--data", choices=("tones", "speech"), default="speech")
    ap.add_argument("--batch", type=int, default=4,
                    help="held-out batch size (seed 99, the long-run batch)")
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--max-shift-ms", type=float, default=5.0)
    args = ap.parse_args(argv)

    codec = MossAudioTokenizer.from_pretrained(args.ckpt)
    sr = codec.config.sampling_rate
    if args.data == "speech":
        from mosstts_tpu.codec.speech_synth import synthetic_speech_batch

        wav = synthetic_speech_batch(np.random.default_rng(99), args.batch,
                                     args.seconds, sr)
    else:
        wav = synthetic_audio_batch(np.random.default_rng(99), args.batch,
                                    args.seconds, sr)

    codes = codec.batch_encode([w for w in wav])
    dec = codec.decode(codes.audio_codes, chunk_duration=None)
    recon = np.asarray(dec.audio)[:, 0]
    n = min(recon.shape[1], wav.shape[1])

    shifted = [si_snr_shifted(recon[b, :n], wav[b, :n], sr,
                              max_shift_ms=args.max_shift_ms)
               for b in range(wav.shape[0])]
    rec = {
        "ckpt": args.ckpt,
        "data": args.data,
        "si_snr_db": round(float(np.mean(
            [si_snr(recon[b, :n], wav[b, :n])
             for b in range(wav.shape[0])])), 3),
        "si_snr_shift_db": round(float(np.mean([d for d, _ in shifted])), 3),
        "shift_samples": [k for _, k in shifted],
        "mel_dist": round(float(np.mean(
            [mel_distance(recon[b, :n], wav[b, :n])
             for b in range(wav.shape[0])])), 3),
        "mcd_db": round(float(np.mean(
            [mcd_db(recon[b, :n], wav[b, :n], sr)
             for b in range(wav.shape[0])])), 3),
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
