"""Greedy-decode token-parity harness vs the PyTorch reference.

The BASELINE north star requires codec-token parity with the reference at
temperature 0. The reference needs torch+transformers>=5.0 and the released
checkpoints (this offline environment has neither), so the harness runs in
two halves that can execute on different machines:

  1) On a machine with the reference installed:
       python tools/parity_harness.py dump-reference \
           --model-path <MOSS-TTS ckpt> --codec-path <codec ckpt> \
           --out ref_tokens.npz
     Runs the reference MossTTSDelayModel.generate greedily
     (text_temperature=0, audio_temperature=0) on the prompts below and
     saves (start_length, token grid) per case.

  2) Here:
       python tools/parity_harness.py compare \
           --model-path <ckpt> --codec-path <codec> --ref ref_tokens.npz
     Loads the same checkpoint through mosstts_tpu.utils.checkpoints, runs
     DelayEngine.generate greedily on the same prompts, and diffs token
     grids exactly.

Prompt set: deterministic texts + the assets/ reference wavs, so both halves
construct identical inputs (tokenizer from the checkpoint).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

PROMPTS = [
    {"text": "Hello world, this is a parity check."},
    {"text": "今天天气真好，我们一起去公园散步吧。"},
    {"text": "Numbers: one two three four five.",
     "reference": "assets/audio/reference_en_1.wav"},
]


def dump_reference(args):
    import torch
    from transformers import AutoModel, AutoProcessor

    processor = AutoProcessor.from_pretrained(
        args.model_path, trust_remote_code=True, codec_path=args.codec_path
    )
    model = AutoModel.from_pretrained(
        args.model_path, trust_remote_code=True, torch_dtype=torch.bfloat16
    ).eval()

    results = {}
    for i, case in enumerate(PROMPTS):
        ref = case.get("reference")
        conv = [processor.build_user_message(
            text=case["text"],
            reference=[ref] if ref else None,
        )]
        batch = processor([conv], mode="generation")
        with torch.no_grad():
            out = model.generate(
                input_ids=batch["input_ids"], attention_mask=batch["attention_mask"],
                max_new_tokens=args.max_new_tokens,
                text_temperature=0.0, audio_temperature=0.0,
            )
        start_length, grid = out[0]
        results[f"case{i}_start"] = np.asarray(int(start_length))
        results[f"case{i}_grid"] = np.asarray(grid.cpu())
    np.savez(args.out, **results)
    print(f"wrote {args.out} ({len(PROMPTS)} cases)")


def compare(args):
    from mosstts_tpu.engine.delay_engine import DelayEngine
    from mosstts_tpu.processing.delay_processor import DelayProcessor
    from mosstts_tpu.processing.tokenizer import load_tokenizer
    from mosstts_tpu.codec.model import MossAudioTokenizer
    from mosstts_tpu.utils.checkpoints import load_delay_checkpoint

    params, cfg = load_delay_checkpoint(args.model_path)
    codec = MossAudioTokenizer.from_pretrained(args.codec_path)
    proc = DelayProcessor(load_tokenizer(args.model_path), codec, cfg)
    engine = DelayEngine(params, cfg)

    ref = np.load(args.ref)
    n_match = 0
    for i, case in enumerate(PROMPTS):
        r = case.get("reference")
        conv = [proc.build_user_message(
            text=case["text"], reference=[r] if r else None
        )]
        batch = proc([conv], mode="generation")
        out = engine.generate(
            batch["input_ids"], batch["attention_mask"],
            max_new_tokens=args.max_new_tokens,
            text_temperature=0.0, audio_temperature=0.0,
        )
        start_length, grid = out[0]
        want_start = int(ref[f"case{i}_start"])
        want_grid = ref[f"case{i}_grid"]
        T = min(len(grid), len(want_grid))
        same = (np.asarray(grid[:T]) == want_grid[:T]).all() and start_length == want_start
        print(f"case{i}: start {start_length} vs {want_start} | "
              f"grid match over {T} rows: {bool(same)}")
        n_match += bool(same)
    print(f"{n_match}/{len(PROMPTS)} cases token-identical")
    sys.exit(0 if n_match == len(PROMPTS) else 1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump-reference")
    d.add_argument("--model-path", required=True)
    d.add_argument("--codec-path", required=True)
    d.add_argument("--out", default="ref_tokens.npz")
    d.add_argument("--max-new-tokens", type=int, default=128)
    d.set_defaults(fn=dump_reference)
    c = sub.add_parser("compare")
    c.add_argument("--model-path", required=True)
    c.add_argument("--codec-path", required=True)
    c.add_argument("--ref", required=True)
    c.add_argument("--max-new-tokens", type=int, default=128)
    c.set_defaults(fn=compare)
    args = ap.parse_args()
    args.fn(args)
