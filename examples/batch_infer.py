"""Batch smoke scripts: Delay batched TTS + Realtime non-streaming batch
generate (framework analogues of the reference's moss_tts_realtime/infer.py
and the README Delay driver)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from mosstts_tpu.serve.backend import load_delay_backend, load_realtime_backend
from mosstts_tpu.utils.audio import write_wav

out_dir = Path(__file__).parent.parent / "out"
out_dir.mkdir(exist_ok=True)


def delay_batch(args):
    backend = load_delay_backend(args.model_path, args.codec_path)
    proc = backend.processor
    texts = ["First test sentence.", "Second, slightly longer test sentence."]
    rng = np.random.default_rng(0)
    convs = []
    for t in texts:
        ref = (rng.standard_normal(24000) * 0.1).astype(np.float32)
        codes = proc.encode_audios_from_wav([ref], 24000)[0]
        convs.append([
            proc.build_user_message(text=t),
            proc.build_assistant_message([codes]),
        ])
    batch = proc(convs, mode="continuation")
    out = backend.engine.generate(
        batch["input_ids"], batch["attention_mask"],
        max_new_tokens=args.max_new_tokens, audio_temperature=0.0,
        text_temperature=0.0,
    )
    msgs = proc.decode(out)
    for i, m in enumerate(msgs):
        if m and m.audio_codes_list:
            wav = np.concatenate([np.asarray(w).reshape(-1) for w in m.audio_codes_list])
            write_wav(str(out_dir / f"delay_batch_{i}.wav"), wav, backend.sample_rate)
            print(f"sample {i}: {wav.size / backend.sample_rate:.2f}s -> delay_batch_{i}.wav")
        else:
            print(f"sample {i}: no audio")


def realtime_batch(args):
    engine, proc, codec = load_realtime_backend(args.model_path, args.codec_path)
    rng = np.random.default_rng(0)
    grids, text_ids = [], []
    for t in ["Batched reply one.", "Batched reply number two, a bit longer."]:
        user_audio = rng.integers(0, 1024, (6, engine.config.rvq))
        grid = np.concatenate(
            [proc.make_ensemble(None), proc.make_user_prompt("question", user_audio)],
            axis=0,
        )
        grids.append(grid)
        text_ids.append(proc.tokenizer.encode(t))
    frames = engine.generate(grids, text_ids, max_length=args.max_new_tokens,
                             do_sample=False, temperature=0.0)
    for i, f in enumerate(frames):
        wav = codec.decode(f.T, chunk_duration=8)["audio"][0] if f.size else None
        if wav is not None and np.asarray(wav).size:
            write_wav(str(out_dir / f"realtime_batch_{i}.wav"), np.asarray(wav).reshape(-1),
                      codec.sampling_rate)
            print(f"sample {i}: {f.shape[0]} frames -> realtime_batch_{i}.wav")
        else:
            print(f"sample {i}: no audio ({f.shape[0]} frames)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["delay", "realtime"])
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--codec-path", default=None)
    ap.add_argument("--max-new-tokens", type=int, default=48)
    args = ap.parse_args()
    (delay_batch if args.mode == "delay" else realtime_batch)(args)
