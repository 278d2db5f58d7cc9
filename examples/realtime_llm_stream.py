"""Single-turn LLM-stream -> TTS example (framework analogue of the
reference's moss_tts_realtime/example_llm_stream_to_tts.py).

Simulates an LLM emitting text deltas; the bridge converts them to audio
chunks as they stabilize, reporting TTFA/RTF. Runs with demo random weights
when --model-path is absent (plumbing smoke), or with real checkpoints.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from mosstts_tpu.engine.metrics import SynthesisMetrics
from mosstts_tpu.engine.streaming import (
    AudioStreamDecoder,
    RealtimeStreamingSession,
    RealtimeTextStreamBridge,
)
from mosstts_tpu.serve.backend import load_realtime_backend
from mosstts_tpu.utils.audio import write_wav


def fake_llm_deltas(text: str, chunk_chars: int = 7):
    for i in range(0, len(text), chunk_chars):
        yield text[i : i + chunk_chars]
        time.sleep(0.0)  # an LLM would pace these


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--codec-path", default=None)
    ap.add_argument("--voice-prompt", default=None, help="wav path")
    ap.add_argument("--text", default=(
        "Hello! This example simulates a language model streaming text, "
        "and the TTS engine turning it into speech incrementally. "
        "Each sentence becomes audio as soon as enough tokens are stable."
    ))
    ap.add_argument("--output", default="llm_stream_out.wav")
    args = ap.parse_args()

    engine, proc, codec = load_realtime_backend(args.model_path, args.codec_path)
    session = RealtimeStreamingSession(engine, proc, codec=codec)
    if args.voice_prompt:
        session.set_voice_prompt(args.voice_prompt)

    # a turn built without a user message: empty user audio, minimal text
    # (reference example :281-300 builds the turn from the system prompt)
    user_audio = np.full((1, engine.config.rvq), 0, np.int64)
    session.reset_turn(user_text="", user_audio_tokens=user_audio)

    decoder = AudioStreamDecoder(codec, chunk_frames=12, overlap_frames=2)
    bridge = RealtimeTextStreamBridge(session, decoder)
    metrics = SynthesisMetrics(sample_rate=codec.sampling_rate)

    chunks = []
    with codec.streaming(batch_size=1):
        for wav in bridge.stream_from_text_deltas(fake_llm_deltas(args.text)):
            metrics.add_audio(wav.size)
            chunks.append(wav)

    if not chunks:
        print("no audio produced")
        return
    full = np.concatenate(chunks)
    write_wav(args.output, full, codec.sampling_rate)
    print(metrics.json())
    print(f"wrote {args.output} ({full.size / codec.sampling_rate:.2f}s)")


if __name__ == "__main__":
    main()
