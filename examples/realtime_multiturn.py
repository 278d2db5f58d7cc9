"""Multi-turn streaming dialogue with KV-cache reuse across turns
(framework analogue of the reference's example_multiturn_stream_to_tts.py:
the backbone cache and attention mask carry over; only turn 0 includes the
system prompt, reference :287-358)."""
import argparse
import sys
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

TURNS = [
    ("What's the weather like?", "It's sunny and warm today, around 24 degrees."),
    ("Should I bring a jacket?", "A light one for the evening; it cools down after sunset."),
    ("Thanks!", "You're welcome. Enjoy your day outside!"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--codec-path", default=None)
    ap.add_argument("--output-prefix", default="turn")
    args = ap.parse_args()

    engine, proc, codec = load_realtime_backend(args.model_path, args.codec_path)
    session = RealtimeStreamingSession(engine, proc, codec=codec)
    rng = np.random.default_rng(0)

    for turn_idx, (user_text, reply) in enumerate(TURNS):
        # user audio would come from ASR/codec in a real agent
        user_audio = rng.integers(0, 1024, (6, engine.config.rvq))
        # KV reuse: reset_cache only if this is a fresh conversation
        session.reset_turn(
            user_text=user_text, user_audio_tokens=user_audio,
            reset_cache=(turn_idx == 0),
        )
        decoder = AudioStreamDecoder(codec, chunk_frames=12, overlap_frames=2)
        bridge = RealtimeTextStreamBridge(session, decoder)
        metrics = SynthesisMetrics(sample_rate=codec.sampling_rate)

        chunks = []
        with codec.streaming(batch_size=1):
            for wav in bridge.stream_from_text_deltas([reply]):
                metrics.add_audio(wav.size)
                chunks.append(wav)
        used = int(np.asarray(engine.state.cur_len)) if engine.state is not None else 0
        if chunks:
            full = np.concatenate(chunks)
            out = f"{args.output_prefix}{turn_idx}.wav"
            write_wav(out, full, codec.sampling_rate)
            print(f"turn {turn_idx}: {metrics.json()} kv_slots_used={used} -> {out}")
        else:
            print(f"turn {turn_idx}: no audio (kv_slots_used={used})")


if __name__ == "__main__":
    main()
