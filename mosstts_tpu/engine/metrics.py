"""Serving metrics + profiling hooks.

The reference instruments TTFB/RTF ad-hoc inside its gradio app
(moss_tts_realtime/app.py:929-947); here they are first-class: a
``SynthesisMetrics`` accumulator every engine/pipeline can feed, and
``trace_span`` wrapping ``jax.profiler.TraceAnnotation`` so prefill/step/
codec phases show up in TPU profiles (SURVEY.md S5.1 plan).
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace_span(name: str):
    """jax.profiler annotation + wall-clock span (no-op cost when no
    profiler session is active)."""
    try:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:
        ctx = contextlib.nullcontext()
    with ctx:
        yield


@dataclass
class SynthesisMetrics:
    """Tracks one synthesis/streaming session."""

    sample_rate: int = 24000
    frame_rate: float = 12.5
    started_at: float = field(default_factory=time.monotonic)
    first_audio_at: Optional[float] = None
    audio_samples: int = 0
    frames: int = 0
    prefill_seconds: float = 0.0
    spans: Dict[str, float] = field(default_factory=dict)

    def mark_first_audio(self):
        if self.first_audio_at is None:
            self.first_audio_at = time.monotonic()

    def add_audio(self, n_samples: int):
        if n_samples > 0:
            self.mark_first_audio()
            self.audio_samples += int(n_samples)

    def add_frames(self, n: int):
        self.frames += int(n)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.monotonic()
        with trace_span(name):
            yield
        self.spans[name] = self.spans.get(name, 0.0) + time.monotonic() - t0

    @property
    def ttfa(self) -> Optional[float]:
        """Time to first audio (the p50-TTFA serving target, BASELINE.md)."""
        if self.first_audio_at is None:
            return None
        return self.first_audio_at - self.started_at

    @property
    def elapsed(self) -> float:
        return time.monotonic() - self.started_at

    @property
    def rtf(self) -> Optional[float]:
        """Realtime factor: audio seconds produced per wall second."""
        if self.audio_samples == 0 or self.elapsed <= 0:
            return None
        return (self.audio_samples / self.sample_rate) / self.elapsed

    @property
    def frames_per_second(self) -> Optional[float]:
        if self.frames == 0 or self.elapsed <= 0:
            return None
        return self.frames / self.elapsed

    def report(self) -> Dict:
        return {
            "ttfa_s": round(self.ttfa, 4) if self.ttfa is not None else None,
            "rtf_x": round(self.rtf, 3) if self.rtf is not None else None,
            "audio_s": round(self.audio_samples / self.sample_rate, 3),
            "frames": self.frames,
            "frames_per_s": round(self.frames_per_second, 1)
            if self.frames_per_second else None,
            "elapsed_s": round(self.elapsed, 3),
            "spans": {k: round(v, 3) for k, v in self.spans.items()},
        }

    def json(self) -> str:
        return json.dumps(self.report())
