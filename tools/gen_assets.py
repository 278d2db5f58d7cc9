#!/usr/bin/env python
"""Regenerate the synthetic reference-audio assets (offline stand-ins for
the reference repo's 12 reference recordings, assets/audio/* there).

Each clip is a distinct "voice": a harmonic stack with its own F0 contour,
formant-ish band emphasis, vibrato and breath-noise floor — enough spectral
identity for demo flows, codec round-trips and speaker-slot plumbing to be
exercised offline. Deterministic (seeded per file name).
"""
from __future__ import annotations

import sys
import wave
import zlib
from pathlib import Path

import numpy as np

SR = 24000
OUT = Path(__file__).parent.parent / "assets" / "audio"

VOICES = {
    # name: (f0 base Hz, f0 drift Hz, vibrato Hz, brightness, seconds)
    "reference_en_1": (120, 18, 4.5, 0.5, 2.0),
    "reference_en_2": (210, 30, 5.5, 0.8, 2.0),
    "reference_en_3": (95, 10, 3.8, 0.35, 2.5),
    "reference_en_4": (175, 24, 5.0, 0.65, 2.5),
    "reference_zh_1": (230, 35, 6.0, 0.9, 2.0),
    "reference_zh_2": (135, 15, 4.2, 0.45, 2.0),
    "reference_zh_3": (185, 28, 5.2, 0.7, 2.5),
    "reference_zh_4": (105, 12, 4.0, 0.4, 2.5),
    # two-speaker dialogue pair (reference assets/audio/reference_02_s{1,2})
    "reference_dialog_s1": (150, 20, 4.8, 0.55, 3.0),
    "reference_dialog_s2": (240, 32, 5.8, 0.85, 3.0),
    "reference_sfx_room": (0, 0, 0, 0.0, 2.0),  # ambience: filtered noise
    "reference_sfx_tone": (440, 0, 0, 1.0, 1.5),  # pure calibration tone
}


def synth(name: str, f0: float, drift: float, vib: float, bright: float,
          seconds: float) -> np.ndarray:
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    n = int(seconds * SR)
    t = np.arange(n) / SR
    if f0 <= 0:  # ambience: band-limited noise with slow amplitude motion
        x = rng.standard_normal(n)
        kern = np.hanning(129)
        kern /= kern.sum()
        x = np.convolve(x, kern, mode="same")
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 0.7 * t + rng.uniform(0, 6))
        return (x * env * 0.3).astype(np.float32)
    contour = f0 + drift * np.sin(2 * np.pi * 0.35 * t + rng.uniform(0, 6))
    if vib > 0:
        contour = contour * (1 + 0.01 * np.sin(2 * np.pi * vib * t))
    phase = 2 * np.pi * np.cumsum(contour) / SR
    x = np.zeros(n)
    for h in range(1, 9):
        amp = (bright ** (h - 1)) / h
        x += amp * np.sin(h * phase + rng.uniform(0, 6))
    # syllable-ish amplitude envelope + breath floor
    env = 0.25 + 0.75 * np.clip(np.sin(2 * np.pi * 2.8 * t + 0.4), 0, None)
    x = x * env + 0.02 * rng.standard_normal(n)
    fade = min(n // 20, 1200)
    x[:fade] *= np.linspace(0, 1, fade)
    x[-fade:] *= np.linspace(1, 0, fade)
    x = x / (np.abs(x).max() + 1e-9) * 0.6
    return x.astype(np.float32)


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, spec in VOICES.items():
        wav = synth(name, *spec)
        path = OUT / f"{name}.wav"
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes((np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes())
        print(f"{path} ({len(wav) / SR:.1f}s)")


if __name__ == "__main__":
    main()
