// Native audio runtime: host-side DSP hot paths for the serving layer.
//
// The reference leans on torchaudio's C++ ops for resampling / IO
// (processing_moss_tts.py:795-875); this library provides the equivalents
// for the TPU framework's host side: a windowed-sinc polyphase resampler,
// PCM16<->float conversion, linear crossfade, and RMS loudness gain.
// Exposed through ctypes (mosstts_tpu/utils/native.py) with pure-numpy
// fallbacks when the library isn't built.
//
// Build: g++ -O3 -march=native -shared -fPIC audio_kernels.cpp -o libmossaudio.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Polyphase windowed-sinc resampler (Kaiser-windowed, zero-phase).
// in: n_in samples; out buffer must hold ceil(n_in * up / down) samples.
// Returns the number of output samples written.
int64_t resample_poly(
    const float* in, int64_t n_in,
    int32_t up, int32_t down,
    int32_t half_width,           // filter half-width in output-rate taps (e.g. 32)
    float* out, int64_t out_cap) {
  if (up <= 0 || down <= 0 || n_in <= 0) return 0;
  const int64_t n_out = (n_in * up + down - 1) / down;
  if (n_out > out_cap) return -1;

  // Anti-aliasing cutoff at min(1/up, 1/down) of the upsampled Nyquist.
  const double cutoff = 0.5 / std::max(up, down);
  const int64_t taps_per_phase = 2 * half_width + 1;

  // Build the polyphase filter bank: phase p, tap t corresponds to
  // upsampled-domain index (t - half_width) * up + p ... we directly
  // evaluate the continuous sinc at the needed fractional positions.
  // h(x) = 2*cutoff*up * sinc(2*cutoff*x) * blackman-harris window
  const double win_scale = 1.0 / (double)(half_width * up);
  std::vector<std::vector<float>> bank(up, std::vector<float>(taps_per_phase));
  for (int32_t p = 0; p < up; ++p) {
    for (int64_t t = 0; t < taps_per_phase; ++t) {
      // input-domain offset of this tap relative to the output sample
      const double x = (double)(t - half_width) - (double)p / (double)up;
      const double arg = 2.0 * M_PI * cutoff * up * x;
      double sinc = (std::abs(arg) < 1e-12) ? 1.0 : std::sin(arg) / arg;
      // Blackman window over [-half_width*up, half_width*up]
      const double w_pos = std::clamp(x * win_scale * up, -1.0, 1.0);
      const double w = 0.42 + 0.5 * std::cos(M_PI * w_pos) + 0.08 * std::cos(2.0 * M_PI * w_pos);
      bank[p][t] = (float)(2.0 * cutoff * up * sinc * w);
    }
  }

  for (int64_t i = 0; i < n_out; ++i) {
    // output sample i sits at input position i * down / up
    const int64_t num = i * down;
    const int64_t in_center = num / up;
    const int32_t phase = (int32_t)(num % up);
    double acc = 0.0;
    const float* h = bank[phase].data();
    const int64_t t0 = in_center - half_width;
    const int64_t lo = std::max<int64_t>(0, -t0);
    const int64_t hi = std::min<int64_t>(taps_per_phase, n_in - t0);
    const float* src = in + t0 + lo;
    for (int64_t t = lo; t < hi; ++t) acc += (double)h[t] * (double)(*src++);
    out[i] = (float)acc;
  }
  return n_out;
}

// Linear crossfade: head = prev_tail (n_overlap), body = wav (n_wav).
// out must hold n_prev + n_wav - n_overlap samples.
int64_t crossfade(
    const float* prev_tail, int64_t n_prev,
    const float* wav, int64_t n_wav,
    int64_t n_overlap,
    float* out) {
  n_overlap = std::min({n_overlap, n_prev, n_wav});
  const int64_t n_keep = n_prev - n_overlap;
  std::memcpy(out, prev_tail, n_keep * sizeof(float));
  for (int64_t i = 0; i < n_overlap; ++i) {
    const float fade_out = 1.0f - (float)i / (float)std::max<int64_t>(1, n_overlap - 1);
    const float fade_in = 1.0f - fade_out;
    out[n_keep + i] = prev_tail[n_keep + i] * fade_out + wav[i] * fade_in;
  }
  std::memcpy(out + n_prev, wav + n_overlap, (n_wav - n_overlap) * sizeof(float));
  return n_prev + n_wav - n_overlap;
}

void float_to_pcm16(const float* in, int64_t n, int16_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i] * 32767.0f;
    v = std::max(-32768.0f, std::min(32767.0f, v));
    out[i] = (int16_t)std::lrintf(v);
  }
}

void pcm16_to_float(const int16_t* in, int64_t n, float* out) {
  const float s = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] * s;
}

// RMS loudness gain toward target dBFS, clamped to [gain_min, gain_max] dB.
// Returns the linear gain factor.
float loudness_gain(const float* in, int64_t n, float target_dbfs,
                    float gain_min_db, float gain_max_db) {
  if (n <= 0) return 1.0f;
  double acc = 0.0;
  for (int64_t i = 0; i < n; ++i) acc += (double)in[i] * (double)in[i];
  const double dbfs = 10.0 * std::log10(acc / (double)n + 1e-9);
  double gain_db = target_dbfs - dbfs;
  gain_db = std::max((double)gain_min_db, std::min((double)gain_max_db, gain_db));
  return (float)std::pow(10.0, gain_db / 20.0);
}

void apply_gain(float* buf, int64_t n, float gain) {
  for (int64_t i = 0; i < n; ++i) buf[i] *= gain;
}

}  // extern "C"
