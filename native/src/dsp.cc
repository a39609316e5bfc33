// Host-side DSP: PCM conversion loops and the windowed-sinc polyphase
// resampler. Same math as auralis_tpu/ops/resample.py (which mirrors
// torchaudio.functional.resample sinc_interp_hann: lowpass_filter_width=6,
// rolloff=0.99 — the reference's load-time resampling path,
// common/utilities.py:93-94). Mono float32 in/out.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

#include "../include/auralis_native.h"

extern "C" {

void at_f32_to_i16(const float* in, int64_t n, int16_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    float q = v * 32767.0f;
    out[i] = static_cast<int16_t>(q >= 0 ? q + 0.5f : q - 0.5f);
  }
}

void at_i16_to_f32(const int16_t* in, int64_t n, float* out) {
  constexpr float kInv = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] * kInv;
}

void at_f32_to_i32(const float* in, int64_t n, int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    double q = static_cast<double>(v) * 2147483647.0;
    out[i] = static_cast<int32_t>(q >= 0 ? q + 0.5 : q - 0.5);
  }
}

float at_peak_abs(const float* in, int64_t n) {
  float peak = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float a = std::fabs(in[i]);
    if (a > peak) peak = a;
  }
  return peak;
}

int at_resample(const float* in, int64_t n, int orig_freq, int new_freq,
                int lowpass_filter_width, double rolloff, float** out,
                int64_t* n_out) {
  if (!in || !out || !n_out || n <= 0 || orig_freq <= 0 || new_freq <= 0) return -1;
  if (lowpass_filter_width <= 0) lowpass_filter_width = 6;
  if (rolloff <= 0.0 || rolloff > 1.0) rolloff = 0.99;

  if (orig_freq == new_freq) {
    *out = static_cast<float*>(std::malloc(n * sizeof(float)));
    if (!*out) return -3;
    std::memcpy(*out, in, n * sizeof(float));
    *n_out = n;
    return 0;
  }

  const int g = static_cast<int>(std::gcd<int64_t>(orig_freq, new_freq));
  const int orig = orig_freq / g;
  const int nu = new_freq / g;

  const double base_freq = static_cast<double>(orig < nu ? orig : nu) * rolloff;
  const int width =
      static_cast<int>(std::ceil(lowpass_filter_width * orig / base_freq));
  const int klen = 2 * width + orig;  // taps per output phase

  // kernel[phase][tap], phase p computes output sample at time p/nu (in input
  // units), identical to _sinc_kernel in ops/resample.py
  std::vector<double> kernel(static_cast<size_t>(nu) * klen);
  for (int p = 0; p < nu; ++p) {
    for (int j = 0; j < klen; ++j) {
      double t = (-static_cast<double>(p) / nu + static_cast<double>(j - width) / orig) *
                 base_freq;
      if (t < -lowpass_filter_width) t = -lowpass_filter_width;
      if (t > lowpass_filter_width) t = lowpass_filter_width;
      double window = std::cos(t * M_PI / lowpass_filter_width / 2.0);
      window *= window;
      double tp = t * M_PI;
      double sinc = (tp == 0.0) ? 1.0 : std::sin(tp) / tp;
      kernel[static_cast<size_t>(p) * klen + j] = sinc * window * base_freq / orig;
    }
  }

  const int64_t target = (n * nu + orig - 1) / orig;  // ceil(n * nu / orig)
  float* result = static_cast<float*>(std::malloc(target * sizeof(float)));
  if (!result) return -3;

  // output sample (w, p) reads input window starting at w*orig - width
  const int64_t num_wins = (n + orig - 1) / orig;  // enough windows to cover target
  int64_t oi = 0;
  for (int64_t w = 0; w < num_wins && oi < target; ++w) {
    const int64_t in_start = w * orig - width;
    for (int p = 0; p < nu && oi < target; ++p) {
      const double* kp = &kernel[static_cast<size_t>(p) * klen];
      double acc = 0.0;
      int64_t j0 = in_start < 0 ? -in_start : 0;
      int64_t j1 = klen;
      if (in_start + j1 > n) j1 = n - in_start;
      for (int64_t j = j0; j < j1; ++j) acc += kp[j] * in[in_start + j];
      result[oi++] = static_cast<float>(acc);
    }
  }
  while (oi < target) result[oi++] = 0.0f;

  *out = result;
  *n_out = target;
  return 0;
}

}  // extern "C"
