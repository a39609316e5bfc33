/* auralis_native — first-party C++ host-side audio runtime.
 *
 * The reference framework gets its host audio codecs and DSP from native
 * third-party libraries (ffmpeg via AudioSegment, libsndfile via soundfile,
 * torchaudio C++ ops — reference common/definitions/output.py:119-187,
 * common/utilities.py:74-98). This library is the TPU build's first-party
 * equivalent: FLAC encode/decode, PCM conversion, and a windowed-sinc
 * polyphase resampler, exposed over a plain C ABI for ctypes.
 */
#ifndef AURALIS_NATIVE_H_
#define AURALIS_NATIVE_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- memory ---- */
void at_free(void* p);

/* ---- FLAC ----
 * Encode float32 mono/stereo PCM (interleaved, [-1,1]) to a FLAC stream.
 * bits_per_sample: 16 or 24. block_size: samples per frame (0 -> 4096).
 * Returns 0 on success; *out is malloc'd (free with at_free).
 */
int at_flac_encode(const float* samples, int64_t n_frames, int channels,
                   int sample_rate, int bits_per_sample, int block_size,
                   uint8_t** out, int64_t* out_len);

/* Decode a FLAC stream produced by at_flac_encode (constant / verbatim /
 * fixed-predictor subframes; LPC subframes are not supported and return -2).
 * *out is malloc'd interleaved float32. Returns 0 on success. */
int at_flac_decode(const uint8_t* data, int64_t len, float** out,
                   int64_t* n_frames, int* channels, int* sample_rate);

/* ---- PCM conversion (vectorized host loops) ---- */
void at_f32_to_i16(const float* in, int64_t n, int16_t* out);
void at_i16_to_f32(const int16_t* in, int64_t n, float* out);
void at_f32_to_i32(const float* in, int64_t n, int32_t* out);

/* Peak absolute value over n samples. */
float at_peak_abs(const float* in, int64_t n);

/* ---- Resampling ----
 * Windowed-sinc polyphase resampler; same math as torchaudio's
 * sinc_interp_hann (lowpass_filter_width=6, rolloff=0.99) and the JAX/numpy
 * implementations in auralis_tpu/ops/resample.py. Mono only ([n] float32).
 * *out is malloc'd; n_out = ceil(n * new_freq / orig_freq). Returns 0. */
int at_resample(const float* in, int64_t n, int orig_freq, int new_freq,
                int lowpass_filter_width, double rolloff, float** out,
                int64_t* n_out);

/* Library ABI version (bump on breaking changes). */
int at_abi_version(void);

#ifdef __cplusplus
}
#endif

#endif /* AURALIS_NATIVE_H_ */
