// Native host-side data pipeline (SURVEY.md §1 L2).
//
// The reference's data path is pure Python/NumPy; for a production TPU
// training loop the host must keep up with the chip, so the hot
// preprocessing (RIFF wav parse -> mono float -> mu-law levels, plus the
// TBPTT chunk gather) is implemented here and exposed via a C ABI that
// samplernn_pase_tpu/data/native_loader.py binds with ctypes.
//
// The mu-law contract is frozen to match ops/mulaw.py bit-for-bit on the
// same float inputs: y = sign(x) * log1p(mu|x|)/log1p(mu);
// level = clip(floor((y+1)/2*mu + 0.5), 0, mu); computed in float32 like
// the XLA path (double only for the constant log1p(mu)).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- mu-law

void srnn_mulaw_encode(const float* x, int32_t* out, int64_t n,
                       int32_t q_levels) {
  const float mu = static_cast<float>(q_levels - 1);
  const float inv_log1p_mu = 1.0f / log1pf(mu);
  for (int64_t i = 0; i < n; ++i) {
    float v = x[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    float sign = (v > 0.0f) ? 1.0f : ((v < 0.0f) ? -1.0f : 0.0f);
    float y = sign * log1pf(mu * fabsf(v)) * inv_log1p_mu;
    float lv = floorf((y + 1.0f) * 0.5f * mu + 0.5f);
    if (lv < 0.0f) lv = 0.0f;
    if (lv > mu) lv = mu;
    out[i] = static_cast<int32_t>(lv);
  }
}

void srnn_mulaw_decode(const int32_t* lv, float* out, int64_t n,
                       int32_t q_levels) {
  const float mu = static_cast<float>(q_levels - 1);
  const float log1p_mu = log1pf(mu);
  for (int64_t i = 0; i < n; ++i) {
    float y = 2.0f * (static_cast<float>(lv[i]) / mu) - 1.0f;
    float sign = (y > 0.0f) ? 1.0f : ((y < 0.0f) ? -1.0f : 0.0f);
    out[i] = sign * expm1f(fabsf(y) * log1p_mu) / mu;
  }
}

// ------------------------------------------------------------- wav parse

// Minimal RIFF/WAVE reader: PCM16 / PCM32 / IEEE float32, any channel
// count (downmixed to mono). Returns the number of samples written to
// `out` (<= max_len), or -1 on parse error. Writes the sample rate to
// *sr_out. Two-pass use: call with out == nullptr to get the length.
int64_t srnn_read_wav(const char* path, float* out, int64_t max_len,
                      int32_t* sr_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  auto fail = [&]() -> int64_t { fclose(f); return -1; };

  char tag[5] = {0};
  uint32_t riff_size = 0;
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "RIFF", 4)) return fail();
  if (fread(&riff_size, 4, 1, f) != 1) return fail();
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "WAVE", 4)) return fail();

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  bool have_fmt = false;
  while (fread(tag, 1, 4, f) == 4) {
    uint32_t chunk_size = 0;
    if (fread(&chunk_size, 4, 1, f) != 1) return fail();
    if (!memcmp(tag, "fmt ", 4)) {
      uint8_t buf[16];
      if (chunk_size < 16 || fread(buf, 1, 16, f) != 16) return fail();
      memcpy(&fmt, buf + 0, 2);
      memcpy(&channels, buf + 2, 2);
      memcpy(&sample_rate, buf + 4, 4);
      memcpy(&bits, buf + 14, 2);
      have_fmt = true;
      if (chunk_size > 16) fseek(f, chunk_size - 16, SEEK_CUR);
    } else if (!memcmp(tag, "data", 4)) {
      if (!have_fmt || channels == 0) return fail();
      const bool is_float = (fmt == 3);
      const bool is_pcm = (fmt == 1);
      if (!is_float && !is_pcm) return fail();
      int bytes = bits / 8;
      if (bytes != 2 && bytes != 4) return fail();
      int64_t n_frames = chunk_size / (bytes * channels);
      if (sr_out) *sr_out = static_cast<int32_t>(sample_rate);
      if (!out) { fclose(f); return n_frames; }
      if (n_frames > max_len) n_frames = max_len;

      std::vector<uint8_t> raw(static_cast<size_t>(bytes) * channels);
      for (int64_t i = 0; i < n_frames; ++i) {
        if (fread(raw.data(), 1, raw.size(), f) != raw.size())
          return fail();
        float acc = 0.0f;
        for (int c = 0; c < channels; ++c) {
          const uint8_t* p = raw.data() + static_cast<size_t>(c) * bytes;
          float v;
          if (is_float) {
            float tmp;
            memcpy(&tmp, p, 4);
            v = tmp;
          } else if (bytes == 2) {
            int16_t tmp;
            memcpy(&tmp, p, 2);
            v = static_cast<float>(tmp) / 32768.0f;
          } else {
            int32_t tmp;
            memcpy(&tmp, p, 4);
            v = static_cast<float>(tmp) / 2147483648.0f;
          }
          acc += v;
        }
        acc /= static_cast<float>(channels);
        if (acc > 1.0f) acc = 1.0f;
        if (acc < -1.0f) acc = -1.0f;
        out[i] = acc;
      }
      fclose(f);
      return n_frames;
    } else {
      fseek(f, chunk_size + (chunk_size & 1), SEEK_CUR);
    }
  }
  return fail();
}

// Fused: wav file -> mu-law levels, one pass over the decoded floats.
int64_t srnn_load_quantized(const char* path, int32_t* out_levels,
                            int64_t max_len, int32_t q_levels,
                            int32_t* sr_out) {
  int64_t n = srnn_read_wav(path, nullptr, 0, sr_out);
  if (n < 0) return -1;
  if (n > max_len) n = max_len;
  std::vector<float> buf(static_cast<size_t>(n));
  int64_t got = srnn_read_wav(path, buf.data(), n, sr_out);
  if (got < 0) return -1;
  srnn_mulaw_encode(buf.data(), out_levels, got, q_levels);
  return got;
}

// --------------------------------------------------- TBPTT chunk gather

// Assemble one aligned TBPTT batch step: for each lane b, copy the
// pre-computed window of `w` int32 levels starting at address srcs[b]
// into row b of `out` [batch, w].  The Python StreamBatcher pre-pads
// each utterance and pre-resolves per-(step, lane) window addresses, so
// the per-step host work collapses to this one batched memcpy (the
// reference's DataLoader re-slices and re-stacks in Python every step).
void srnn_gather_windows(const int64_t* srcs, int32_t batch, int64_t w,
                         int32_t* out) {
  for (int32_t b = 0; b < batch; ++b) {
    memcpy(out + static_cast<int64_t>(b) * w,
           reinterpret_cast<const int32_t*>(srcs[b]),
           static_cast<size_t>(w) * sizeof(int32_t));
  }
}

}  // extern "C"
