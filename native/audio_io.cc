// Native host-side audio IO for the TPU input pipeline.
//
// The reference repo ships no native code (SURVEY §2: its native layer is
// torch's CUDA kernels). In this framework the host decode path is the
// component that benefits from C++: the TPU consumes fixed 80000-sample f32
// clips, and on dataset sweeps (train_logReg_swapping.py-scale: 5000 files x
// 8 band variants) WAV decode + int16->f32 conversion dominates host time.
//
// Exposes a minimal C ABI consumed via ctypes (data/native_io.py):
//   decode_wav_pcm16(path, out, max_samples, *sr, *channels) -> n_samples
//     RIFF/WAVE PCM16 (and PCM8) decoder; interleaved frames are written as
//     float32 in [-1, 1]. Returns -1 on unsupported encodings so the caller
//     falls back to the Python decoder.
//   encode_wav_pcm16(path, data, n_samples, sr, channels) -> 0 / -1
//     float32 [-1, 1] -> 16-bit PCM RIFF/WAVE writer (clip + truncate
//     toward zero, bit-identical to the Python scipy path). The datagen
//     apps write thousands of band-spliced wavs (`hifigan.py:223-230`,
//     `train_logReg_swapping.py:94-99`) — the write side belongs in C++
//     for the same reason the read side does.
//
// Build: make -C native   (produces libaudio_io.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  FILE* f;
  explicit Reader(const char* path) : f(fopen(path, "rb")) {}
  ~Reader() {
    if (f) fclose(f);
  }
  bool read(void* dst, size_t n) { return f && fread(dst, 1, n, f) == n; }
  bool skip(long n) { return f && fseek(f, n, SEEK_CUR) == 0; }
};

}  // namespace

extern "C" {

// Returns number of samples written (frames * channels), or -1 on error /
// unsupported format.
int64_t decode_wav_pcm16(const char* path, float* out, int64_t max_samples,
                         int32_t* sample_rate, int32_t* channels) {
  Reader r(path);
  char tag[4];
  uint32_t riff_size;
  if (!r.read(tag, 4) || memcmp(tag, "RIFF", 4) != 0) return -1;
  if (!r.read(&riff_size, 4)) return -1;
  if (!r.read(tag, 4) || memcmp(tag, "WAVE", 4) != 0) return -1;

  uint16_t fmt = 0, ch = 0, bits = 0;
  uint32_t sr = 0;
  bool have_fmt = false;

  while (r.read(tag, 4)) {
    uint32_t chunk;
    if (!r.read(&chunk, 4)) return -1;
    if (memcmp(tag, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (chunk < 16 || !r.read(buf, 16)) return -1;
      memcpy(&fmt, buf + 0, 2);
      memcpy(&ch, buf + 2, 2);
      memcpy(&sr, buf + 4, 4);
      memcpy(&bits, buf + 14, 2);
      if (chunk > 16 && !r.skip(static_cast<long>(chunk - 16))) return -1;
      have_fmt = true;
    } else if (memcmp(tag, "data", 4) == 0) {
      if (!have_fmt || fmt != 1 /* PCM */) return -1;
      if (bits != 16 && bits != 8) return -1;
      const int64_t bytes_per = bits / 8;
      int64_t n = static_cast<int64_t>(chunk) / bytes_per;
      if (n > max_samples) n = max_samples;
      *sample_rate = static_cast<int32_t>(sr);
      *channels = static_cast<int32_t>(ch);
      if (bits == 16) {
        std::vector<int16_t> tmp(static_cast<size_t>(n));
        if (!r.read(tmp.data(), static_cast<size_t>(n) * 2)) return -1;
        constexpr float kScale = 1.0f / 32768.0f;
        for (int64_t i = 0; i < n; ++i) out[i] = tmp[i] * kScale;
      } else {
        std::vector<uint8_t> tmp(static_cast<size_t>(n));
        if (!r.read(tmp.data(), static_cast<size_t>(n))) return -1;
        constexpr float kScale = 1.0f / 128.0f;
        for (int64_t i = 0; i < n; ++i) out[i] = (tmp[i] - 128) * kScale;
      }
      return n;
    } else {
      // chunks are word-aligned
      if (!r.skip(static_cast<long>(chunk + (chunk & 1)))) return -1;
    }
  }
  return -1;
}

// float32 [-1, 1] interleaved -> 16-bit PCM RIFF/WAVE. Returns 0 on
// success, -1 on error. Conversion is clip then C float->int truncation
// (toward zero) * 32767 — bit-identical to the Python fallback's
// `(np.clip(wav, -1, 1) * 32767).astype(np.int16)`.
int64_t encode_wav_pcm16(const char* path, const float* data,
                         int64_t n_samples, int32_t sample_rate,
                         int32_t channels) {
  if (n_samples < 0 || channels <= 0 || sample_rate <= 0) return -1;
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  const uint32_t data_bytes = static_cast<uint32_t>(n_samples * 2);
  const uint32_t riff_size = 36 + data_bytes;
  const uint16_t fmt_pcm = 1, bits = 16;
  const uint16_t ch = static_cast<uint16_t>(channels);
  const uint32_t sr = static_cast<uint32_t>(sample_rate);
  const uint32_t byte_rate = sr * ch * 2;
  const uint16_t block_align = ch * 2;
  const uint32_t fmt_len = 16;
  bool ok = fwrite("RIFF", 1, 4, f) == 4 && fwrite(&riff_size, 4, 1, f) == 1 &&
            fwrite("WAVE", 1, 4, f) == 4 && fwrite("fmt ", 1, 4, f) == 4 &&
            fwrite(&fmt_len, 4, 1, f) == 1 && fwrite(&fmt_pcm, 2, 1, f) == 1 &&
            fwrite(&ch, 2, 1, f) == 1 && fwrite(&sr, 4, 1, f) == 1 &&
            fwrite(&byte_rate, 4, 1, f) == 1 &&
            fwrite(&block_align, 2, 1, f) == 1 && fwrite(&bits, 2, 1, f) == 1 &&
            fwrite("data", 1, 4, f) == 4 && fwrite(&data_bytes, 4, 1, f) == 1;
  constexpr int64_t kChunk = 1 << 16;
  std::vector<int16_t> tmp(static_cast<size_t>(
      n_samples < kChunk ? (n_samples > 0 ? n_samples : 1) : kChunk));
  for (int64_t off = 0; ok && off < n_samples; off += kChunk) {
    const int64_t n = (n_samples - off < kChunk) ? n_samples - off : kChunk;
    for (int64_t i = 0; i < n; ++i) {
      float x = data[off + i];
      if (x > 1.0f) x = 1.0f;
      if (x < -1.0f) x = -1.0f;
      tmp[static_cast<size_t>(i)] = static_cast<int16_t>(x * 32767.0f);
    }
    ok = fwrite(tmp.data(), 2, static_cast<size_t>(n), f) ==
         static_cast<size_t>(n);
  }
  return fclose(f) == 0 && ok ? 0 : -1;
}

}  // extern "C"
