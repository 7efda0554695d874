// Native data-loader hot path: WAV decode + crop + peak-normalize.
//
// The reference's host hot loop is torchaudio wav decode + crop + normalize in
// DataLoader workers (sgmse/data_module.py:47-84). This C++ implementation
// feeds the TPU input pipeline through a thin ctypes binding
// (diffse_tpu/native/__init__.py); the pure-numpy reader in
// diffse_tpu/data/wavio.py is the fallback and the parity reference.
//
// Build: g++ -O3 -shared -fPIC -o libdiffse_native.so wav_loader.cpp upfirdn2d_ref.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <cmath>

extern "C" {

// Returns number of mono samples, or -1 on error. If out != nullptr, writes up
// to max_samples decoded float32 samples (channel 0 only, matching the
// torchaudio mono convention used by the reference data pipeline).
// *sample_rate receives the file's rate.
long wav_read_mono(const char* path, float* out, long max_samples,
                   int* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || fread(&riff_size, 4, 1, f) != 1 ||
      fread(wave, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0 ||
      memcmp(wave, "WAVE", 4) != 0) {
    fclose(f);
    return -1;
  }

  uint16_t fmt_tag = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  long data_offset = -1;
  uint32_t data_size = 0;

  char chunk_id[4];
  uint32_t chunk_size;
  while (fread(chunk_id, 1, 4, f) == 4 && fread(&chunk_size, 4, 1, f) == 1) {
    if (memcmp(chunk_id, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (chunk_size < 16 || fread(buf, 1, 16, f) != 16) {
        fclose(f);
        return -1;
      }
      memcpy(&fmt_tag, buf + 0, 2);
      memcpy(&channels, buf + 2, 2);
      memcpy(&rate, buf + 4, 4);
      memcpy(&bits, buf + 14, 2);
      fseek(f, (long)chunk_size - 16 + (chunk_size & 1), SEEK_CUR);
    } else if (memcmp(chunk_id, "data", 4) == 0) {
      data_offset = ftell(f);
      data_size = chunk_size;
      fseek(f, (long)chunk_size + (chunk_size & 1), SEEK_CUR);
    } else {
      fseek(f, (long)chunk_size + (chunk_size & 1), SEEK_CUR);
    }
  }
  if (data_offset < 0 || channels == 0) {
    fclose(f);
    return -1;
  }
  if (fmt_tag == 0xFFFE) fmt_tag = (bits == 32) ? 0x0003 : 0x0001;

  const long bytes_per_sample = bits / 8;
  const long frames = data_size / (bytes_per_sample * channels);
  if (sample_rate) *sample_rate = (int)rate;
  if (!out) {
    fclose(f);
    return frames;
  }

  long n = frames < max_samples ? frames : max_samples;
  fseek(f, data_offset, SEEK_SET);

  if (fmt_tag == 0x0001 && bits == 16) {
    int16_t* buf = (int16_t*)malloc(n * channels * 2);
    if (fread(buf, 2, n * channels, f) != (size_t)(n * channels)) {
      free(buf);
      fclose(f);
      return -1;
    }
    for (long i = 0; i < n; ++i) out[i] = buf[i * channels] / 32768.0f;
    free(buf);
  } else if (fmt_tag == 0x0003 && bits == 32) {
    float* buf = (float*)malloc(n * channels * 4);
    if (fread(buf, 4, n * channels, f) != (size_t)(n * channels)) {
      free(buf);
      fclose(f);
      return -1;
    }
    for (long i = 0; i < n; ++i) out[i] = buf[i * channels];
    free(buf);
  } else if (fmt_tag == 0x0001 && bits == 32) {
    int32_t* buf = (int32_t*)malloc(n * channels * 4);
    if (fread(buf, 4, n * channels, f) != (size_t)(n * channels)) {
      free(buf);
      fclose(f);
      return -1;
    }
    for (long i = 0; i < n; ++i) out[i] = buf[i * channels] / 2147483648.0f;
    free(buf);
  } else {
    fclose(f);
    return -1;
  }
  fclose(f);
  return n;
}

// Fused remix + crop + pad: the Specs.__getitem__ contract
// (data_module.py:51-68). y' = x + (y - x) * fixed_snr, then crop [start,
// start+target) or center-pad to target. Writes target_len samples into
// out_x/out_y. start < 0 selects center crop.
void wav_remix_crop(const float* x, const float* y, long len, float fixed_snr,
                    long target_len, long start, float* out_x, float* out_y) {
  long pad = target_len - len;
  if (pad <= 0) {
    if (start < 0) start = (len - target_len) / 2;
    for (long i = 0; i < target_len; ++i) {
      float xv = x[start + i];
      float yv = xv + (y[start + i] - xv) * fixed_snr;
      out_x[i] = xv;
      out_y[i] = yv;
    }
  } else {
    long left = pad / 2;
    for (long i = 0; i < target_len; ++i) {
      long j = i - left;
      float xv = (j >= 0 && j < len) ? x[j] : 0.0f;
      float yraw = (j >= 0 && j < len) ? y[j] : 0.0f;
      out_x[i] = xv;
      out_y[i] = xv + (yraw - xv) * fixed_snr;
    }
  }
}

// Fused dataset item (the Specs.__getitem__ contract, mirroring the
// reference's DataLoader-worker hot loop sgmse/data_module.py:47-84): decode
// the clean/noisy mono pair, remix y' = x + (y - x) * fixed_snr, then random
// or center crop — `u` in [0,1) selects start = u * (len - target), exactly
// the value numpy's rng.uniform(0, len - target) yields for the same draw —
// or center-pad to target_len. One ctypes call per item keeps the GIL
// released for the whole decode+remix+crop, so Python threads parallelize.
// Returns 0 on success, -1 on decode failure.
int wav_load_pair(const char* clean_path, const char* noisy_path, double u,
                  int shuffle, float fixed_snr, long target_len,
                  float* out_x, float* out_y) {
  int sr = 0;
  long nx = wav_read_mono(clean_path, nullptr, 0, &sr);
  long ny = wav_read_mono(noisy_path, nullptr, 0, &sr);
  if (nx < 0 || ny < 0) return -1;
  long len = nx < ny ? nx : ny;  // pairs should match; tolerate a short tail
  if (len <= 0) return -1;
  float* x = (float*)malloc(sizeof(float) * len);
  float* y = (float*)malloc(sizeof(float) * len);
  if (!x || !y) {
    free(x);
    free(y);
    return -1;
  }
  if (wav_read_mono(clean_path, x, len, &sr) != len ||
      wav_read_mono(noisy_path, y, len, &sr) != len) {
    free(x);
    free(y);
    return -1;
  }
  long start = -1;  // center crop / center pad
  if (shuffle && len > target_len) {
    start = (long)(u * (double)(len - target_len));
    if (start < 0) start = 0;
    if (start > len - target_len) start = len - target_len;
  }
  wav_remix_crop(x, y, len, fixed_snr, target_len, start, out_x, out_y);
  free(x);
  free(y);
  return 0;
}

}  // extern "C"
