// C++ reference implementation of upfirdn2d (CPU, exact semantics).
//
// Parity anchor for the TPU/XLA formulation in diffse_tpu/ops/upfirdn2d.py —
// the same role the reference's CPU path (op/upfirdn2d.py:159-200) plays for
// its CUDA kernel: zero-stuff by `up`, pad, true-convolve the FIR kernel,
// decimate by `down`. Layout NCHW, float32.

#include <cstdint>

extern "C" {

// out dims: out_h = (in_h*up + pad0 + pad1 - kh) / down + 1 (likewise out_w).
void upfirdn2d_f32(const float* input, const float* kernel, float* out,
                   long n, long c, long in_h, long in_w, long kh, long kw,
                   long up, long down, long pad0, long pad1) {
  const long mid_h = in_h * up + pad0 + pad1;
  const long mid_w = in_w * up + pad0 + pad1;
  const long out_h = (mid_h - kh) / down + 1;
  const long out_w = (mid_w - kw) / down + 1;

  for (long nc = 0; nc < n * c; ++nc) {
    const float* in_plane = input + nc * in_h * in_w;
    float* out_plane = out + nc * out_h * out_w;
    for (long oy = 0; oy < out_h; ++oy) {
      for (long ox = 0; ox < out_w; ++ox) {
        // position in the padded, zero-stuffed intermediate image
        const long base_y = oy * down;
        const long base_x = ox * down;
        float acc = 0.0f;
        for (long ky = 0; ky < kh; ++ky) {
          // true convolution: kernel flipped
          const long my = base_y + ky;          // intermediate row touched
          const long sy = my - pad0;            // un-padded, zero-stuffed row
          if (sy < 0 || sy >= in_h * up || sy % up) continue;
          const long iy = sy / up;
          for (long kx = 0; kx < kw; ++kx) {
            const long mx = base_x + kx;
            const long sx = mx - pad0;
            if (sx < 0 || sx >= in_w * up || sx % up) continue;
            const long ix = sx / up;
            acc += in_plane[iy * in_w + ix] * kernel[(kh - 1 - ky) * kw + (kw - 1 - kx)];
          }
        }
        out_plane[oy * out_w + ox] = acc;
      }
    }
  }
}

}  // extern "C"
