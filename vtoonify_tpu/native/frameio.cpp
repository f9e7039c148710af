// Native host-side frame I/O runtime for the video engine.
//
// The reference's native code is CUDA compute kernels (which here become
// Pallas/XLA); its host loop is pure Python/cv2 with several per-frame numpy
// copies (decode → cvtColor → transform → stack). This library fuses the
// host-side pixel plumbing into single passes so the decode thread keeps up
// with the TPU:
//   * bgr→rgb swizzle + batch packing in one traversal (no np.stack copy)
//   * rgb→bgr for the writer thread
//   * uint8 → [-1,1] float32 conversion (CPU-fallback path)
//
// C ABI for ctypes; OpenMP-free (single-core containers), but vectorizable
// loops (-O3). Built by native/build.py at import time with a pure-numpy
// fallback if no toolchain is present.

#include <cstdint>
#include <cstring>

extern "C" {

// Swizzle one BGR frame into an RGB batch slot: dst[b] = bgr2rgb(src).
void bgr_to_rgb_into_batch(const uint8_t* src, uint8_t* dst_batch,
                           int64_t slot, int64_t h, int64_t w) {
  const int64_t npix = h * w;
  uint8_t* dst = dst_batch + slot * npix * 3;
  for (int64_t i = 0; i < npix; ++i) {
    const uint8_t* p = src + i * 3;
    uint8_t* q = dst + i * 3;
    q[0] = p[2];
    q[1] = p[1];
    q[2] = p[0];
  }
}

// RGB → BGR in place-copy for the writer thread.
void rgb_to_bgr(const uint8_t* src, uint8_t* dst, int64_t npix) {
  for (int64_t i = 0; i < npix; ++i) {
    const uint8_t* p = src + i * 3;
    uint8_t* q = dst + i * 3;
    q[0] = p[2];
    q[1] = p[1];
    q[2] = p[0];
  }
}

// uint8 → float32 in [-1, 1] (x / 127.5 - 1).
void u8_to_unit_f32(const uint8_t* src, float* dst, int64_t n) {
  const float k = 1.0f / 127.5f;
  for (int64_t i = 0; i < n; ++i) {
    dst[i] = static_cast<float>(src[i]) * k - 1.0f;
  }
}

// Space-to-depth packed (h, w, 4*c) phase-major uint8 → (2h, 2w, c), the
// final depth-to-space of the packed synthesis tail (nn/layers.py
// depth_to_space2) finished host-side as a pure byte permutation — fused
// with the writer's RGB→BGR swizzle when swap_bgr != 0 (c must be 3 then).
void depth_to_space2_u8(const uint8_t* src, uint8_t* dst, int64_t h,
                        int64_t w, int64_t c, int64_t swap_bgr) {
  const int64_t row_out = 2 * w * c;
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* s = src + y * w * 4 * c;
    uint8_t* d0 = dst + (2 * y) * row_out;
    uint8_t* d1 = d0 + row_out;
    if (swap_bgr && c == 3) {
      for (int64_t x = 0; x < w; ++x) {
        const uint8_t* p = s + x * 12;
        uint8_t* q0 = d0 + x * 6;
        uint8_t* q1 = d1 + x * 6;
        // phases: (py,px) = (0,0),(0,1),(1,0),(1,1) at channel blocks 0..3
        q0[0] = p[2];  q0[1] = p[1];  q0[2] = p[0];
        q0[3] = p[5];  q0[4] = p[4];  q0[5] = p[3];
        q1[0] = p[8];  q1[1] = p[7];  q1[2] = p[6];
        q1[3] = p[11]; q1[4] = p[10]; q1[5] = p[9];
      }
    } else {
      for (int64_t x = 0; x < w; ++x) {
        const uint8_t* p = s + x * 4 * c;
        std::memcpy(d0 + x * 2 * c, p, 2 * c);
        std::memcpy(d1 + x * 2 * c, p + 2 * c, 2 * c);
      }
    }
  }
}

// [-1, 1] float32 → uint8 (clamp, (x+1)*127.5, round-half-away).
void unit_f32_to_u8(const float* src, uint8_t* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    float v = src[i];
    v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
    v = (v + 1.0f) * 127.5f;
    dst[i] = static_cast<uint8_t>(v + 0.5f);
  }
}

}  // extern "C"
