// Native DAC bit-split / bit-concat kernels (CPU).
//
// C++ counterpart of the reference's declared-but-uncommitted bitsplit_ext
// torch extension (reference: cim_layers/bitsplit/setup.py:8-23 builds
// bitsplit_dispatch.cpp + bitsplit_cpu.cpp). Semantics follow the committed
// Python oracle bit_split_tensor / bit_concat_tensor
// (cim_layers/layers_utils_adda.py:144-185):
//
//   slice_s[i] = trunc(x[i] / 2^(s*sb)) - trunc(x[i] / 2^min((s+1)sb, xb-1)) * 2^sb
//   concat[i]  = sum_s slice_s[i] * 2^(s*sb)
//
// Used by the host-side chip toolchain (weight staging, latent packing);
// the TPU compute path uses the fused Pallas kernel instead
// (ops/pallas/cim_mvm.py). Exposed via ctypes — no pybind11 in this image.

#include <cmath>
#include <cstdint>
#include <algorithm>

extern "C" {

// out has shape (bit_len * n); slice s occupies out[s*n .. (s+1)*n)
void bit_split_f32(const float* x, float* out, int64_t n,
                   int x_bit, int slice_bit) {
    const int bit_len = (x_bit - 2) / slice_bit + 1;  // ceil((x_bit-1)/sb)
    for (int s = 0; s < bit_len; ++s) {
        const int lsb = s * slice_bit;
        const int msb = std::min(lsb + slice_bit, x_bit - 1);
        const float inv_lsb = std::ldexp(1.0f, -lsb);
        const float inv_msb = std::ldexp(1.0f, -msb);
        const float sb_scale = std::ldexp(1.0f, slice_bit);
        float* dst = out + static_cast<int64_t>(s) * n;
        for (int64_t i = 0; i < n; ++i) {
            const float shift = std::trunc(x[i] * inv_lsb);
            const float residue = std::trunc(x[i] * inv_msb) * sb_scale;
            dst[i] = shift - residue;
        }
    }
}

// inverse: out[i] = sum_s slices[s*n + i] * 2^(s*slice_bit)
void bit_concat_f32(const float* slices, float* out, int64_t n,
                    int x_bit, int slice_bit) {
    const int bit_len = (x_bit - 2) / slice_bit + 1;
    for (int64_t i = 0; i < n; ++i) out[i] = 0.0f;
    for (int s = 0; s < bit_len; ++s) {
        const float w = std::ldexp(1.0f, s * slice_bit);
        const float* src = slices + static_cast<int64_t>(s) * n;
        for (int64_t i = 0; i < n; ++i) out[i] += src[i] * w;
    }
}

int bit_len_for(int x_bit, int slice_bit) {
    return (x_bit - 2) / slice_bit + 1;
}

}  // extern "C"
