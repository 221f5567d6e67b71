// qtts_native: host-side native runtime for qwen3_tts_tpu.
//
// The reference's data path is native (ggml's dequantization inside
// llama.cpp, SURVEY.md §2.3); this library is the TPU framework's
// equivalent: C ABI GGUF block dequantization (Q8_0/Q4_0/Q5_0/Q4_K/Q5_K/
// Q6_K, F16/BF16) used by io/gguf.py through ctypes at model-load time,
// plus PCM16 <-> float conversion for the audio layer.  All loops are
// written branch-light so the compiler auto-vectorizes; the Python numpy
// implementations remain the authoritative fallback (bit-identical, tested
// against each other in tests/test_native.py).
//
// Build: make -C native    (produces libqtts_native.so)

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// ---- half-precision helpers ------------------------------------------------

static inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {
            // subnormal: value = mant/1024 * 2^-14 -> normalize to 1.f * 2^(-15-shift+1)
            int shift = 0;
            while (!(mant & 0x400)) { mant <<= 1; ++shift; }
            mant &= 0x3FF;
            bits = sign | ((uint32_t)(113 - shift) << 23) | (mant << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

void qtts_f16_to_f32(const uint16_t* in, int64_t n, float* out) {
    for (int64_t i = 0; i < n; ++i) out[i] = f16_to_f32(in[i]);
}

void qtts_bf16_to_f32(const uint16_t* in, int64_t n, float* out) {
    for (int64_t i = 0; i < n; ++i) {
        uint32_t bits = (uint32_t)in[i] << 16;
        std::memcpy(&out[i], &bits, 4);
    }
}

// ---- simple quants (block = 32 elems) -------------------------------------

void qtts_dequant_q8_0(const uint8_t* raw, int64_t nb, float* out) {
    // block: f16 d + 32 x int8
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * 34;
        uint16_t dh; std::memcpy(&dh, b, 2);
        float d = f16_to_f32(dh);
        const int8_t* q = (const int8_t*)(b + 2);
        float* y = out + i * 32;
        for (int j = 0; j < 32; ++j) y[j] = d * (float)q[j];
    }
}

void qtts_dequant_q4_0(const uint8_t* raw, int64_t nb, float* out) {
    // block: f16 d + 16 bytes of nibbles (lo = elems 0..15, hi = 16..31)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * 18;
        uint16_t dh; std::memcpy(&dh, b, 2);
        float d = f16_to_f32(dh);
        const uint8_t* q = b + 2;
        float* y = out + i * 32;
        for (int j = 0; j < 16; ++j) {
            y[j]      = d * (float)((int)(q[j] & 0x0F) - 8);
            y[j + 16] = d * (float)((int)(q[j] >> 4) - 8);
        }
    }
}

void qtts_dequant_q5_0(const uint8_t* raw, int64_t nb, float* out) {
    // block: f16 d + u32 qh + 16 bytes nibbles
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * 22;
        uint16_t dh; std::memcpy(&dh, b, 2);
        float d = f16_to_f32(dh);
        uint32_t qh; std::memcpy(&qh, b + 2, 4);
        const uint8_t* q = b + 6;
        float* y = out + i * 32;
        for (int j = 0; j < 16; ++j) {
            int hl = (qh >> j) & 1;
            int hh = (qh >> (j + 16)) & 1;
            y[j]      = d * (float)(((int)(q[j] & 0x0F) | (hl << 4)) - 16);
            y[j + 16] = d * (float)(((int)(q[j] >> 4)   | (hh << 4)) - 16);
        }
    }
}

// ---- K-quants (super-block = 256 elems) -----------------------------------

static inline void k_scale_min(const uint8_t* s, int j, int* sc, int* mn) {
    if (j < 4) {
        *sc = s[j] & 63;
        *mn = s[j + 4] & 63;
    } else {
        *sc = (s[j + 4] & 0x0F) | ((s[j - 4] >> 6) << 4);
        *mn = (s[j + 4] >> 4)   | ((s[j] >> 6) << 4);
    }
}

void qtts_dequant_q4_k(const uint8_t* raw, int64_t nb, float* out) {
    // block: f16 d, f16 dmin, u8 scales[12], u8 qs[128]  (144 bytes)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * 144;
        uint16_t dh, dmh;
        std::memcpy(&dh, b, 2); std::memcpy(&dmh, b + 2, 2);
        float d = f16_to_f32(dh), dmin = f16_to_f32(dmh);
        const uint8_t* scales = b + 4;
        const uint8_t* q = b + 16;
        float* y = out + i * 256;
        int is = 0;
        for (int j = 0; j < 256; j += 64) {
            int sc1, m1, sc2, m2;
            k_scale_min(scales, is, &sc1, &m1);
            k_scale_min(scales, is + 1, &sc2, &m2);
            float d1 = d * sc1, mm1 = dmin * m1;
            float d2 = d * sc2, mm2 = dmin * m2;
            for (int l = 0; l < 32; ++l) {
                y[j + l]      = d1 * (float)(q[l] & 0x0F) - mm1;
                y[j + l + 32] = d2 * (float)(q[l] >> 4)   - mm2;
            }
            q += 32; is += 2;
        }
    }
}

void qtts_dequant_q5_k(const uint8_t* raw, int64_t nb, float* out) {
    // block: f16 d, f16 dmin, u8 scales[12], u8 qh[32], u8 qs[128] (176 B)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * 176;
        uint16_t dh, dmh;
        std::memcpy(&dh, b, 2); std::memcpy(&dmh, b + 2, 2);
        float d = f16_to_f32(dh), dmin = f16_to_f32(dmh);
        const uint8_t* scales = b + 4;
        const uint8_t* qh = b + 16;
        const uint8_t* q = b + 48;
        float* y = out + i * 256;
        int is = 0;
        uint8_t u1 = 1, u2 = 2;
        for (int j = 0; j < 256; j += 64) {
            int sc1, m1, sc2, m2;
            k_scale_min(scales, is, &sc1, &m1);
            k_scale_min(scales, is + 1, &sc2, &m2);
            float d1 = d * sc1, mm1 = dmin * m1;
            float d2 = d * sc2, mm2 = dmin * m2;
            for (int l = 0; l < 32; ++l) {
                int hb1 = (qh[l] & u1) ? 16 : 0;
                int hb2 = (qh[l] & u2) ? 16 : 0;
                y[j + l]      = d1 * (float)((q[l] & 0x0F) + hb1) - mm1;
                y[j + l + 32] = d2 * (float)((q[l] >> 4)   + hb2) - mm2;
            }
            q += 32; is += 2; u1 <<= 2; u2 <<= 2;
        }
    }
}

void qtts_dequant_q6_k(const uint8_t* raw, int64_t nb, float* out) {
    // block: u8 ql[128], u8 qh[64], i8 scales[16], f16 d (210 bytes)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * 210;
        const uint8_t* ql = b;
        const uint8_t* qh = b + 128;
        const int8_t* sc = (const int8_t*)(b + 192);
        uint16_t dh; std::memcpy(&dh, b + 208, 2);
        float d = f16_to_f32(dh);
        float* y = out + i * 256;
        for (int n = 0; n < 256; n += 128) {
            for (int l = 0; l < 32; ++l) {
                int is = l / 16;
                int8_t q1 = (int8_t)((ql[l] & 0x0F)      | (((qh[l] >> 0) & 3) << 4)) - 32;
                int8_t q2 = (int8_t)((ql[l + 32] & 0x0F) | (((qh[l] >> 2) & 3) << 4)) - 32;
                int8_t q3 = (int8_t)((ql[l] >> 4)        | (((qh[l] >> 4) & 3) << 4)) - 32;
                int8_t q4 = (int8_t)((ql[l + 32] >> 4)   | (((qh[l] >> 6) & 3) << 4)) - 32;
                y[l]      = d * sc[is + 0] * q1;
                y[l + 32] = d * sc[is + 2] * q2;
                y[l + 64] = d * sc[is + 4] * q3;
                y[l + 96] = d * sc[is + 6] * q4;
            }
            y += 128; ql += 64; qh += 32; sc += 8;
        }
    }
}

// ---- audio ----------------------------------------------------------------

void qtts_pcm16_to_f32(const int16_t* in, int64_t n, float* out) {
    const float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = (float)in[i] * k;
}

void qtts_f32_to_pcm16(const float* in, int64_t n, int16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i] * 32767.0f;
        v = v < -32768.0f ? -32768.0f : (v > 32767.0f ? 32767.0f : v);
        out[i] = (int16_t)lrintf(v);
    }
}

int qtts_version(void) { return 1; }

}  // extern "C"

// ---- parallel multi-tensor loader ------------------------------------------
//
// Dequantizes many tensors straight from a GGUF file in parallel (one thread
// per hardware core, work-stealing by atomic index).  The Python side parses
// the header and passes (file_offset, ggml_type, n_elems, out_offset) per
// tensor; this fills one contiguous float32 arena.  This is the framework's
// native data loader — the role ggml's loader plays for the reference.

#include <atomic>
#include <cstdio>
#include <thread>
#include <vector>

extern "C" {

typedef struct {
    int64_t file_offset;   // absolute byte offset of tensor data
    int32_t ggml_type;     // 0,1,2,6,8,12,13,14,30 supported
    int64_t n_elems;
    int64_t out_offset;    // float offset into the output arena
} qtts_tensor_spec;

static int64_t type_bytes(int32_t t, int64_t n_elems) {
    switch (t) {
        case 0: return n_elems * 4;              // F32
        case 1: case 30: return n_elems * 2;     // F16 / BF16
        case 2: return (n_elems / 32) * 18;      // Q4_0
        case 6: return (n_elems / 32) * 22;      // Q5_0
        case 8: return (n_elems / 32) * 34;      // Q8_0
        case 12: return (n_elems / 256) * 144;   // Q4_K
        case 13: return (n_elems / 256) * 176;   // Q5_K
        case 14: return (n_elems / 256) * 210;   // Q6_K
        default: return -1;
    }
}

static int dequant_one(const uint8_t* raw, int32_t t, int64_t n, float* out) {
    switch (t) {
        case 0: std::memcpy(out, raw, n * 4); return 0;
        case 1: qtts_f16_to_f32((const uint16_t*)raw, n, out); return 0;
        case 30: qtts_bf16_to_f32((const uint16_t*)raw, n, out); return 0;
        case 2: qtts_dequant_q4_0(raw, n / 32, out); return 0;
        case 6: qtts_dequant_q5_0(raw, n / 32, out); return 0;
        case 8: qtts_dequant_q8_0(raw, n / 32, out); return 0;
        case 12: qtts_dequant_q4_k(raw, n / 256, out); return 0;
        case 13: qtts_dequant_q5_k(raw, n / 256, out); return 0;
        case 14: qtts_dequant_q6_k(raw, n / 256, out); return 0;
        default: return -1;
    }
}

// Returns 0 on success, negative on error.
int qtts_load_tensors(const char* path, const qtts_tensor_spec* specs,
                      int64_t n_tensors, float* out, int32_t n_threads) {
    if (n_threads <= 0) {
        unsigned hc = std::thread::hardware_concurrency();
        n_threads = hc ? (int32_t)hc : 4;
    }
    std::atomic<int64_t> next(0);
    std::atomic<int> err(0);

    auto worker = [&]() {
        FILE* f = std::fopen(path, "rb");
        if (!f) { err.store(-2); return; }
        std::vector<uint8_t> buf;
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n_tensors || err.load()) break;
            const qtts_tensor_spec& s = specs[i];
            int64_t nb = type_bytes(s.ggml_type, s.n_elems);
            if (nb < 0) { err.store(-3); break; }
            buf.resize((size_t)nb);
            if (std::fseek(f, (long)s.file_offset, SEEK_SET) != 0 ||
                std::fread(buf.data(), 1, (size_t)nb, f) != (size_t)nb) {
                err.store(-4);
                break;
            }
            if (dequant_one(buf.data(), s.ggml_type, s.n_elems,
                            out + s.out_offset) != 0) {
                err.store(-3);
                break;
            }
        }
        std::fclose(f);
    };

    std::vector<std::thread> threads;
    for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
    return err.load();
}

}  // extern "C"
