// Minimal DirectXPackedVector substitute for the BC codec TUs: HALF
// conversions (IEEE half, round-to-nearest-even) and the packed types
// XMHALF4 / XMUBYTE4 / XMU565 with their load/store helpers.
#pragma once

#include "DirectXMath.h"

namespace DirectX {
namespace PackedVector {

using HALF = uint16_t;

inline float XMConvertHalfToFloat(HALF h) {
    const uint32_t sign = (h & 0x8000u) << 16;
    const uint32_t exp = (h >> 10) & 0x1F;
    const uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {
            // subnormal: normalize
            int e = -1;
            uint32_t m = man;
            do {
                ++e;
                m <<= 1;
            } while ((m & 0x400) == 0);
            bits = sign | ((127 - 15 - e) << 23) | ((m & 0x3FF) << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

inline HALF XMConvertFloatToHalf(float f) {
    // DirectXMath non-F16C algorithm (round-to-nearest-even; values past
    // half range become infinity/NaN)
    uint32_t IValue;
    std::memcpy(&IValue, &f, 4);
    const uint32_t Sign = (IValue & 0x80000000u) >> 16;
    IValue &= 0x7FFFFFFFu;
    uint32_t Result;
    if (IValue >= 0x47800000u) {
        Result = 0x7C00u
            | ((IValue > 0x7F800000u)
                   ? (0x200u | ((IValue >> 13) & 0x3FFu)) : 0u);
    } else if (IValue <= 0x33000000u) {
        Result = 0;
    } else if (IValue < 0x38800000u) {
        const uint32_t Shift = 125u - (IValue >> 23);
        IValue = 0x800000u | (IValue & 0x7FFFFFu);
        Result = IValue >> (Shift + 1);
        const uint32_t s = (IValue & ((1u << (Shift + 1)) - 1)) != 0;
        Result += (Result | s) & ((IValue >> Shift) & 1u);
    } else {
        IValue += 0xC8000000u;
        Result = ((IValue + 0x0FFFu + ((IValue >> 13) & 1u)) >> 13)
            & 0x7FFFu;
    }
    return HALF(Result | Sign);
}

struct XMHALF4 {
    HALF x, y, z, w;
};
struct XMUBYTE4 {
    uint8_t x, y, z, w;
};
struct XMU565 {
    uint16_t v;  // 5 (x, low) | 6 (y) | 5 (z, high)
};

inline void XMStoreHalf4(XMHALF4* dst, FXMVECTOR v) {
    dst->x = XMConvertFloatToHalf(v.f[0]);
    dst->y = XMConvertFloatToHalf(v.f[1]);
    dst->z = XMConvertFloatToHalf(v.f[2]);
    dst->w = XMConvertFloatToHalf(v.f[3]);
}
inline XMVECTOR XMLoadHalf4(const XMHALF4* s) {
    return XMVectorSet(XMConvertHalfToFloat(s->x),
                       XMConvertHalfToFloat(s->y),
                       XMConvertHalfToFloat(s->z),
                       XMConvertHalfToFloat(s->w));
}
inline XMVECTOR XMLoadUByte4(const XMUBYTE4* s) {
    return XMVectorSet(float(s->x), float(s->y), float(s->z), float(s->w));
}
inline XMVECTOR XMLoadU565(const XMU565* s) {
    return XMVectorSet(float(s->v & 0x1F), float((s->v >> 5) & 0x3F),
                       float((s->v >> 11) & 0x1F), 0.f);
}

}  // namespace PackedVector
}  // namespace DirectX
