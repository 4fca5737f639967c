// Minimal scalar DirectXMath substitute — just the surface the DirectXTex
// BC codec translation units use (BC.h/BC.cpp/BC4BC5.cpp/BC6HBC7.cpp).
// Written from the public DirectXMath API semantics; scalar IEEE floats
// (the XM_NO_INTRINSICS code path computes the same values).
#pragma once

#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstring>

namespace DirectX {

struct XMVECTOR {
    float f[4];
};

using FXMVECTOR = const XMVECTOR&;
using GXMVECTOR = const XMVECTOR&;
using HXMVECTOR = const XMVECTOR&;
using CXMVECTOR = const XMVECTOR&;

struct XMFLOAT4 {
    float x, y, z, w;
    XMFLOAT4() = default;
    XMFLOAT4(float _x, float _y, float _z, float _w)
        : x(_x), y(_y), z(_z), w(_w) {}
};
struct XMFLOAT4A : XMFLOAT4 {
    using XMFLOAT4::XMFLOAT4;
};
struct XMINT4 {
    int32_t x, y, z, w;
};

// XMVECTORF32: initializer-friendly constant vector
struct XMVECTORF32 {
    union {
        float f[4];
        XMVECTOR v;
    };
    operator XMVECTOR() const { return v; }
};
struct XMVECTORU32 {
    union {
        uint32_t u[4];
        XMVECTOR v;
    };
    operator XMVECTOR() const { return v; }
};

inline XMVECTOR XMVectorZero() { return XMVECTOR{{0.f, 0.f, 0.f, 0.f}}; }
inline XMVECTOR XMVectorSet(float x, float y, float z, float w) {
    return XMVECTOR{{x, y, z, w}};
}
inline XMVECTOR XMVectorReplicate(float s) {
    return XMVECTOR{{s, s, s, s}};
}
inline float XMVectorGetX(FXMVECTOR v) { return v.f[0]; }
inline float XMVectorGetY(FXMVECTOR v) { return v.f[1]; }
inline float XMVectorGetZ(FXMVECTOR v) { return v.f[2]; }
inline float XMVectorGetW(FXMVECTOR v) { return v.f[3]; }
inline XMVECTOR XMVectorSetW(FXMVECTOR v, float w) {
    return XMVECTOR{{v.f[0], v.f[1], v.f[2], w}};
}
inline XMVECTOR XMVectorAdd(FXMVECTOR a, FXMVECTOR b) {
    return XMVECTOR{{a.f[0] + b.f[0], a.f[1] + b.f[1], a.f[2] + b.f[2],
                     a.f[3] + b.f[3]}};
}
inline XMVECTOR XMVectorSubtract(FXMVECTOR a, FXMVECTOR b) {
    return XMVECTOR{{a.f[0] - b.f[0], a.f[1] - b.f[1], a.f[2] - b.f[2],
                     a.f[3] - b.f[3]}};
}
inline XMVECTOR XMVectorMultiply(FXMVECTOR a, FXMVECTOR b) {
    return XMVECTOR{{a.f[0] * b.f[0], a.f[1] * b.f[1], a.f[2] * b.f[2],
                     a.f[3] * b.f[3]}};
}
inline XMVECTOR XMVectorScale(FXMVECTOR a, float s) {
    return XMVECTOR{{a.f[0] * s, a.f[1] * s, a.f[2] * s, a.f[3] * s}};
}
inline XMVECTOR XMVectorLerp(FXMVECTOR a, FXMVECTOR b, float t) {
    // V0 + t*(V1-V0), per DirectXMath
    return XMVECTOR{{a.f[0] + t * (b.f[0] - a.f[0]),
                     a.f[1] + t * (b.f[1] - a.f[1]),
                     a.f[2] + t * (b.f[2] - a.f[2]),
                     a.f[3] + t * (b.f[3] - a.f[3])}};
}
inline XMVECTOR XMVector3Dot(FXMVECTOR a, FXMVECTOR b) {
    const float d = a.f[0] * b.f[0] + a.f[1] * b.f[1] + a.f[2] * b.f[2];
    return XMVECTOR{{d, d, d, d}};
}
inline XMVECTOR XMVector4Dot(FXMVECTOR a, FXMVECTOR b) {
    const float d = a.f[0] * b.f[0] + a.f[1] * b.f[1] + a.f[2] * b.f[2]
        + a.f[3] * b.f[3];
    return XMVECTOR{{d, d, d, d}};
}
// select: control bits choose b where set (per-component uint mask)
inline XMVECTOR XMVectorSelect(FXMVECTOR a, FXMVECTOR b, FXMVECTOR ctl) {
    XMVECTOR r;
    for (int i = 0; i < 4; ++i) {
        uint32_t ua, ub, uc;
        std::memcpy(&ua, &a.f[i], 4);
        std::memcpy(&ub, &b.f[i], 4);
        std::memcpy(&uc, &ctl.f[i], 4);
        const uint32_t ur = (ua & ~uc) | (ub & uc);
        std::memcpy(&r.f[i], &ur, 4);
    }
    return r;
}
template <unsigned E0, unsigned E1, unsigned E2, unsigned E3>
inline XMVECTOR XMVectorSwizzle(FXMVECTOR v) {
    return XMVECTOR{{v.f[E0], v.f[E1], v.f[E2], v.f[E3]}};
}
inline void XMStoreFloat4(XMFLOAT4* dst, FXMVECTOR v) {
    dst->x = v.f[0];
    dst->y = v.f[1];
    dst->z = v.f[2];
    dst->w = v.f[3];
}
inline void XMStoreFloat4A(XMFLOAT4A* dst, FXMVECTOR v) {
    XMStoreFloat4(dst, v);
}
inline XMVECTOR XMLoadFloat4(const XMFLOAT4* s) {
    return XMVECTOR{{s->x, s->y, s->z, s->w}};
}
inline XMVECTOR XMLoadSInt4(const XMINT4* s) {
    return XMVECTOR{{float(s->x), float(s->y), float(s->z), float(s->w)}};
}

// constant globals used by the BC TUs
namespace detail {
inline XMVECTOR make_select1110() {
    XMVECTORU32 u{{{0xFFFFFFFFu, 0xFFFFFFFFu, 0xFFFFFFFFu, 0u}}};
    return u.v;
}
}  // namespace detail
inline const XMVECTOR g_XMIdentityR3 = XMVectorSet(0.f, 0.f, 0.f, 1.f);
inline const XMVECTOR g_XMSelect1110 = detail::make_select1110();

}  // namespace DirectX
