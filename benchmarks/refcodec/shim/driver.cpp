// Batch driver over the reference BC codecs, exposed via C ABI for
// ctypes: encode/decode N blocks of 16 RGBA f32 texels.
#include "DirectXTexP.h"
#include "BC.h"

using namespace DirectX;

namespace {

void to_vec(const float* px, XMVECTOR* out) {
    for (int i = 0; i < 16; ++i)
        out[i] = XMVectorSet(px[i * 4 + 0], px[i * 4 + 1], px[i * 4 + 2],
                             px[i * 4 + 3]);
}

void from_vec(const XMVECTOR* in, float* px) {
    for (int i = 0; i < 16; ++i) {
        px[i * 4 + 0] = in[i].f[0];
        px[i * 4 + 1] = in[i].f[1];
        px[i * 4 + 2] = in[i].f[2];
        px[i * 4 + 3] = in[i].f[3];
    }
}

}  // namespace

extern "C" {

// codec ids: 1..5 = BC1..BC5 (unsigned), 6 = BC6HU, 7 = BC7,
// 16 = BC6HS, 14/15 = BC4S/BC5S
int ref_encode(int codec, const float* px, int64_t n_blocks, uint8_t* out,
               float threshold, uint32_t flags) {
    XMVECTOR v[16];
    for (int64_t b = 0; b < n_blocks; ++b) {
        to_vec(px + b * 64, v);
        switch (codec) {
        case 1: D3DXEncodeBC1(out + b * 8, v, threshold, flags); break;
        case 2: D3DXEncodeBC2(out + b * 16, v, flags); break;
        case 3: D3DXEncodeBC3(out + b * 16, v, flags); break;
        case 4: D3DXEncodeBC4U(out + b * 8, v, flags); break;
        case 5: D3DXEncodeBC5U(out + b * 16, v, flags); break;
        case 14: D3DXEncodeBC4S(out + b * 8, v, flags); break;
        case 15: D3DXEncodeBC5S(out + b * 16, v, flags); break;
        case 6: D3DXEncodeBC6HU(out + b * 16, v, flags); break;
        case 16: D3DXEncodeBC6HS(out + b * 16, v, flags); break;
        case 7: D3DXEncodeBC7(out + b * 16, v, flags); break;
        default: return -1;
        }
    }
    return 0;
}

int ref_decode(int codec, const uint8_t* bc, int64_t n_blocks, float* px) {
    XMVECTOR v[16];
    for (int64_t b = 0; b < n_blocks; ++b) {
        switch (codec) {
        case 1: D3DXDecodeBC1(v, bc + b * 8); break;
        case 2: D3DXDecodeBC2(v, bc + b * 16); break;
        case 3: D3DXDecodeBC3(v, bc + b * 16); break;
        case 4: D3DXDecodeBC4U(v, bc + b * 8); break;
        case 5: D3DXDecodeBC5U(v, bc + b * 16); break;
        case 14: D3DXDecodeBC4S(v, bc + b * 8); break;
        case 15: D3DXDecodeBC5S(v, bc + b * 16); break;
        case 6: D3DXDecodeBC6HU(v, bc + b * 16); break;
        case 16: D3DXDecodeBC6HS(v, bc + b * 16); break;
        case 7: D3DXDecodeBC7(v, bc + b * 16); break;
        default: return -1;
        }
        from_vec(v, px + b * 64);
    }
    return 0;
}

}  // extern "C"
