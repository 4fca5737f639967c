// Minimal DirectXTexP.h substitute for building the BC codec translation
// units standalone on Linux: standard includes, no-op SAL annotations,
// and the one DirectXTex.h flag value the codecs reference.
#pragma once

#include <algorithm>
#include <cassert>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <iterator>
#include <memory>
#include <new>
#include <utility>

// SAL annotations -> no-ops
#define _Use_decl_annotations_
#define _Analysis_assume_(x)
#define _In_
#define _In_opt_
#define _In_reads_(x)
#define _In_range_(a, b)
#define _Out_
#define _Out_opt_
#define _Out_writes_(x)
#define _Out_writes_all_(x)
#define _Inout_
#define _Inout_updates_all_(x)
#define _Success_(x)

#include "DirectXMath.h"
#include "DirectXPackedVector.h"

namespace DirectX {
// DirectXTex.h:906 (only flag the BC TUs read)
constexpr uint32_t TEX_COMPRESS_BC7_QUICK = 0x100000;
}  // namespace DirectX

// Windows-isms used by the codec TUs
#ifndef UNREFERENCED_PARAMETER
#define UNREFERENCED_PARAMETER(x) ((void)(x))
#endif
using ::std::isnan;
using ::std::isinf;
