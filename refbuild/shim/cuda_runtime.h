// Minimal CPU-only shim so the reference's headers parse without the CUDA
// toolkit. Only used for the out-of-tree CPU build of /root/reference
// (USE_CUDA undefined => no CUDA symbol is ever *called*; the headers merely
// declare handles/status types).
#pragma once
typedef int cudaError_t;
#define cudaSuccess 0
static inline const char *cudaGetErrorString(cudaError_t) { return "cpu-shim"; }
