// CPU-only shim (see cuda_runtime.h in this directory).
#pragma once
typedef void *cusolverSpHandle_t;
