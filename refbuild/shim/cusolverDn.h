// CPU-only shim (see cuda_runtime.h in this directory).
#pragma once
typedef int cusolverStatus_t;
typedef void *cusolverDnHandle_t;
#define CUSOLVER_STATUS_SUCCESS 0
