// CPU-only shim (see cuda_runtime.h in this directory).
#pragma once
typedef int cublasStatus_t;
typedef void *cublasHandle_t;
#define CUBLAS_STATUS_SUCCESS 0
