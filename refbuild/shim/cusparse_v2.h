// CPU-only shim (see cuda_runtime.h in this directory).
#pragma once
typedef int cusparseStatus_t;
typedef void *cusparseHandle_t;
