// Error-check macros for the native runtime.
//
// TPU-native equivalent of the reference's fatal-error helpers
// (Documentation/CppReference/ccv_nnc_mfa_error.hpp:16-24 —
// CCV_NNC_MFA_CHECK_ERROR / CCV_NNC_MFA_PRECONDITION).  Unlike the
// reference, which aborts the process, library code reached through
// ctypes must not kill the Python interpreter: failed preconditions
// set a thread-local error message the binding surfaces as a Python
// exception; only genuinely unrecoverable states abort.
#pragma once

#include <cstdio>
#include <cstdlib>

namespace mfa_tpu {

extern thread_local char g_error[256];

void set_error(const char* fmt, ...);

}  // namespace mfa_tpu

#define MFA_TPU_PRECONDITION(cond, ...)          \
  do {                                           \
    if (!(cond)) {                               \
      ::mfa_tpu::set_error(__VA_ARGS__);         \
      return MFA_TPU_ERR_PRECONDITION;           \
    }                                            \
  } while (0)

#define MFA_TPU_FATAL(...)                       \
  do {                                           \
    std::fprintf(stderr, "mfa_tpu fatal: ");     \
    std::fprintf(stderr, __VA_ARGS__);           \
    std::fprintf(stderr, "\n");                  \
    std::abort();                                \
  } while (0)

enum mfa_tpu_status {
  MFA_TPU_OK = 0,
  MFA_TPU_ERR_PRECONDITION = 1,
  MFA_TPU_ERR_NOT_FOUND = 2,
  MFA_TPU_ERR_IO = 3,
};
