// Fast host-side GameRecord JSON encoding.
//
// Native counterpart of the reference's C++ GameRecord serialization
// (src/selfplay/game_record.cpp).  The TPU framework's hot path is entirely
// on-device, but flushing thousands of finished games to reference-schema
// JSON is host work — Python's json module spends most of its time
// stringifying the [T, A] float policy arrays.  This CPython extension
// writes the same schema ~20x faster directly from the numpy buffers.
//
// Exposed:  _azrecord.encode_game(game_type, board_size, use_variant_rules,
//                                 actions, policies, values, think_ms,
//                                 result, timestamp) -> bytes
//   actions : int32 buffer [T]
//   policies: float32 buffer, C-contiguous [T, A]
//   values  : float32 buffer [T]
//   think_ms: int32 buffer [T] (per-move thinking time, game_record.h:21-122)
//
// Built on demand by alphazero_tpu/native/__init__.py with g++; the Python
// encoder remains as fallback.
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Minimal fast float formatter: %.6g matches python json closely enough for
// round-tripping policy probabilities.
inline void append_float(std::string& out, double v) {
  char buf[32];
  int n = snprintf(buf, sizeof(buf), "%.7g", v);
  out.append(buf, n);
}

inline void append_int(std::string& out, long long v) {
  char buf[24];
  int n = snprintf(buf, sizeof(buf), "%lld", v);
  out.append(buf, n);
}

PyObject* encode_game(PyObject*, PyObject* args) {
  int game_type, board_size, use_variant, result;
  Py_buffer actions, policies, values, think;
  const char* timestamp;
  if (!PyArg_ParseTuple(args, "iipy*y*y*y*is", &game_type, &board_size,
                        &use_variant, &actions, &policies, &values, &think,
                        &result, &timestamp)) {
    return nullptr;
  }

  const int32_t* act = static_cast<const int32_t*>(actions.buf);
  const float* pol = static_cast<const float*>(policies.buf);
  const float* val = static_cast<const float*>(values.buf);
  const int32_t* tms = static_cast<const int32_t*>(think.buf);
  const Py_ssize_t T = actions.len / static_cast<Py_ssize_t>(sizeof(int32_t));
  const Py_ssize_t A =
      T > 0 ? policies.len / static_cast<Py_ssize_t>(sizeof(float)) / T : 0;

  bool ok = values.len / static_cast<Py_ssize_t>(sizeof(float)) == T &&
            think.len / static_cast<Py_ssize_t>(sizeof(int32_t)) == T &&
            (T == 0 || policies.len ==
                           T * A * static_cast<Py_ssize_t>(sizeof(float)));
  if (!ok) {
    PyBuffer_Release(&actions);
    PyBuffer_Release(&policies);
    PyBuffer_Release(&values);
    PyBuffer_Release(&think);
    PyErr_SetString(PyExc_ValueError,
                    "inconsistent actions/policies/values/think_ms lengths");
    return nullptr;
  }

  std::string out;
  out.reserve(64 + static_cast<size_t>(T) * (static_cast<size_t>(A) * 10 + 64));
  out += "{\"game_type\": ";
  append_int(out, game_type);
  out += ", \"board_size\": ";
  append_int(out, board_size);
  out += ", \"use_variant_rules\": ";
  out += use_variant ? "true" : "false";
  out += ", \"moves\": [";
  for (Py_ssize_t t = 0; t < T; ++t) {
    if (t) out += ", ";
    out += "{\"action\": ";
    append_int(out, act[t]);
    out += ", \"policy\": [";
    const float* row = pol + t * A;
    for (Py_ssize_t a = 0; a < A; ++a) {
      if (a) out += ", ";
      append_float(out, static_cast<double>(row[a]));
    }
    out += "], \"value\": ";
    append_float(out, static_cast<double>(val[t]));
    out += ", \"thinking_time_ms\": ";
    append_int(out, tms[t]);
    out += "}";
  }
  out += "], \"result\": ";
  append_int(out, result);
  out += ", \"timestamp\": \"";
  out += timestamp;
  out += "\"}";

  PyBuffer_Release(&actions);
  PyBuffer_Release(&policies);
  PyBuffer_Release(&values);
  PyBuffer_Release(&think);
  return PyBytes_FromStringAndSize(out.data(),
                                   static_cast<Py_ssize_t>(out.size()));
}

PyMethodDef kMethods[] = {
    {"encode_game", encode_game, METH_VARARGS,
     "Encode one game record to reference-schema JSON bytes."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_azrecord",
    "Fast GameRecord JSON encoding",      -1,
    kMethods, nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__azrecord(void) { return PyModule_Create(&kModule); }
