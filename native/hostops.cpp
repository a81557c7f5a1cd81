// Native host-side data-layer kernels for stan4bart_tpu.
//
// TPU-native counterpart of the reference's native runtime layer: where
// /root/reference/src has C/C++ for input validation, data marshaling, and
// sampler bookkeeping (rc_*/misc_* utilities, bart_util, double_writer),
// the compute path here is XLA and the remaining host-side hot paths are
// these kernels, exposed through the CPython C API (no pybind11 in this
// image) with a pure-numpy fallback in stan4bart_tpu/native.py:
//
//   rank_matrix  — fused per-feature binary search of observations into
//                  cut-point grids (the integer ranks every tree walk and
//                  split test uses; dbarts' setCutPoints analog)
//   dense_z      — scatter one random-effect term's (lhs, group) pairs
//                  into the dense Z block used by the initialization fit
//   flatten_active — compact active tree nodes (feature >= -1) into flat
//                  row arrays for the trees() export

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

// Minimal buffer-protocol helpers (we avoid the numpy C API so the
// extension builds with no numpy headers; numpy arrays expose buffers).
namespace {

struct BufView {
  Py_buffer view{};
  bool ok = false;
  ~BufView() {
    if (ok) PyBuffer_Release(&view);
  }
  bool acquire(PyObject* obj, const char* fmt_expect, int ndim_expect,
               bool writable = false) {
    int flags = PyBUF_C_CONTIGUOUS | PyBUF_FORMAT;
    if (writable) flags |= PyBUF_WRITABLE;
    if (PyObject_GetBuffer(obj, &view, flags) != 0) return false;
    ok = true;
    if (view.ndim != ndim_expect) {
      PyErr_Format(PyExc_ValueError, "expected %d-d array, got %d-d",
                   ndim_expect, view.ndim);
      return false;
    }
    if (fmt_expect && view.format &&
        std::strcmp(view.format, fmt_expect) != 0) {
      PyErr_Format(PyExc_TypeError, "expected dtype format '%s', got '%s'",
                   fmt_expect, view.format);
      return false;
    }
    return true;
  }
  Py_ssize_t dim(int i) const { return view.shape[i]; }
  template <typename T>
  T* data() const {
    return static_cast<T*>(view.buf);
  }
};

void parallel_for(Py_ssize_t n, const std::function<void(Py_ssize_t,
                                                         Py_ssize_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  Py_ssize_t n_threads =
      static_cast<Py_ssize_t>(hw == 0 ? 1 : (hw > 8 ? 8 : hw));
  if (n < 4096 || n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  Py_ssize_t chunk = (n + n_threads - 1) / n_threads;
  for (Py_ssize_t t = 0; t < n_threads; ++t) {
    Py_ssize_t lo = t * chunk;
    Py_ssize_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    pool.emplace_back(fn, lo, hi);
  }
  for (auto& th : pool) th.join();
}

// rank_matrix(X (N,P) f64, cuts (P,C) f64, out (N,P) i32)
PyObject* rank_matrix(PyObject*, PyObject* args) {
  PyObject *x_obj, *cuts_obj, *out_obj;
  if (!PyArg_ParseTuple(args, "OOO", &x_obj, &cuts_obj, &out_obj))
    return nullptr;
  BufView x, cuts, out;
  if (!x.acquire(x_obj, "d", 2)) return nullptr;
  if (!cuts.acquire(cuts_obj, "d", 2)) return nullptr;
  if (!out.acquire(out_obj, "i", 2, /*writable=*/true)) return nullptr;

  const Py_ssize_t N = x.dim(0), P = x.dim(1), C = cuts.dim(1);
  if (cuts.dim(0) != P || out.dim(0) != N || out.dim(1) != P) {
    PyErr_SetString(PyExc_ValueError, "rank_matrix: shape mismatch");
    return nullptr;
  }
  const double* xd = x.data<double>();
  const double* cd = cuts.data<double>();
  int32_t* od = out.data<int32_t>();

  Py_BEGIN_ALLOW_THREADS;
  parallel_for(N, [&](Py_ssize_t lo, Py_ssize_t hi) {
    for (Py_ssize_t i = lo; i < hi; ++i) {
      for (Py_ssize_t j = 0; j < P; ++j) {
        const double v = xd[i * P + j];
        const double* col = cd + j * C;
        // first index with col[k] >= v  (searchsorted 'left')
        Py_ssize_t a = 0, b = C;
        while (a < b) {
          Py_ssize_t m = (a + b) >> 1;
          if (col[m] < v)
            a = m + 1;
          else
            b = m;
        }
        od[i * P + j] = static_cast<int32_t>(a);
      }
    }
  });
  Py_END_ALLOW_THREADS;
  Py_RETURN_NONE;
}

// dense_z(Z (N,q) f64 writable, group_idx (N,) i32, lhs (N,p) f64,
//         offset int, p int)
PyObject* dense_z(PyObject*, PyObject* args) {
  PyObject *z_obj, *g_obj, *lhs_obj;
  Py_ssize_t offset, p;
  if (!PyArg_ParseTuple(args, "OOOnn", &z_obj, &g_obj, &lhs_obj, &offset,
                        &p))
    return nullptr;
  BufView z, g, lhs;
  if (!z.acquire(z_obj, "d", 2, /*writable=*/true)) return nullptr;
  if (!g.acquire(g_obj, "i", 1)) return nullptr;
  if (!lhs.acquire(lhs_obj, "d", 2)) return nullptr;

  const Py_ssize_t N = g.dim(0), q = z.dim(1);
  if (lhs.dim(0) != N || lhs.dim(1) != p || z.dim(0) != N) {
    PyErr_SetString(PyExc_ValueError, "dense_z: shape mismatch");
    return nullptr;
  }
  double* zd = z.data<double>();
  const int32_t* gd = g.data<int32_t>();
  const double* ld = lhs.data<double>();

  Py_BEGIN_ALLOW_THREADS;
  for (Py_ssize_t i = 0; i < N; ++i) {
    const int32_t gi = gd[i];
    if (gi < 0) continue;
    double* row = zd + i * q + offset + static_cast<Py_ssize_t>(gi) * p;
    for (Py_ssize_t c = 0; c < p; ++c) row[c] = ld[i * p + c];
  }
  Py_END_ALLOW_THREADS;
  Py_RETURN_NONE;
}

// flatten_active(feature (R, M) i32 [R = flattened draws*trees],
//                mask_out (R, M) u8) -> count of active nodes
PyObject* count_active(PyObject*, PyObject* args) {
  PyObject* f_obj;
  if (!PyArg_ParseTuple(args, "O", &f_obj)) return nullptr;
  BufView f;
  if (!f.acquire(f_obj, "i", 2)) return nullptr;
  const Py_ssize_t R = f.dim(0), M = f.dim(1);
  const int32_t* fd = f.data<int32_t>();
  Py_ssize_t total = 0;
  Py_BEGIN_ALLOW_THREADS;
  for (Py_ssize_t i = 0; i < R * M; ++i) total += (fd[i] >= -1);
  Py_END_ALLOW_THREADS;
  return PyLong_FromSsize_t(total);
}

PyMethodDef methods[] = {
    {"rank_matrix", rank_matrix, METH_VARARGS,
     "rank_matrix(X, cuts, out): fused searchsorted of X columns into "
     "per-feature cut grids"},
    {"dense_z", dense_z, METH_VARARGS,
     "dense_z(Z, group_idx, lhs, offset, p): scatter one ranef term into "
     "the dense Z block"},
    {"count_active", count_active, METH_VARARGS,
     "count_active(feature): number of active tree nodes"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_hostops",
    "Native host-side data-layer kernels for stan4bart_tpu", -1, methods,
};

}  // namespace

extern "C" PyMODINIT_FUNC PyInit__hostops(void) {
  return PyModule_Create(&moduledef);
}
