// Fast feature-TSV block parser (CPython C API, no pybind11).
//
// Parses blocks of 12-column deepsignal feature rows (SURVEY.md §2.5
// contract: chrom, pos, strand, pos_in_strand, readname, read_strand,
// k_mer, means csv, stds csv, lens csv, cent_signals csv, label) directly
// into numpy arrays.  This is the host-side hot loop of file-mode calling
// (reference burns it in Python per-line splits, call_modifications.py:51-85)
// — the one place a native component earns its keep on the host path.
//
// API:
//   parse_feature_block(data: bytes, kmer_len: int, signal_len: int)
//     -> (sampleinfo: list[str], kmers: int32[N,K], means: float32[N,K],
//         stds: float32[N,K], lens: int32[N,K], signals: float32[N,S],
//         labels: int32[N])
// Malformed rows raise ValueError with the offending line number.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Row {
  const char* start;      // line start
  const char* info_end;   // end of 6th column (sampleinfo prefix)
  const char* kmer;       // 7th column
};

static inline const char* find_tab(const char* p, const char* end) {
  return static_cast<const char*>(memchr(p, '\t', end - p));
}

// parse a comma-separated float list into out[0..n)
static bool parse_floats(const char* p, const char* end, float* out, int n) {
  char* next = nullptr;
  for (int i = 0; i < n; i++) {
    out[i] = strtof(p, &next);
    if (next == p) return false;
    p = next;
    if (i + 1 < n) {
      if (p >= end || *p != ',') return false;
      p++;
    }
  }
  return true;
}

static bool parse_ints(const char* p, const char* end, int* out, int n) {
  char* next = nullptr;
  for (int i = 0; i < n; i++) {
    out[i] = static_cast<int>(strtol(p, &next, 10));
    if (next == p) return false;
    p = next;
    if (i + 1 < n) {
      if (p >= end || *p != ',') return false;
      p++;
    }
  }
  return true;
}

static int base_code(char c) {
  switch (c) {
    case 'A': return 0;
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
    case 'U': return 3;  // RNA
    default: return 4;   // N / unknown
  }
}

PyObject* parse_feature_block(PyObject*, PyObject* args) {
  Py_buffer buf;
  int kmer_len, signal_len;
  if (!PyArg_ParseTuple(args, "y*ii", &buf, &kmer_len, &signal_len))
    return nullptr;
  const char* data = static_cast<const char*>(buf.buf);
  const char* end = data + buf.len;

  // pass 1: count lines (non-empty)
  std::vector<const char*> line_starts;
  {
    const char* p = data;
    while (p < end) {
      const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
      const char* le = nl ? nl : end;
      if (le > p) line_starts.push_back(p);
      p = nl ? nl + 1 : end;
    }
  }
  const npy_intp n = static_cast<npy_intp>(line_starts.size());
  const npy_intp k = kmer_len, s = signal_len;

  npy_intp dims2k[2] = {n, k};
  npy_intp dims2s[2] = {n, s};
  npy_intp dims1[1] = {n};
  PyObject* kmers = PyArray_SimpleNew(2, dims2k, NPY_INT32);
  PyObject* means = PyArray_SimpleNew(2, dims2k, NPY_FLOAT32);
  PyObject* stds = PyArray_SimpleNew(2, dims2k, NPY_FLOAT32);
  PyObject* lens = PyArray_SimpleNew(2, dims2k, NPY_INT32);
  PyObject* signals = PyArray_SimpleNew(2, dims2s, NPY_FLOAT32);
  PyObject* labels = PyArray_SimpleNew(1, dims1, NPY_INT32);
  PyObject* sampleinfo = PyList_New(n);
  if (!kmers || !means || !stds || !lens || !signals || !labels ||
      !sampleinfo) {
    PyBuffer_Release(&buf);
    Py_XDECREF(kmers); Py_XDECREF(means); Py_XDECREF(stds);
    Py_XDECREF(lens); Py_XDECREF(signals); Py_XDECREF(labels);
    Py_XDECREF(sampleinfo);
    return nullptr;
  }

  int32_t* km = static_cast<int32_t*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(kmers)));
  float* me = static_cast<float*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(means)));
  float* st = static_cast<float*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(stds)));
  int32_t* le = static_cast<int32_t*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(lens)));
  float* si = static_cast<float*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(signals)));
  int32_t* la = static_cast<int32_t*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(labels)));

  std::vector<int> tmp_int(std::max(k, (npy_intp)1));

  for (npy_intp r = 0; r < n; r++) {
    const char* p = line_starts[r];
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    const char* le_ptr = nl ? nl : end;
    // strip \r
    if (le_ptr > p && le_ptr[-1] == '\r') le_ptr--;

    // columns 0-5 -> sampleinfo
    const char* q = p;
    const char* info_end = nullptr;
    bool ok = true;
    for (int c = 0; c < 6; c++) {
      const char* t = find_tab(q, le_ptr);
      if (!t) { ok = false; break; }
      info_end = t;
      q = t + 1;
    }
    const char* col_start[6];  // cols 6..11 starts
    if (ok) {
      col_start[0] = q;  // kmer
      for (int c = 1; c < 6; c++) {
        const char* t = find_tab(q, le_ptr);
        if (!t) { ok = false; break; }
        q = t + 1;
        col_start[c] = q;
      }
    }
    if (!ok) {
      PyErr_Format(PyExc_ValueError,
                   "malformed feature row at block line %zd", (Py_ssize_t)r);
      goto fail;
    }
    {
      // kmer
      for (npy_intp i = 0; i < k; i++)
        km[r * k + i] = base_code(col_start[0][i]);
      const char* c_end1 = col_start[1] - 1;
      const char* c_end2 = col_start[2] - 1;
      const char* c_end3 = col_start[3] - 1;
      const char* c_end4 = col_start[4] - 1;
      const char* c_end5 = col_start[5] - 1;
      if (!parse_floats(col_start[1], c_end2, me + r * k, (int)k) ||
          !parse_floats(col_start[2], c_end3, st + r * k, (int)k) ||
          !parse_ints(col_start[3], c_end4, tmp_int.data(), (int)k) ||
          !parse_floats(col_start[4], c_end5, si + r * s, (int)s)) {
        PyErr_Format(PyExc_ValueError,
                     "malformed numeric field at block line %zd",
                     (Py_ssize_t)r);
        goto fail;
      }
      (void)c_end1;
      for (npy_intp i = 0; i < k; i++) le[r * k + i] = tmp_int[i];
      char* lend = nullptr;
      la[r] = static_cast<int32_t>(strtol(col_start[5], &lend, 10));
      if (lend == col_start[5]) {
        PyErr_Format(PyExc_ValueError, "malformed label at block line %zd",
                     (Py_ssize_t)r);
        goto fail;
      }
      PyObject* info = PyUnicode_FromStringAndSize(p, info_end - p);
      if (!info) goto fail;
      PyList_SET_ITEM(sampleinfo, r, info);
    }
  }

  {
    PyObject* out = Py_BuildValue("(NNNNNNN)", sampleinfo, kmers, means,
                                  stds, lens, signals, labels);
    PyBuffer_Release(&buf);
    return out;
  }

fail:
  PyBuffer_Release(&buf);
  Py_DECREF(kmers); Py_DECREF(means); Py_DECREF(stds);
  Py_DECREF(lens); Py_DECREF(signals); Py_DECREF(labels);
  Py_DECREF(sampleinfo);
  return nullptr;
}

PyMethodDef methods[] = {
    {"parse_feature_block", parse_feature_block, METH_VARARGS,
     "Parse a block of feature-TSV rows into numpy arrays."},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastparse",
    "native feature-TSV parser", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__fastparse(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
