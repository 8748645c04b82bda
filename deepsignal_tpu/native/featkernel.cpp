// Native featurize kernels: whole-read MAD normalization + per-event
// segment statistics (CPython C API, no pybind11).
//
// These are the two numpy hot spots of the fast5 -> features path
// (reference hot loops: extract_features.py:143-151, 269-276).  Both are
// BIT-EXACT re-implementations of the numpy semantics the framework's
// parity contract is pinned to (tests/test_ref_parity.py byte-compares
// against the in-process reference extractor):
//
// - median: selection (introselect / nth_element) returns the exact same
//   element(s) numpy's partition picks; the even-length midpoint is
//   (lo + hi) / 2 in double, identical to np.mean of the two middles.
// - mean/std: numpy reduces 1-D doubles with PAIRWISE summation (8
//   partial accumulators per 128-element block, recursive halving above) —
//   replicated here verbatim; verified bit-identical on this host for all
//   segment lengths (tests/test_native.py).
// - rounding: np.around(x, 6) == rint(x * 1e6) / 1e6 elementwise.
//
// API:
//   normalize_mad(signals: float64[N]) -> float64[N]
//     (x - median(x)) / median(|x - median(x)| / 0.6744897501960817),
//     rounded to 6 decimals.  Input must be the rescaled pA float64 signal.
//   segment_stats(norm: float64[N], starts: int64[M], lens: int64[M])
//     -> (means: float64[M], stds: float64[M])   (population std, ddof=0)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <charconv>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

// numpy's scalar pairwise summation (numpy/_core/src/umath/loops.c.src),
// blocksize 128, 8-way unrolled partials.  Bit-exact match verified on this
// host for n <= 4096 (segments are < ~2000 signal points).
static double pairwise_sum(const double* a, npy_intp n) {
  if (n < 8) {
    double s = 0.0;
    for (npy_intp i = 0; i < n; i++) s += a[i];
    return s;
  }
  if (n <= 128) {
    double r0 = a[0], r1 = a[1], r2 = a[2], r3 = a[3];
    double r4 = a[4], r5 = a[5], r6 = a[6], r7 = a[7];
    npy_intp i = 8;
    for (; i + 8 <= n; i += 8) {
      r0 += a[i + 0]; r1 += a[i + 1]; r2 += a[i + 2]; r3 += a[i + 3];
      r4 += a[i + 4]; r5 += a[i + 5]; r6 += a[i + 6]; r7 += a[i + 7];
    }
    double res = ((r0 + r1) + (r2 + r3)) + ((r4 + r5) + (r6 + r7));
    for (; i < n; i++) res += a[i];
    return res;
  }
  npy_intp n2 = n / 2;
  n2 -= n2 % 8;
  return pairwise_sum(a, n2) + pairwise_sum(a + n2, n - n2);
}

// np.median: partition-select; even length -> mean of the two middles.
static double median_inplace(std::vector<double>& v) {
  size_t n = v.size();
  size_t k = (n - 1) / 2;
  std::nth_element(v.begin(), v.begin() + k, v.end());
  double lo = v[k];
  if (n % 2) return lo;
  double hi = *std::min_element(v.begin() + k + 1, v.end());
  return (lo + hi) / 2.0;
}

static PyObject* normalize_mad(PyObject*, PyObject* args) {
  PyObject* in_obj;
  if (!PyArg_ParseTuple(args, "O", &in_obj)) return nullptr;
  PyArrayObject* in = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(in_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY));
  if (!in) return nullptr;
  npy_intp n = PyArray_SIZE(in);
  if (n == 0) {  // corrupt read: empty signal — mirror numpy (empty out)
    Py_DECREF(in);
    npy_intp zero[1] = {0};
    return PyArray_SimpleNew(1, zero, NPY_DOUBLE);
  }
  const double* x = static_cast<const double*>(PyArray_DATA(in));

  constexpr double kMadScale = 0.6744897501960817;  // norm.ppf(0.75)
  std::vector<double> scratch(x, x + n);
  double med = median_inplace(scratch);
  for (npy_intp i = 0; i < n; i++)
    scratch[i] = std::fabs(x[i] - med) / kMadScale;
  double sscale = median_inplace(scratch);

  npy_intp dims[1] = {n};
  PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(1, dims, NPY_DOUBLE));
  if (!out) { Py_DECREF(in); return nullptr; }
  double* o = static_cast<double*>(PyArray_DATA(out));
  for (npy_intp i = 0; i < n; i++) {
    double v = (x[i] - med) / sscale;
    o[i] = std::rint(v * 1e6) / 1e6;  // np.around(v, 6)
  }
  Py_DECREF(in);
  return reinterpret_cast<PyObject*>(out);
}

static PyObject* segment_stats(PyObject*, PyObject* args) {
  PyObject *norm_obj, *starts_obj, *lens_obj;
  if (!PyArg_ParseTuple(args, "OOO", &norm_obj, &starts_obj, &lens_obj))
    return nullptr;
  PyArrayObject* norm = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(norm_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY));
  PyArrayObject* starts = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(starts_obj, NPY_INT64, NPY_ARRAY_IN_ARRAY));
  PyArrayObject* lens = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(lens_obj, NPY_INT64, NPY_ARRAY_IN_ARRAY));
  if (!norm || !starts || !lens) {
    Py_XDECREF(norm); Py_XDECREF(starts); Py_XDECREF(lens);
    return nullptr;
  }
  npy_intp n = PyArray_SIZE(norm);
  npy_intp m = PyArray_SIZE(starts);
  if (PyArray_SIZE(lens) != m) {
    Py_DECREF(norm); Py_DECREF(starts); Py_DECREF(lens);
    PyErr_SetString(PyExc_ValueError, "starts/lens length mismatch");
    return nullptr;
  }
  const double* x = static_cast<const double*>(PyArray_DATA(norm));
  const npy_int64* st = static_cast<const npy_int64*>(PyArray_DATA(starts));
  const npy_int64* ln = static_cast<const npy_int64*>(PyArray_DATA(lens));

  npy_intp dims[1] = {m};
  PyArrayObject* means = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(1, dims, NPY_DOUBLE));
  PyArrayObject* stds = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(1, dims, NPY_DOUBLE));
  if (!means || !stds) {
    Py_DECREF(norm); Py_DECREF(starts); Py_DECREF(lens);
    Py_XDECREF(means); Py_XDECREF(stds);
    return nullptr;
  }
  double* mo = static_cast<double*>(PyArray_DATA(means));
  double* so = static_cast<double*>(PyArray_DATA(stds));

  std::vector<double> sq;
  for (npy_intp i = 0; i < m; i++) {
    npy_int64 s = st[i], L = ln[i];
    if (L <= 0 || s < 0 || s + L > n) {
      Py_DECREF(norm); Py_DECREF(starts); Py_DECREF(lens);
      Py_DECREF(means); Py_DECREF(stds);
      PyErr_Format(PyExc_ValueError,
                   "segment %zd out of bounds (start=%lld len=%lld n=%zd)",
                   static_cast<Py_ssize_t>(i),
                   static_cast<long long>(s), static_cast<long long>(L), n);
      return nullptr;
    }
    const double* seg = x + s;
    // np.mean: pairwise sum / L
    double mean = pairwise_sum(seg, L) / static_cast<double>(L);
    // np.std (_var, ddof=0): pairwise sum of (x - mean)^2 / L, then sqrt
    sq.resize(L);
    for (npy_int64 j = 0; j < L; j++) {
      double d = seg[j] - mean;
      sq[j] = d * d;
    }
    double var = pairwise_sum(sq.data(), L) / static_cast<double>(L);
    mo[i] = mean;
    so[i] = std::sqrt(var);
  }
  Py_DECREF(norm); Py_DECREF(starts); Py_DECREF(lens);
  PyObject* tup = PyTuple_Pack(2, means, stds);
  Py_DECREF(means); Py_DECREF(stds);
  return tup;
}

// Append the repr of one already-6-decimal-rounded double to ``buf``,
// byte-identical to CPython ``str(x)``:
// - values where the 6-decimal positional form IS the shortest round-trip
//   repr (1e-4 <= |x| < 1e9 and x == nearest-double(k/1e6)) are formatted
//   by integer to_chars + trailing-zero trim — ~12x cheaper than the
//   dragon4 shortest-repr search;
// - everything else (scientific range, large magnitudes, non-roundtrip,
//   non-finite) falls back to PyOS_double_to_string repr mode, the exact
//   str() algorithm.
static bool append_repr6(std::vector<char>& buf, double x) {
  if (x == 0.0) {
    if (std::signbit(x)) buf.push_back('-');
    buf.push_back('0'); buf.push_back('.'); buf.push_back('0');
    return true;
  }
  double ax = std::fabs(x);
  // Guard |x| < 1e9: there the double ulp (< 1e-6) is finer than the
  // 6-decimal grid, so the trimmed 6-digit form is provably the SHORTEST
  // round-tripping decimal (= repr); above it, shorter decimals can
  // round-trip and repr diverges from the positional form.  Also keeps
  // x*1e6 far inside long long (llrint overflow is UB).  Feature values
  // are normalized signals (|x| ~ 10), so the fast path covers them all.
  if (std::isfinite(x) && ax >= 1e-4 && ax < 1e9) {
    long long k = llrint(x * 1e6);
    if (static_cast<double>(k) / 1e6 == x) {
      // integer formatting of q.rrrrrr (trailing-zero-trimmed) — ~4x
      // cheaper than snprintf %.6f, same digits by construction
      unsigned long long u = k < 0 ? -static_cast<unsigned long long>(k)
                                   : static_cast<unsigned long long>(k);
      unsigned long long q = u / 1000000, r = u % 1000000;
      if (k < 0) buf.push_back('-');
      char tmp[24];
      auto res = std::to_chars(tmp, tmp + sizeof tmp, q);
      buf.insert(buf.end(), tmp, res.ptr);
      buf.push_back('.');
      char frac[6];
      for (int d = 5; d >= 0; d--) { frac[d] = '0' + (r % 10); r /= 10; }
      int flen = 6;
      while (flen > 1 && frac[flen - 1] == '0') flen--;
      buf.insert(buf.end(), frac, frac + flen);
      return true;
    }
  }
  char* s = PyOS_double_to_string(x, 'r', 0, Py_DTSF_ADD_DOT_0, nullptr);
  if (!s) return false;
  buf.insert(buf.end(), s, s + strlen(s));
  PyMem_Free(s);
  return true;
}

static PyObject* format_rows6(PyObject*, PyObject* args) {
  // float64 [S, K] matrix of round(x, 6) values -> list of S strings, each
  // the comma-joined str() reprs of one row (the feature-TSV cell format,
  // io/feature_codec.format_feature_row).
  PyObject* in_obj;
  if (!PyArg_ParseTuple(args, "O", &in_obj)) return nullptr;
  PyArrayObject* in = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(in_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY));
  if (!in) return nullptr;
  if (PyArray_NDIM(in) != 2) {
    Py_DECREF(in);
    PyErr_SetString(PyExc_ValueError, "format_rows6 expects a 2-D array");
    return nullptr;
  }
  npy_intp S = PyArray_DIM(in, 0), K = PyArray_DIM(in, 1);
  const double* x = static_cast<const double*>(PyArray_DATA(in));
  PyObject* out = PyList_New(S);
  if (!out) { Py_DECREF(in); return nullptr; }
  std::vector<char> buf;
  for (npy_intp i = 0; i < S; i++) {
    buf.clear();
    for (npy_intp j = 0; j < K; j++) {
      if (j) buf.push_back(',');
      if (!append_repr6(buf, x[i * K + j])) {
        Py_DECREF(in); Py_DECREF(out);
        return nullptr;
      }
    }
    PyObject* s = PyUnicode_FromStringAndSize(buf.data(), buf.size());
    if (!s) { Py_DECREF(in); Py_DECREF(out); return nullptr; }
    PyList_SET_ITEM(out, i, s);
  }
  Py_DECREF(in);
  return out;
}

// str(np.float32 x), byte-identical to numpy 2.x scalar str:
// - nan (any sign) -> "nan"; +/-inf -> "inf"/"-inf"; +/-0 -> "0.0"/"-0.0"
// - shortest round-trip digits (dragon4 unique mode == Ryu/std::to_chars:
//   both emit the correctly-rounded shortest decimal, verified by the
//   import-time self-check and tests/test_native.py's randomized sweep)
// - positional form iff 1e-4 <= |x| < 1e16 (compared on the double-exact
//   value — numpy's own cutoff, probed: float32(1e-4)=9.9999997e-5 prints
//   scientific, 1.0000001e-4 prints positional), with ".0" appended to
//   integral values; otherwise the scientific form "d[.ddd]e+-EE"
//   (to_chars scientific emits the mantissa digits and a 2-digit signed
//   exponent exactly as numpy does — float32 exponents are always 2-digit).
static void append_float32_repr(std::vector<char>& buf, float x) {
  if (std::isnan(x)) {
    buf.insert(buf.end(), {'n', 'a', 'n'});
    return;
  }
  if (std::isinf(x)) {
    if (x < 0) buf.push_back('-');
    buf.insert(buf.end(), {'i', 'n', 'f'});
    return;
  }
  if (x == 0.0f) {
    if (std::signbit(x)) buf.push_back('-');
    buf.insert(buf.end(), {'0', '.', '0'});
    return;
  }
  char tmp[48];
  auto res = std::to_chars(tmp, tmp + sizeof tmp, x,
                           std::chars_format::scientific);
  // parse "[-]d[.ddd]e<sign>EE" into digits + decimal exponent
  const char* p = tmp;
  bool neg = (*p == '-');
  if (neg) p++;
  char digits[16];
  int m = 0;
  digits[m++] = *p++;
  if (*p == '.') {
    p++;
    while (*p != 'e') digits[m++] = *p++;
  }
  const char* epos = p;  // at 'e'
  int exp = 0;
  bool eneg = (p[1] == '-');
  for (p += 2; p < res.ptr; p++) exp = exp * 10 + (*p - '0');
  if (eneg) exp = -exp;

  double ax = std::fabs(static_cast<double>(x));
  if (ax >= 1e-4 && ax < 1e16) {  // positional (numpy's cutoff)
    if (neg) buf.push_back('-');
    if (exp + 1 >= m) {  // integral: digits, zero-pad, ".0"
      buf.insert(buf.end(), digits, digits + m);
      for (int i = 0; i < exp + 1 - m; i++) buf.push_back('0');
      buf.push_back('.');
      buf.push_back('0');
    } else if (exp >= 0) {  // point inside the digits
      buf.insert(buf.end(), digits, digits + exp + 1);
      buf.push_back('.');
      buf.insert(buf.end(), digits + exp + 1, digits + m);
    } else {  // leading "0.00..."
      buf.push_back('0');
      buf.push_back('.');
      for (int i = 0; i < -exp - 1; i++) buf.push_back('0');
      buf.insert(buf.end(), digits, digits + m);
    }
  } else {  // scientific: the to_chars output verbatim
    buf.insert(buf.end(), tmp, res.ptr);
    (void)epos;
  }
}

static PyObject* format_call_block(PyObject*, PyObject* args) {
  // (sampleinfo: list[str], p0: f32[N], p1: f32[N], pred: i64[N],
  //  kmers: u8[N, K], lut: 256 bytes) -> bytes
  // One call_mods output line per site: "info\tp0\tp1\tpred\tkmer\n" with
  // probs formatted as str(np.float32) — the exact 10-column contract of
  // call_modifications.py:184-190 (info carries the first 6 columns).
  PyObject* info_list;
  PyObject *p0_obj, *p1_obj, *pred_obj, *kmer_obj;
  const char* lut;
  Py_ssize_t lut_len;
  if (!PyArg_ParseTuple(args, "O!OOOOy#", &PyList_Type, &info_list, &p0_obj,
                        &p1_obj, &pred_obj, &kmer_obj, &lut, &lut_len))
    return nullptr;
  if (lut_len != 256) {
    PyErr_SetString(PyExc_ValueError, "lut must be 256 bytes");
    return nullptr;
  }
  PyArrayObject* p0 = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(p0_obj, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY));
  PyArrayObject* p1 = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(p1_obj, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY));
  PyArrayObject* pred = reinterpret_cast<PyArrayObject*>(PyArray_FROM_OTF(
      pred_obj, NPY_INT64, NPY_ARRAY_IN_ARRAY | NPY_ARRAY_FORCECAST));
  PyArrayObject* kmer = reinterpret_cast<PyArrayObject*>(PyArray_FROM_OTF(
      kmer_obj, NPY_UINT8, NPY_ARRAY_IN_ARRAY | NPY_ARRAY_FORCECAST));
  if (!p0 || !p1 || !pred || !kmer) {
    Py_XDECREF(p0); Py_XDECREF(p1); Py_XDECREF(pred); Py_XDECREF(kmer);
    return nullptr;
  }
  npy_intp N = PyArray_SIZE(p0);
  bool shape_ok = PyArray_SIZE(p1) == N && PyArray_SIZE(pred) == N &&
                  PyArray_NDIM(kmer) == 2 && PyArray_DIM(kmer, 0) == N &&
                  PyList_GET_SIZE(info_list) == N;
  if (!shape_ok) {
    Py_DECREF(p0); Py_DECREF(p1); Py_DECREF(pred); Py_DECREF(kmer);
    PyErr_SetString(PyExc_ValueError,
                    "format_call_block: length mismatch across inputs");
    return nullptr;
  }
  npy_intp K = PyArray_DIM(kmer, 1);
  const float* a0 = static_cast<const float*>(PyArray_DATA(p0));
  const float* a1 = static_cast<const float*>(PyArray_DATA(p1));
  const npy_int64* ap = static_cast<const npy_int64*>(PyArray_DATA(pred));
  const npy_uint8* ak = static_cast<const npy_uint8*>(PyArray_DATA(kmer));

  std::vector<char> buf;
  buf.reserve(static_cast<size_t>(N) * (96 + K));
  for (npy_intp i = 0; i < N; i++) {
    PyObject* s = PyList_GET_ITEM(info_list, i);
    Py_ssize_t ulen;
    const char* u = PyUnicode_AsUTF8AndSize(s, &ulen);
    if (!u) {
      Py_DECREF(p0); Py_DECREF(p1); Py_DECREF(pred); Py_DECREF(kmer);
      return nullptr;
    }
    buf.insert(buf.end(), u, u + ulen);
    buf.push_back('\t');
    append_float32_repr(buf, a0[i]);
    buf.push_back('\t');
    append_float32_repr(buf, a1[i]);
    buf.push_back('\t');
    char itmp[24];
    auto ires = std::to_chars(itmp, itmp + sizeof itmp,
                              static_cast<long long>(ap[i]));
    buf.insert(buf.end(), itmp, ires.ptr);
    buf.push_back('\t');
    const npy_uint8* row = ak + i * K;
    for (npy_intp j = 0; j < K; j++) buf.push_back(lut[row[j]]);
    buf.push_back('\n');
  }
  Py_DECREF(p0); Py_DECREF(p1); Py_DECREF(pred); Py_DECREF(kmer);
  return PyBytes_FromStringAndSize(buf.data(),
                                   static_cast<Py_ssize_t>(buf.size()));
}

static PyObject* count_read_runs(PyObject*, PyObject* args) {
  // (sampleinfo: list[str]) -> (n_runs, first_read, last_read)
  // Read name = 5th tab-separated field of each info string; counts the
  // contiguous same-read runs in one C pass (the drain meter's read
  // accounting, ~20 ns/site vs ~1 us/site for per-row Python splits).
  PyObject* info_list;
  if (!PyArg_ParseTuple(args, "O!", &PyList_Type, &info_list)) return nullptr;
  Py_ssize_t n = PyList_GET_SIZE(info_list);
  if (n == 0) {
    return Py_BuildValue("nss", static_cast<Py_ssize_t>(0), "", "");
  }
  const char* prev = nullptr;
  Py_ssize_t prev_len = 0;
  const char* first = nullptr;
  Py_ssize_t first_len = 0;
  Py_ssize_t runs = 0;
  for (Py_ssize_t i = 0; i < n; i++) {
    Py_ssize_t ulen;
    const char* u = PyUnicode_AsUTF8AndSize(PyList_GET_ITEM(info_list, i),
                                            &ulen);
    if (!u) return nullptr;
    // locate field 4 (0-based): between the 4th and 5th tab (or end)
    const char* p = u;
    const char* end = u + ulen;
    int tabs = 0;
    while (p < end && tabs < 4) {
      if (*p == '\t') tabs++;
      p++;
    }
    const char* q = p;
    while (q < end && *q != '\t') q++;
    Py_ssize_t len = q - p;
    if (prev == nullptr || len != prev_len ||
        memcmp(p, prev, static_cast<size_t>(len)) != 0) {
      runs++;
      if (first == nullptr) { first = p; first_len = len; }
    }
    prev = p;
    prev_len = len;
  }
  return Py_BuildValue("ns#s#", runs, first, first_len, prev, prev_len);
}

static PyObject* repr_f32(PyObject*, PyObject* args) {
  // float32[N] -> list[str] of str(np.float32) reprs; exists so the
  // formatter's core can be self-checked/stress-tested independently of
  // the full row assembly.
  PyObject* in_obj;
  if (!PyArg_ParseTuple(args, "O", &in_obj)) return nullptr;
  PyArrayObject* in = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(in_obj, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY));
  if (!in) return nullptr;
  npy_intp n = PyArray_SIZE(in);
  const float* x = static_cast<const float*>(PyArray_DATA(in));
  PyObject* out = PyList_New(n);
  if (!out) { Py_DECREF(in); return nullptr; }
  std::vector<char> buf;
  for (npy_intp i = 0; i < n; i++) {
    buf.clear();
    append_float32_repr(buf, x[i]);
    PyObject* s = PyUnicode_FromStringAndSize(buf.data(), buf.size());
    if (!s) { Py_DECREF(in); Py_DECREF(out); return nullptr; }
    PyList_SET_ITEM(out, i, s);
  }
  Py_DECREF(in);
  return out;
}

static PyMethodDef kMethods[] = {
    {"normalize_mad", normalize_mad, METH_VARARGS,
     "MAD-normalize a rescaled float64 signal, rounded to 6 decimals "
     "(bit-exact numpy semantics)."},
    {"segment_stats", segment_stats, METH_VARARGS,
     "Per-segment (mean, std) over a float64 signal, bit-exact vs "
     "np.mean/np.std per slice."},
    {"format_rows6", format_rows6, METH_VARARGS,
     "Comma-join str() reprs of each row of a [S, K] float64 matrix of "
     "6-decimal-rounded values (byte-identical to Python str)."},
    {"format_call_block", format_call_block, METH_VARARGS,
     "Assemble call_mods output lines (info\\tp0\\tp1\\tpred\\tkmer\\n) "
     "into one bytes block; probs formatted as str(np.float32)."},
    {"repr_f32", repr_f32, METH_VARARGS,
     "str(np.float32) repr of each element of a float32 array "
     "(byte-identical to numpy scalar str)."},
    {"count_read_runs", count_read_runs, METH_VARARGS,
     "Count contiguous same-read runs over sampleinfo strings; returns "
     "(n_runs, first_read, last_read)."},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_featkernel",
    "Native featurize kernels (bit-exact numpy semantics).", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__featkernel(void) {
  import_array();
  return PyModule_Create(&kModule);
}
