// Native image pipeline for the data loaders: fused JPEG decode ->
// PIL-compatible bilinear resize -> crop -> optional hflip, plus a
// GIL-releasing thread-pool batch entry point.
//
// Why native: the reference rides torch's C++ DataLoader workers
// (multi-process); this repo's loaders are host threads, and at pod scale
// (8 chips x ~40 samples/s of 512px training or the FID 5k-image chain)
// Python-side decode becomes the serial bottleneck. This module keeps the
// exact torchvision-equivalent semantics of data/preprocess.py::
// image_transform (resize shorter side with PIL's triangle-filter BILINEAR,
// crop, flip) so the PIL path remains a drop-in fallback — equivalence is
// tested to within PIL's fixed-point rounding (tests/test_native_image_ops.py).
//
// Build: gcc + libjpeg + numpy headers only (no pybind11 in this image);
// see native/__init__.py for the on-demand compile + import.
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <atomic>
#include <csetjmp>
#include <cmath>
#include <algorithm>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
  char msg[JMSG_LENGTH_MAX];
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  (*cinfo->err->format_message)(cinfo, e->msg);
  longjmp(e->jb, 1);
}

// ---- decode -----------------------------------------------------------------

struct Decoded {
  std::vector<unsigned char> rgb;  // H*W*3
  int w = 0, h = 0;
  std::string err;
  bool ok() const { return err.empty(); }
};

Decoded decode_jpeg(const unsigned char* data, size_t len) {
  Decoded out;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    out.err = jerr.msg;
    jpeg_destroy_decompress(&cinfo);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.jpeg_color_space == JCS_CMYK || cinfo.jpeg_color_space == JCS_YCCK) {
    out.err = "CMYK/YCCK jpeg";  // caller falls back to PIL
    jpeg_destroy_decompress(&cinfo);
    return out;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.w = static_cast<int>(cinfo.output_width);
  out.h = static_cast<int>(cinfo.output_height);
  out.rgb.resize(static_cast<size_t>(out.w) * out.h * 3);
  const size_t stride = static_cast<size_t>(out.w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out.rgb.data() + stride * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return out;
}

// ---- PIL-compatible separable bilinear resample -----------------------------
// Matches Pillow's Resample.c: triangle filter with support 1.0, filter scale
// max(in/out, 1), weights normalized per output pixel, horizontal pass
// rounded to uint8 before the vertical pass (Pillow's 8bpc path does the
// same, so intermediate clamping/rounding agrees to within its fixed-point
// coefficient precision).

struct Taps {
  std::vector<int> xmin, xlen;
  std::vector<float> w;  // flattened, kmax per output pixel
  int kmax = 0;
};

Taps build_taps(int in_size, int out_size) {
  Taps t;
  const double scale = static_cast<double>(in_size) / out_size;
  const double fscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * fscale;  // bilinear support = 1
  t.kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.xmin.resize(out_size);
  t.xlen.resize(out_size);
  t.w.assign(static_cast<size_t>(out_size) * t.kmax, 0.f);
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0.0;
    float* w = &t.w[static_cast<size_t>(xx) * t.kmax];
    for (int x = xmin; x < xmax; ++x) {
      double arg = (x - center + 0.5) / fscale;
      double v = arg < 0 ? 1.0 + arg : 1.0 - arg;  // triangle
      if (v < 0) v = 0;
      w[x - xmin] = static_cast<float>(v);
      total += v;
    }
    if (total > 0)
      for (int k = 0; k < xmax - xmin; ++k) w[k] = static_cast<float>(w[k] / total);
    t.xmin[xx] = xmin;
    t.xlen[xx] = xmax - xmin;
  }
  return t;
}

inline unsigned char clip8(float v) {
  int i = static_cast<int>(v + 0.5f);
  if (i < 0) return 0;
  if (i > 255) return 255;
  return static_cast<unsigned char>(i);
}

// Fused resize-to-(rw,rh) + crop res x res at (left, top) + optional hflip.
// Only the needed rows/columns are ever computed.
std::string resize_crop(const Decoded& src, int rw, int rh, int res, int left,
                        int top, bool flip, unsigned char* out /* res*res*3 */) {
  if (left < 0 || top < 0 || left + res > rw || top + res > rh)
    return "crop window out of bounds";
  const Taps hx = build_taps(src.w, rw);
  const Taps vy = build_taps(src.h, rh);
  // source row range feeding output rows [top, top+res)
  int ymin = src.h, ymax = 0;
  for (int yy = top; yy < top + res; ++yy) {
    ymin = std::min(ymin, vy.xmin[yy]);
    ymax = std::max(ymax, vy.xmin[yy] + vy.xlen[yy]);
  }
  // horizontal pass over [ymin, ymax) source rows, output cols
  // [left, left+res), rounded to uint8 as Pillow does between passes
  std::vector<unsigned char> mid(static_cast<size_t>(ymax - ymin) * res * 3);
  for (int y = ymin; y < ymax; ++y) {
    const unsigned char* srow = src.rgb.data() + static_cast<size_t>(y) * src.w * 3;
    unsigned char* drow = mid.data() + static_cast<size_t>(y - ymin) * res * 3;
    for (int xx = 0; xx < res; ++xx) {
      const int ox = left + xx;
      const float* w = &hx.w[static_cast<size_t>(ox) * hx.kmax];
      const int x0 = hx.xmin[ox], n = hx.xlen[ox];
      float r = 0, g = 0, b = 0;
      for (int k = 0; k < n; ++k) {
        const unsigned char* p = srow + static_cast<size_t>(x0 + k) * 3;
        r += w[k] * p[0];
        g += w[k] * p[1];
        b += w[k] * p[2];
      }
      drow[xx * 3 + 0] = clip8(r);
      drow[xx * 3 + 1] = clip8(g);
      drow[xx * 3 + 2] = clip8(b);
    }
  }
  // vertical pass into the output (optionally mirrored)
  for (int yy = 0; yy < res; ++yy) {
    const int oy = top + yy;
    const float* w = &vy.w[static_cast<size_t>(oy) * vy.kmax];
    const int y0 = vy.xmin[oy], n = vy.xlen[oy];
    unsigned char* drow = out + static_cast<size_t>(yy) * res * 3;
    for (int xx = 0; xx < res; ++xx) {
      float r = 0, g = 0, b = 0;
      for (int k = 0; k < n; ++k) {
        const unsigned char* p =
            mid.data() + (static_cast<size_t>(y0 + k - ymin) * res + xx) * 3;
        r += w[k] * p[0];
        g += w[k] * p[1];
        b += w[k] * p[2];
      }
      const int ox = flip ? res - 1 - xx : xx;
      drow[ox * 3 + 0] = clip8(r);
      drow[ox * 3 + 1] = clip8(g);
      drow[ox * 3 + 2] = clip8(b);
    }
  }
  return "";
}

std::string run_one(const unsigned char* data, size_t len, int rw, int rh,
                    int res, int left, int top, bool flip, unsigned char* out) {
  Decoded d = decode_jpeg(data, len);
  if (!d.ok()) return d.err;
  return resize_crop(d, rw, rh, res, left, top, flip, out);
}

// ---- Python bindings --------------------------------------------------------

PyObject* py_probe(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, jerr.msg);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, static_cast<unsigned char*>(buf.buf),
               static_cast<unsigned long>(buf.len));
  jpeg_read_header(&cinfo, TRUE);
  bool cmyk = cinfo.jpeg_color_space == JCS_CMYK || cinfo.jpeg_color_space == JCS_YCCK;
  int w = cinfo.image_width, h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  PyBuffer_Release(&buf);
  if (cmyk) {
    PyErr_SetString(PyExc_ValueError, "CMYK/YCCK jpeg");
    return nullptr;
  }
  return Py_BuildValue("(ii)", w, h);
}

PyObject* py_decode_resize_crop(PyObject*, PyObject* args) {
  Py_buffer buf;
  int rw, rh, res, left, top, flip;
  if (!PyArg_ParseTuple(args, "y*iiiiip", &buf, &rw, &rh, &res, &left, &top, &flip))
    return nullptr;
  npy_intp dims[3] = {res, res, 3};
  PyObject* arr = PyArray_SimpleNew(3, dims, NPY_UINT8);
  if (!arr) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  std::string err;
  Py_BEGIN_ALLOW_THREADS
  err = run_one(static_cast<unsigned char*>(buf.buf), buf.len, rw, rh, res,
                left, top, flip != 0,
                static_cast<unsigned char*>(
                    PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr))));
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  if (!err.empty()) {
    Py_DECREF(arr);
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return arr;
}

// batch: list of (bytes, rw, rh, left, top, flip) -> uint8[N, res, res, 3]
PyObject* py_batch(PyObject*, PyObject* args) {
  PyObject* items;
  int res, nthreads;
  if (!PyArg_ParseTuple(args, "O!ii", &PyList_Type, &items, &res, &nthreads))
    return nullptr;
  const Py_ssize_t n = PyList_GET_SIZE(items);
  struct Job {
    const unsigned char* data;
    size_t len;
    int rw, rh, left, top;
    bool flip;
  };
  std::vector<Job> jobs(n);
  std::vector<Py_buffer> bufs(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* it = PyList_GET_ITEM(items, i);
    PyObject* data_obj;
    int rw, rh, left, top, flip;
    if (!PyArg_ParseTuple(it, "Oiiiip", &data_obj, &rw, &rh, &left, &top, &flip)) {
      for (Py_ssize_t j = 0; j < i; ++j) PyBuffer_Release(&bufs[j]);
      return nullptr;
    }
    if (PyObject_GetBuffer(data_obj, &bufs[i], PyBUF_SIMPLE) != 0) {
      for (Py_ssize_t j = 0; j < i; ++j) PyBuffer_Release(&bufs[j]);
      return nullptr;
    }
    jobs[i] = {static_cast<unsigned char*>(bufs[i].buf),
               static_cast<size_t>(bufs[i].len), rw, rh, left, top, flip != 0};
  }
  npy_intp dims[4] = {n, res, res, 3};
  PyObject* arr = PyArray_SimpleNew(4, dims, NPY_UINT8);
  if (!arr) {
    for (Py_ssize_t j = 0; j < n; ++j) PyBuffer_Release(&bufs[j]);
    return nullptr;
  }
  unsigned char* out = static_cast<unsigned char*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)));
  const size_t item_sz = static_cast<size_t>(res) * res * 3;
  std::vector<std::string> errs(n);
  if (nthreads < 1) nthreads = 1;
  Py_BEGIN_ALLOW_THREADS
  std::vector<std::thread> pool;
  std::atomic<Py_ssize_t> next{0};
  auto worker = [&]() {
    for (;;) {
      const Py_ssize_t i = next.fetch_add(1);
      if (i >= n) return;
      const Job& j = jobs[i];
      errs[i] = run_one(j.data, j.len, j.rw, j.rh, res, j.left, j.top, j.flip,
                        out + item_sz * i);
    }
  };
  const int nt = static_cast<int>(std::min<Py_ssize_t>(nthreads, n));
  for (int t = 1; t < nt; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  Py_END_ALLOW_THREADS
  for (Py_ssize_t j = 0; j < n; ++j) PyBuffer_Release(&bufs[j]);
  for (Py_ssize_t i = 0; i < n; ++i) {
    if (!errs[i].empty()) {
      Py_DECREF(arr);
      PyErr_Format(PyExc_ValueError, "item %zd: %s", static_cast<ssize_t>(i),
                   errs[i].c_str());
      return nullptr;
    }
  }
  return arr;
}

PyMethodDef methods[] = {
    {"probe_jpeg", py_probe, METH_VARARGS,
     "probe_jpeg(data) -> (width, height); raises ValueError on non-RGB-able"},
    {"decode_resize_crop", py_decode_resize_crop, METH_VARARGS,
     "decode_resize_crop(data, rw, rh, res, left, top, flip) -> uint8[res,res,3]"},
    {"batch_decode_resize_crop", py_batch, METH_VARARGS,
     "batch_decode_resize_crop([(data, rw, rh, left, top, flip)...], res, "
     "threads) -> uint8[N,res,res,3]"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moddef = {PyModuleDef_HEAD_INIT, "_image_ops",
                      "native jpeg decode + PIL-compatible resize/crop",
                      -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__image_ops(void) {
  import_array();
  return PyModule_Create(&moddef);
}
