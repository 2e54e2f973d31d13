// CPython modules `grid_subsampling` and `grid_subsampling_lidar`,
// API-compatible with the reference extension
// (wrapper.cpp:70-86: compute(points, features=None, classes=None,
// sampleDl=0.1, method="barycenters", verbose=0)).
//
// One translation unit builds both modules; GRID_SUBSAMPLING_LIDAR selects
// the lidar (best-aligned-point) policy.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstring>
#include <vector>

#include "subsample_core.hpp"

namespace {

PyObject* compute(PyObject*, PyObject* args, PyObject* kwargs) {
  PyObject* points_obj = nullptr;
  PyObject* features_obj = nullptr;
  PyObject* classes_obj = nullptr;
  float sample_dl = 0.1f;
  const char* method = "barycenters";
  int verbose = 0;

  static const char* kwlist[] = {"points", "features", "classes",
                                 "sampleDl", "method", "verbose", nullptr};
  if (!PyArg_ParseTupleAndKeywords(
          args, kwargs, "O|$OOfsi", const_cast<char**>(kwlist), &points_obj,
          &features_obj, &classes_obj, &sample_dl, &method, &verbose)) {
    PyErr_SetString(PyExc_RuntimeError, "Error parsing arguments");
    return nullptr;
  }
  if (std::strcmp(method, "barycenters") != 0 &&
      std::strcmp(method, "voxelcenters") != 0) {
    PyErr_SetString(PyExc_RuntimeError,
                    "Error parsing method. Valid method names are "
                    "\"barycenters\" and \"voxelcenters\" ");
    return nullptr;
  }

  PyArrayObject* points = (PyArrayObject*)PyArray_FROM_OTF(
      points_obj, NPY_FLOAT32, NPY_ARRAY_IN_ARRAY);
  if (!points) return nullptr;
  PyArrayObject* features = nullptr;
  PyArrayObject* classes = nullptr;
  if (features_obj && features_obj != Py_None) {
    features = (PyArrayObject*)PyArray_FROM_OTF(features_obj, NPY_FLOAT32,
                                                NPY_ARRAY_IN_ARRAY);
    if (!features) {
      Py_DECREF(points);
      return nullptr;
    }
  }
  if (classes_obj && classes_obj != Py_None) {
    classes = (PyArrayObject*)PyArray_FROM_OTF(classes_obj, NPY_INT32,
                                               NPY_ARRAY_IN_ARRAY);
    if (!classes) {
      Py_DECREF(points);
      Py_XDECREF(features);
      return nullptr;
    }
  }

  if (PyArray_NDIM(points) != 2 || PyArray_DIM(points, 1) != 3) {
    PyErr_SetString(PyExc_RuntimeError, "points must have shape (N, 3)");
    Py_DECREF(points);
    Py_XDECREF(features);
    Py_XDECREF(classes);
    return nullptr;
  }
  const size_t n = (size_t)PyArray_DIM(points, 0);
  size_t fdim = 0, ldim = 0;
  if (features) {
    fdim = PyArray_NDIM(features) == 2 ? (size_t)PyArray_DIM(features, 1) : 1;
    if ((size_t)PyArray_SIZE(features) != n * fdim) {
      PyErr_SetString(PyExc_RuntimeError, "features size mismatch");
      Py_DECREF(points);
      Py_DECREF(features);
      Py_XDECREF(classes);
      return nullptr;
    }
  }
  if (classes) {
    ldim = PyArray_NDIM(classes) == 2 ? (size_t)PyArray_DIM(classes, 1) : 1;
  }

  std::vector<float> out_points, out_features;
  std::vector<int> out_labels;
#ifdef GRID_SUBSAMPLING_LIDAR
  const bool lidar_mode = true;
#else
  const bool lidar_mode = false;
#endif
  size_t m;
  Py_BEGIN_ALLOW_THREADS;
  m = sdpc::grid_subsample(
      (const float*)PyArray_DATA(points), n,
      features ? (const float*)PyArray_DATA(features) : nullptr, fdim,
      classes ? (const int*)PyArray_DATA(classes) : nullptr, ldim, sample_dl,
      lidar_mode, out_points, out_features, out_labels);
  Py_END_ALLOW_THREADS;

  npy_intp pdims[2] = {(npy_intp)m, 3};
  PyObject* rp = PyArray_SimpleNew(2, pdims, NPY_FLOAT32);
  std::memcpy(PyArray_DATA((PyArrayObject*)rp), out_points.data(),
              out_points.size() * sizeof(float));

  PyObject* result;
  if (features && classes) {
    npy_intp fd[2] = {(npy_intp)m, (npy_intp)fdim};
    npy_intp ld[2] = {(npy_intp)m, (npy_intp)ldim};
    PyObject* rf = PyArray_SimpleNew(2, fd, NPY_FLOAT32);
    PyObject* rl = PyArray_SimpleNew(2, ld, NPY_INT32);
    std::memcpy(PyArray_DATA((PyArrayObject*)rf), out_features.data(),
                out_features.size() * sizeof(float));
    std::memcpy(PyArray_DATA((PyArrayObject*)rl), out_labels.data(),
                out_labels.size() * sizeof(int));
    result = Py_BuildValue("NNN", rp, rf, rl);
  } else if (features) {
    npy_intp fd[2] = {(npy_intp)m, (npy_intp)fdim};
    PyObject* rf = PyArray_SimpleNew(2, fd, NPY_FLOAT32);
    std::memcpy(PyArray_DATA((PyArrayObject*)rf), out_features.data(),
                out_features.size() * sizeof(float));
    result = Py_BuildValue("NN", rp, rf);
  } else if (classes) {
    npy_intp ld[2] = {(npy_intp)m, (npy_intp)ldim};
    PyObject* rl = PyArray_SimpleNew(2, ld, NPY_INT32);
    std::memcpy(PyArray_DATA((PyArrayObject*)rl), out_labels.data(),
                out_labels.size() * sizeof(int));
    result = Py_BuildValue("NN", rp, rl);
  } else {
    result = rp;
  }

  Py_DECREF(points);
  Py_XDECREF(features);
  Py_XDECREF(classes);
  return result;
}

PyMethodDef methods[] = {
    {"compute", (PyCFunction)compute, METH_VARARGS | METH_KEYWORDS,
     "Voxel-grid subsampling of a point cloud."},
    {nullptr, nullptr, 0, nullptr}};

#ifdef GRID_SUBSAMPLING_LIDAR
PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "grid_subsampling_lidar",
                         "LiDAR-aware voxel-grid subsampling", -1, methods,
                         nullptr, nullptr, nullptr, nullptr};
#else
PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "grid_subsampling",
                         "Voxel-grid subsampling", -1, methods,
                         nullptr, nullptr, nullptr, nullptr};
#endif

}  // namespace

#ifdef GRID_SUBSAMPLING_LIDAR
PyMODINIT_FUNC PyInit_grid_subsampling_lidar(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
#else
PyMODINIT_FUNC PyInit_grid_subsampling(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
#endif
