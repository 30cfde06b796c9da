// devicekmc_native — C++ runtime components for the TPU-native DeviceKMC
// framework: the host-side hot paths that sit outside the XLA compute graph.
//
//   * build_neighbor_list: spatially-hashed neighbour search producing the
//     padded ELL index array the TPU kernels consume (replaces the
//     reference's O(N^2) OpenMP scan, src/Device.cpp:98-136, with an
//     O(N * local) binned search; y/z-periodic minimum image as in
//     src/utils.cpp:100-174).
//   * read_xyz / write_snapshot: bulk structure I/O (reference:
//     src/utils.cpp:72-98, src/Device.cpp:236-252).
//
// Built as a CPython extension (no pybind11 dependency); the Python layer
// falls back to a numpy implementation when this module is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline double wrap_delta(double d, double box) {
    return d - std::round(d / box) * box;
}

// y/z-periodic squared distance (x is the open transport axis)
inline double dist2(const double* a, const double* b, const double* lat,
                    bool pbc) {
    double dx = a[0] - b[0];
    double dy = a[1] - b[1];
    double dz = a[2] - b[2];
    if (pbc) {
        dy = wrap_delta(dy, lat[1]);
        dz = wrap_delta(dz, lat[2]);
    }
    return dx * dx + dy * dy + dz * dz;
}

struct Grid {
    int nx, ny, nz;
    double minx, miny, minz;
    double cx, cy, cz;  // cell sizes
    bool pbc;
    std::vector<int> cell_start;  // bucket offsets (CSR over cells)
    std::vector<int> order;       // site ids sorted by cell

    int cell_index(int ix, int iy, int iz) const {
        return (ix * ny + iy) * nz + iz;
    }
};

void build_grid(const double* coords, npy_intp n, const double* lat,
                double rcut, bool pbc, Grid& g) {
    double maxx = -1e300, maxy = -1e300, maxz = -1e300;
    g.minx = g.miny = g.minz = 1e300;
    for (npy_intp i = 0; i < n; ++i) {
        const double* p = coords + 3 * i;
        g.minx = std::min(g.minx, p[0]); maxx = std::max(maxx, p[0]);
        g.miny = std::min(g.miny, p[1]); maxy = std::max(maxy, p[1]);
        g.minz = std::min(g.minz, p[2]); maxz = std::max(maxz, p[2]);
    }
    double spanx = std::max(maxx - g.minx, 1e-9);
    double spany = std::max(maxy - g.miny, 1e-9);
    double spanz = std::max(maxz - g.minz, 1e-9);
    g.pbc = pbc;
    g.nx = std::max(1, (int)(spanx / rcut));
    if (pbc) {
        // bins must tile the periodic cell exactly in y/z
        g.ny = std::max(1, (int)(lat[1] / rcut));
        g.nz = std::max(1, (int)(lat[2] / rcut));
        spany = lat[1];
        spanz = lat[2];
    } else {
        g.ny = std::max(1, (int)(spany / rcut));
        g.nz = std::max(1, (int)(spanz / rcut));
    }
    g.cx = spanx / g.nx;
    g.cy = spany / g.ny;
    g.cz = spanz / g.nz;

    const int ncells = g.nx * g.ny * g.nz;
    std::vector<int> counts(ncells + 1, 0);
    std::vector<int> cell_of(n);
    for (npy_intp i = 0; i < n; ++i) {
        const double* p = coords + 3 * i;
        int ix = std::min((int)((p[0] - g.minx) / g.cx), g.nx - 1);
        int iy = std::min((int)((p[1] - g.miny) / g.cy), g.ny - 1);
        int iz = std::min((int)((p[2] - g.minz) / g.cz), g.nz - 1);
        int c = g.cell_index(ix, iy, iz);
        cell_of[i] = c;
        counts[c + 1]++;
    }
    for (int c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
    g.cell_start = counts;
    g.order.resize(n);
    std::vector<int> cursor(g.cell_start.begin(), g.cell_start.end() - 1);
    for (npy_intp i = 0; i < n; ++i) g.order[cursor[cell_of[i]]++] = (int)i;
}

// collect neighbours of site i (sorted ascending) into out
void site_neighbors(const Grid& g, const double* coords, const double* lat,
                    double rcut2, double rcut, int i, std::vector<int>& out) {
    out.clear();
    const double* p = coords + 3 * i;
    int ix = std::min((int)((p[0] - g.minx) / g.cx), g.nx - 1);
    int iy = std::min((int)((p[1] - g.miny) / g.cy), g.ny - 1);
    int iz = std::min((int)((p[2] - g.minz) / g.cz), g.nz - 1);
    (void)rcut;
    for (int dx = -1; dx <= 1; ++dx) {
        int jx = ix + dx;
        if (jx < 0 || jx >= g.nx) continue;
        for (int dy = -1; dy <= 1; ++dy) {
            int jy = iy + dy;
            if (g.pbc) jy = (jy + g.ny) % g.ny;
            else if (jy < 0 || jy >= g.ny) continue;
            for (int dz = -1; dz <= 1; ++dz) {
                int jz = iz + dz;
                if (g.pbc) jz = (jz + g.nz) % g.nz;
                else if (jz < 0 || jz >= g.nz) continue;
                int c = g.cell_index(jx, jy, jz);
                for (int k = g.cell_start[c]; k < g.cell_start[c + 1]; ++k) {
                    int j = g.order[k];
                    if (j == i) continue;
                    if (dist2(p, coords + 3 * j, lat, g.pbc) < rcut2)
                        out.push_back(j);
                }
            }
        }
    }
    std::sort(out.begin(), out.end());
    // periodic wrap can visit the same bucket twice when ny/nz <= 2
    out.erase(std::unique(out.begin(), out.end()), out.end());
}

PyObject* py_build_neighbor_list(PyObject*, PyObject* args, PyObject* kwargs) {
    PyObject* coords_obj;
    PyObject* lattice_obj;
    double nn_dist;
    int pbc;
    int max_nn = 0;
    static const char* kwlist[] = {"coords", "lattice", "nn_dist", "pbc",
                                   "max_nn", nullptr};
    if (!PyArg_ParseTupleAndKeywords(
            args, kwargs, "OOdi|i", const_cast<char**>(kwlist), &coords_obj,
            &lattice_obj, &nn_dist, &pbc, &max_nn))
        return nullptr;

    PyArrayObject* coords = (PyArrayObject*)PyArray_FROM_OTF(
        coords_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* lattice = (PyArrayObject*)PyArray_FROM_OTF(
        lattice_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    if (!coords || !lattice) {
        Py_XDECREF(coords);
        Py_XDECREF(lattice);
        return nullptr;
    }
    npy_intp n = PyArray_DIM(coords, 0);
    const double* cp = (const double*)PyArray_DATA(coords);
    const double* lat = (const double*)PyArray_DATA(lattice);

    Grid grid;
    std::vector<std::vector<int>> lists((size_t)n);
    int observed_max = 0;
    double rcut2 = nn_dist * nn_dist;

    Py_BEGIN_ALLOW_THREADS
    build_grid(cp, n, lat, nn_dist, pbc != 0, grid);
#ifdef _OPENMP
#pragma omp parallel
    {
        int local_max = 0;
#pragma omp for schedule(dynamic, 256)
        for (npy_intp i = 0; i < n; ++i) {
            site_neighbors(grid, cp, lat, rcut2, nn_dist, (int)i, lists[i]);
            local_max = std::max(local_max, (int)lists[i].size());
        }
#pragma omp critical
        observed_max = std::max(observed_max, local_max);
    }
#else
    for (npy_intp i = 0; i < n; ++i) {
        site_neighbors(grid, cp, lat, rcut2, nn_dist, (int)i, lists[i]);
        observed_max = std::max(observed_max, (int)lists[i].size());
    }
#endif
    Py_END_ALLOW_THREADS

    if (max_nn <= 0) max_nn = observed_max;
    if (observed_max > max_nn) {
        Py_DECREF(coords);
        Py_DECREF(lattice);
        PyErr_Format(PyExc_ValueError,
                     "max_nn=%d too small: a site has %d neighbours", max_nn,
                     observed_max);
        return nullptr;
    }

    npy_intp dims[2] = {n, max_nn};
    PyArrayObject* out =
        (PyArrayObject*)PyArray_SimpleNew(2, dims, NPY_INT32);
    if (!out) {
        Py_DECREF(coords);
        Py_DECREF(lattice);
        return nullptr;
    }
    int32_t* op = (int32_t*)PyArray_DATA(out);
    Py_BEGIN_ALLOW_THREADS
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (npy_intp i = 0; i < n; ++i) {
        int32_t* row = op + i * max_nn;
        size_t cnt = lists[i].size();
        for (size_t s = 0; s < cnt; ++s) row[s] = lists[i][s];
        for (int s = (int)cnt; s < max_nn; ++s) row[s] = -1;
    }
    Py_END_ALLOW_THREADS

    Py_DECREF(coords);
    Py_DECREF(lattice);
    return (PyObject*)out;
}

// element symbol table (reference: src/utils.cpp:7-53)
int element_id(const char* s) {
    if (!strcmp(s, "d")) return 0;
    if (!strcmp(s, "Od")) return 1;
    if (!strcmp(s, "V")) return 2;
    if (!strcmp(s, "O")) return 3;
    if (!strcmp(s, "Hf")) return 4;
    if (!strcmp(s, "Ni")) return 5;
    if (!strcmp(s, "Ti")) return 6;
    if (!strcmp(s, "Pt")) return 7;
    if (!strcmp(s, "N")) return 8;
    return -1;
}

const char* element_sym(int id) {
    static const char* tab[] = {"d", "Od", "V", "O", "Hf", "Ni", "Ti", "Pt", "N"};
    return (id >= 0 && id < 9) ? tab[id] : "?";
}

PyObject* py_read_xyz(PyObject*, PyObject* args) {
    const char* path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

    FILE* f = fopen(path, "r");
    if (!f) {
        PyErr_SetString(PyExc_FileNotFoundError, path);
        return nullptr;
    }
    char line[1024];
    long n = 0;
    if (!fgets(line, sizeof line, f) || sscanf(line, "%ld", &n) != 1 || n < 0) {
        fclose(f);
        PyErr_SetString(PyExc_ValueError, "bad xyz header");
        return nullptr;
    }
    if (!fgets(line, sizeof line, f)) {  // comment line
        fclose(f);
        PyErr_SetString(PyExc_ValueError, "truncated xyz");
        return nullptr;
    }

    npy_intp ndim = n;
    npy_intp cdims[2] = {n, 3};
    PyArrayObject* elems =
        (PyArrayObject*)PyArray_SimpleNew(1, &ndim, NPY_INT32);
    PyArrayObject* coords =
        (PyArrayObject*)PyArray_SimpleNew(2, cdims, NPY_DOUBLE);
    if (!elems || !coords) {
        Py_XDECREF(elems);
        Py_XDECREF(coords);
        fclose(f);
        return nullptr;
    }
    int32_t* ep = (int32_t*)PyArray_DATA(elems);
    double* cp = (double*)PyArray_DATA(coords);

    bool ok = true;
    char sym[32];
    Py_BEGIN_ALLOW_THREADS
    for (long i = 0; i < n; ++i) {
        if (!fgets(line, sizeof line, f)) { ok = false; break; }
        double x, y, z;
        if (sscanf(line, "%31s %lf %lf %lf", sym, &x, &y, &z) != 4) {
            ok = false;
            break;
        }
        int id = element_id(sym);
        if (id < 0) { ok = false; break; }
        ep[i] = id;
        cp[3 * i] = x;
        cp[3 * i + 1] = y;
        cp[3 * i + 2] = z;
    }
    Py_END_ALLOW_THREADS
    fclose(f);
    if (!ok) {
        Py_DECREF(elems);
        Py_DECREF(coords);
        PyErr_SetString(PyExc_ValueError, "malformed xyz line");
        return nullptr;
    }
    return Py_BuildValue("(NN)", elems, coords);
}

PyObject* py_write_snapshot(PyObject*, PyObject* args) {
    const char* path;
    PyObject *elems_obj, *coords_obj, *pot_obj, *pow_obj;
    const char* comment = "";
    if (!PyArg_ParseTuple(args, "sOOOO|s", &path, &elems_obj, &coords_obj,
                          &pot_obj, &pow_obj, &comment))
        return nullptr;
    PyArrayObject* elems = (PyArrayObject*)PyArray_FROM_OTF(
        elems_obj, NPY_INT32, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* coords = (PyArrayObject*)PyArray_FROM_OTF(
        coords_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* pot = (PyArrayObject*)PyArray_FROM_OTF(
        pot_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* pw = (PyArrayObject*)PyArray_FROM_OTF(
        pow_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    if (!elems || !coords || !pot || !pw) {
        Py_XDECREF(elems); Py_XDECREF(coords); Py_XDECREF(pot); Py_XDECREF(pw);
        return nullptr;
    }
    npy_intp n = PyArray_DIM(elems, 0);
    const int32_t* ep = (const int32_t*)PyArray_DATA(elems);
    const double* cp = (const double*)PyArray_DATA(coords);
    const double* pp = (const double*)PyArray_DATA(pot);
    const double* wp = (const double*)PyArray_DATA(pw);

    FILE* f = fopen(path, "w");
    if (!f) {
        Py_DECREF(elems); Py_DECREF(coords); Py_DECREF(pot); Py_DECREF(pw);
        PyErr_SetString(PyExc_OSError, path);
        return nullptr;
    }
    Py_BEGIN_ALLOW_THREADS
    fprintf(f, "%ld\n%s\n", (long)n, comment);
    for (npy_intp i = 0; i < n; ++i) {
        fprintf(f, "%s   %.10g   %.10g   %.10g   %.10g   %.10g\n",
                element_sym(ep[i]), cp[3 * i], cp[3 * i + 1], cp[3 * i + 2],
                pp[i], wp[i]);
    }
    Py_END_ALLOW_THREADS
    fclose(f);
    Py_DECREF(elems); Py_DECREF(coords); Py_DECREF(pot); Py_DECREF(pw);
    Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"build_neighbor_list", (PyCFunction)py_build_neighbor_list,
     METH_VARARGS | METH_KEYWORDS,
     "build_neighbor_list(coords, lattice, nn_dist, pbc, max_nn=0) -> int32[N, max_nn]"},
    {"read_xyz", py_read_xyz, METH_VARARGS,
     "read_xyz(path) -> (elements int32[N], coords float64[N,3])"},
    {"write_snapshot", py_write_snapshot, METH_VARARGS,
     "write_snapshot(path, elements, coords, potential, power, comment='')"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "devicekmc_native",
    "C++ runtime components for devicekmc_tpu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_devicekmc_native(void) {
    import_array();
    return PyModule_Create(&moduledef);
}
