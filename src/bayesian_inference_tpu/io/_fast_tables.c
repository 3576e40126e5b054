/* Fast whitespace-separated numeric table parser (np.loadtxt replacement for
 * the ingest hot path). The reference spends its table-ingest time inside
 * np.loadtxt (data_IO.py:89,116,143-144); this parses the same format
 * (comment lines starting with '#', rows of float64) in a single pass.
 *
 * Exposes: fast_tables.loadtxt(path: str) -> np.ndarray (2-D, float64)
 * Raises ValueError on ragged rows, OSError on IO failure.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <errno.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    double *data;
    size_t size;
    size_t capacity;
} DoubleBuf;

static int buf_push(DoubleBuf *b, double x) {
    if (b->size == b->capacity) {
        size_t ncap = b->capacity ? b->capacity * 2 : 4096;
        double *nd = (double *)realloc(b->data, ncap * sizeof(double));
        if (!nd) return -1;
        b->data = nd;
        b->capacity = ncap;
    }
    b->data[b->size++] = x;
    return 0;
}

static PyObject *loadtxt(PyObject *self, PyObject *args) {
    const char *path;
    if (!PyArg_ParseTuple(args, "s", &path)) return NULL;

    FILE *f = fopen(path, "rb");
    if (!f) {
        PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
        return NULL;
    }

    DoubleBuf buf = {NULL, 0, 0};
    npy_intp n_rows = 0;
    npy_intp n_cols = -1;
    char *line = NULL;
    size_t line_cap = 0;
    ssize_t len;
    int error = 0;
    const char *errmsg = NULL;

    while ((len = getline(&line, &line_cap, f)) != -1) {
        char *s = line;
        while (*s == ' ' || *s == '\t') s++;
        if (*s == '#' || *s == '\n' || *s == '\r' || *s == '\0') continue;

        npy_intp cols = 0;
        while (1) {
            while (*s == ' ' || *s == '\t') s++;
            if (*s == '\n' || *s == '\r' || *s == '\0' || *s == '#') break;
            char *end;
            errno = 0;
            double val = strtod(s, &end);
            if (end == s) {
                error = 1;
                errmsg = "unparseable token in table";
                break;
            }
            if (buf_push(&buf, val) != 0) {
                error = 2;
                break;
            }
            cols++;
            s = end;
        }
        if (error) break;
        if (cols == 0) continue;
        if (n_cols == -1) {
            n_cols = cols;
        } else if (cols != n_cols) {
            error = 1;
            errmsg = "ragged rows in table";
            break;
        }
        n_rows++;
    }
    free(line);
    fclose(f);

    if (error == 2) {
        free(buf.data);
        return PyErr_NoMemory();
    }
    if (error) {
        free(buf.data);
        PyErr_Format(PyExc_ValueError, "%s: %s", path, errmsg);
        return NULL;
    }
    if (n_rows == 0 || n_cols <= 0) {
        free(buf.data);
        PyErr_Format(PyExc_ValueError, "%s: no data rows found", path);
        return NULL;
    }

    npy_intp dims[2] = {n_rows, n_cols};
    PyObject *arr = PyArray_SimpleNew(2, dims, NPY_DOUBLE);
    if (!arr) {
        free(buf.data);
        return NULL;
    }
    memcpy(PyArray_DATA((PyArrayObject *)arr), buf.data,
           (size_t)(n_rows * n_cols) * sizeof(double));
    free(buf.data);
    return arr;
}

static PyMethodDef methods[] = {
    {"loadtxt", loadtxt, METH_VARARGS,
     "loadtxt(path) -> 2-D float64 ndarray; '#' comment lines skipped."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fast_tables", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit__fast_tables(void) {
    import_array();
    return PyModule_Create(&moduledef);
}
