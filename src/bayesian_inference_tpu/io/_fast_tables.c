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

#include <pthread.h>

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

/* Core parser: fills buf/rows/cols; returns 0 on success, 1 parse error,
 * 2 OOM, 3 IO error. Runs without holding the GIL. */
static int parse_file(const char *path, DoubleBuf *buf, npy_intp *rows, npy_intp *cols_out,
                      const char **errmsg) {
    FILE *f = fopen(path, "rb");
    if (!f) return 3;

    npy_intp n_rows = 0;
    npy_intp n_cols = -1;
    char *line = NULL;
    size_t line_cap = 0;
    ssize_t len;
    int error = 0;

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
                *errmsg = "unparseable token in table";
                break;
            }
            if (buf_push(buf, val) != 0) {
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
            *errmsg = "ragged rows in table";
            break;
        }
        n_rows++;
    }
    free(line);
    fclose(f);
    if (!error && (n_rows == 0 || n_cols <= 0)) {
        error = 1;
        *errmsg = "no data rows found";
    }
    *rows = n_rows;
    *cols_out = n_cols;
    return error;
}

static PyObject *buf_to_array(DoubleBuf *buf, npy_intp rows, npy_intp cols) {
    npy_intp dims[2] = {rows, cols};
    PyObject *arr = PyArray_SimpleNew(2, dims, NPY_DOUBLE);
    if (!arr) return NULL;
    memcpy(PyArray_DATA((PyArrayObject *)arr), buf->data,
           (size_t)(rows * cols) * sizeof(double));
    return arr;
}

static PyObject *raise_parse_error(int error, const char *path, const char *errmsg) {
    if (error == 2) return PyErr_NoMemory();
    if (error == 3) {
        PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
        return NULL;
    }
    PyErr_Format(PyExc_ValueError, "%s: %s", path, errmsg ? errmsg : "parse error");
    return NULL;
}

static PyObject *loadtxt(PyObject *self, PyObject *args) {
    const char *path;
    if (!PyArg_ParseTuple(args, "s", &path)) return NULL;

    DoubleBuf buf = {NULL, 0, 0};
    npy_intp rows = 0, cols = 0;
    const char *errmsg = NULL;
    int error;
    Py_BEGIN_ALLOW_THREADS
    error = parse_file(path, &buf, &rows, &cols, &errmsg);
    Py_END_ALLOW_THREADS

    if (error) {
        free(buf.data);
        return raise_parse_error(error, path, errmsg);
    }
    PyObject *arr = buf_to_array(&buf, rows, cols);
    free(buf.data);
    return arr;
}

/* ---- threaded multi-file loader ------------------------------------------------ */

typedef struct {
    const char *path;
    DoubleBuf buf;
    npy_intp rows, cols;
    const char *errmsg;
    int error;
} ParseJob;

typedef struct {
    ParseJob *jobs;
    int n_jobs;
    int next;
    pthread_mutex_t lock;
} JobQueue;

static void *worker(void *arg) {
    JobQueue *q = (JobQueue *)arg;
    for (;;) {
        pthread_mutex_lock(&q->lock);
        int i = q->next < q->n_jobs ? q->next++ : -1;
        pthread_mutex_unlock(&q->lock);
        if (i < 0) break;
        ParseJob *j = &q->jobs[i];
        j->error = parse_file(j->path, &j->buf, &j->rows, &j->cols, &j->errmsg);
    }
    return NULL;
}

static PyObject *loadtxt_many(PyObject *self, PyObject *args) {
    PyObject *paths;
    int n_threads = 8;
    if (!PyArg_ParseTuple(args, "O|i", &paths, &n_threads)) return NULL;
    PyObject *seq = PySequence_Fast(paths, "loadtxt_many expects a sequence of paths");
    if (!seq) return NULL;
    int n = (int)PySequence_Fast_GET_SIZE(seq);

    ParseJob *jobs = (ParseJob *)calloc((size_t)(n > 0 ? n : 1), sizeof(ParseJob));
    if (!jobs) {
        Py_DECREF(seq);
        return PyErr_NoMemory();
    }
    for (int i = 0; i < n; i++) {
        PyObject *item = PySequence_Fast_GET_ITEM(seq, i);
        jobs[i].path = PyUnicode_AsUTF8(item);
        if (!jobs[i].path) {
            free(jobs);
            Py_DECREF(seq);
            return NULL;
        }
    }

    JobQueue q = {jobs, n, 0, PTHREAD_MUTEX_INITIALIZER};
    if (n_threads > n) n_threads = n > 0 ? n : 1;
    if (n_threads < 1) n_threads = 1;
    pthread_t threads[64];
    if (n_threads > 64) n_threads = 64;

    Py_BEGIN_ALLOW_THREADS
    for (int t = 0; t < n_threads; t++) pthread_create(&threads[t], NULL, worker, &q);
    for (int t = 0; t < n_threads; t++) pthread_join(threads[t], NULL);
    Py_END_ALLOW_THREADS

    PyObject *out = PyList_New(n);
    int failed = -1;
    for (int i = 0; i < n; i++) {
        if (jobs[i].error && failed < 0) failed = i;
    }
    if (failed >= 0 || !out) {
        for (int i = 0; i < n; i++) free(jobs[i].buf.data);
        PyObject *res = NULL;
        if (out) {
            Py_DECREF(out);
            res = raise_parse_error(jobs[failed].error, jobs[failed].path, jobs[failed].errmsg);
        }
        free(jobs);
        Py_DECREF(seq);
        return res;
    }
    for (int i = 0; i < n; i++) {
        PyObject *arr = buf_to_array(&jobs[i].buf, jobs[i].rows, jobs[i].cols);
        free(jobs[i].buf.data);
        if (!arr) {
            for (int k = i + 1; k < n; k++) free(jobs[k].buf.data);
            Py_DECREF(out);
            free(jobs);
            Py_DECREF(seq);
            return NULL;
        }
        PyList_SET_ITEM(out, i, arr);
    }
    free(jobs);
    Py_DECREF(seq);
    return out;
}

static PyMethodDef methods[] = {
    {"loadtxt", loadtxt, METH_VARARGS,
     "loadtxt(path) -> 2-D float64 ndarray; '#' comment lines skipped."},
    {"loadtxt_many", loadtxt_many, METH_VARARGS,
     "loadtxt_many(paths, n_threads=8) -> list of 2-D float64 ndarrays, parsed "
     "concurrently with the GIL released."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fast_tables", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit__fast_tables(void) {
    import_array();
    return PyModule_Create(&moduledef);
}
