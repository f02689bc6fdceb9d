// Native host tier: voxel-grid gather kernels for the data/ETL path.
//
// The reference's only native code is its CUDA kernel tier (replaced here by
// Pallas on TPU); its HOST pipelines are per-point Python dict loops. This
// extension provides C++ implementations of the two host kernels that resist
// NumPy vectorization:
//
//  * moments27  — per-query accumulation of (count, sum, outer-product-sum)
//    over the 27-voxel neighborhood (normals/curvature estimation,
//    reference stage_data.py:79-101);
//  * neighbor_gather — per-point sampling of K neighbor indices from the
//    members of 27 coarse voxels (MCPNet staging,
//    reference train_mcpnet.py:104-117).
//
// Built with build_native.sh; learn_region_grow_tpu.native falls back to the
// vectorized NumPy implementations when the extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>
#include <cstring>

// branchless binary search over sorted int64 keys; returns slot or -1
static inline int64_t lookup(const int64_t *keys, int64_t m, int64_t q) {
    int64_t lo = 0, hi = m;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (keys[mid] < q) lo = mid + 1; else hi = mid;
    }
    return (lo < m && keys[lo] == q) ? lo : -1;
}

// open-addressing hash table (linear probing, power-of-two size): one
// O(M) build turns the Q*27 probe lookups O(1) — the binary-search
// formulation was ~60% of moments27's time at room scale (14 cache-cold
// probes per lookup over a ~16k-key array)
struct KeyTable {
    int64_t *keys;   // EMPTY = INT64_MIN
    int64_t *slots;
    uint64_t mask;
};
static const int64_t KT_EMPTY = INT64_MIN;

static inline uint64_t kt_hash(int64_t k) {
    return (uint64_t)k * 0x9E3779B97F4A7C15ULL;
}

static int kt_build(KeyTable *t, const int64_t *keys, int64_t m) {
    uint64_t cap = 16;
    while (cap < (uint64_t)(2 * m + 1)) cap <<= 1;
    t->keys = (int64_t *)malloc(cap * sizeof(int64_t));
    t->slots = (int64_t *)malloc(cap * sizeof(int64_t));
    if (!t->keys || !t->slots) { free(t->keys); free(t->slots); return 0; }
    for (uint64_t i = 0; i < cap; ++i) t->keys[i] = KT_EMPTY;
    t->mask = cap - 1;
    for (int64_t s = 0; s < m; ++s) {
        uint64_t h = kt_hash(keys[s]) & t->mask;
        while (t->keys[h] != KT_EMPTY) h = (h + 1) & t->mask;
        t->keys[h] = keys[s];
        t->slots[h] = s;
    }
    return 1;
}

static inline int64_t kt_lookup(const KeyTable *t, int64_t q) {
    uint64_t h = kt_hash(q) & t->mask;
    while (t->keys[h] != KT_EMPTY) {
        if (t->keys[h] == q) return t->slots[h];
        h = (h + 1) & t->mask;
    }
    return -1;
}

static void kt_free(KeyTable *t) { free(t->keys); free(t->slots); }

// xorshift64* PRNG — deterministic given seed (stream differs from NumPy's;
// the Python fallback documents this)
static inline uint64_t xs64(uint64_t *s) {
    uint64_t x = *s;
    x ^= x >> 12; x ^= x << 25; x ^= x >> 27;
    *s = x;
    return x * 0x2545F4914F6CDD1DULL;
}

// moments27(sorted_keys (M,), counts (M,), sums (M,3), outers (M,9),
//           probe_keys (Q,27)) -> (n (Q,), s (Q,3), o (Q,9))
static PyObject *moments27(PyObject *self, PyObject *args) {
    PyArrayObject *keys, *counts, *sums, *outers, *probes;
    if (!PyArg_ParseTuple(args, "O!O!O!O!O!",
                          &PyArray_Type, &keys, &PyArray_Type, &counts,
                          &PyArray_Type, &sums, &PyArray_Type, &outers,
                          &PyArray_Type, &probes))
        return NULL;
    const int64_t m = PyArray_DIM(keys, 0);
    const int64_t q = PyArray_DIM(probes, 0);
    const int64_t *kp = (const int64_t *)PyArray_DATA(keys);
    const double *cp = (const double *)PyArray_DATA(counts);
    const double *sp = (const double *)PyArray_DATA(sums);
    const double *op = (const double *)PyArray_DATA(outers);
    const int64_t *pp = (const int64_t *)PyArray_DATA(probes);

    npy_intp dn[1] = {q}, ds[2] = {q, 3}, dq[2] = {q, 9};
    PyObject *rn = PyArray_ZEROS(1, dn, NPY_DOUBLE, 0);
    PyObject *rs = PyArray_ZEROS(2, ds, NPY_DOUBLE, 0);
    PyObject *ro = PyArray_ZEROS(2, dq, NPY_DOUBLE, 0);
    double *n_out = (double *)PyArray_DATA((PyArrayObject *)rn);
    double *s_out = (double *)PyArray_DATA((PyArrayObject *)rs);
    double *o_out = (double *)PyArray_DATA((PyArrayObject *)ro);

    Py_BEGIN_ALLOW_THREADS
    KeyTable kt;
    int kt_ok = kt_build(&kt, kp, m);
    for (int64_t i = 0; i < q; ++i) {
        double nn = 0.0, ss[3] = {0, 0, 0}, oo[9] = {0};
        const int64_t *row = pp + i * 27;
        for (int j = 0; j < 27; ++j) {
            int64_t slot = kt_ok ? kt_lookup(&kt, row[j])
                                 : lookup(kp, m, row[j]);
            if (slot < 0) continue;
            nn += cp[slot];
            const double *sv = sp + slot * 3;
            ss[0] += sv[0]; ss[1] += sv[1]; ss[2] += sv[2];
            const double *ov = op + slot * 9;
            for (int t = 0; t < 9; ++t) oo[t] += ov[t];
        }
        n_out[i] = nn;
        memcpy(s_out + i * 3, ss, sizeof(ss));
        memcpy(o_out + i * 9, oo, sizeof(oo));
    }
    if (kt_ok) kt_free(&kt);
    Py_END_ALLOW_THREADS
    return Py_BuildValue("(NNN)", rn, rs, ro);
}

// neighbor_gather(sorted_keys (M,), slot_start (M+1,), member_idx (N,),
//                 probe_keys (Q,27), k, seed) -> int64 (Q,k)
// Per query: concat members of the 27 probed voxels (bounded scan), then
// sample k without replacement when enough candidates (partial
// Fisher-Yates), else with replacement.
static PyObject *neighbor_gather(PyObject *self, PyObject *args) {
    PyArrayObject *keys, *starts, *members, *probes;
    long k_arg;
    unsigned long long seed;
    if (!PyArg_ParseTuple(args, "O!O!O!O!lK",
                          &PyArray_Type, &keys, &PyArray_Type, &starts,
                          &PyArray_Type, &members, &PyArray_Type, &probes,
                          &k_arg, &seed))
        return NULL;
    const int64_t m = PyArray_DIM(keys, 0);
    const int64_t q = PyArray_DIM(probes, 0);
    const int64_t k = (int64_t)k_arg;
    const int64_t *kp = (const int64_t *)PyArray_DATA(keys);
    const int64_t *st = (const int64_t *)PyArray_DATA(starts);
    const int64_t *mb = (const int64_t *)PyArray_DATA(members);
    const int64_t *pp = (const int64_t *)PyArray_DATA(probes);

    npy_intp dims[2] = {q, k};
    PyObject *out = PyArray_ZEROS(2, dims, NPY_INT64, 0);
    int64_t *o = (int64_t *)PyArray_DATA((PyArrayObject *)out);

    int fail = 0;
    Py_BEGIN_ALLOW_THREADS
    uint64_t rng = seed ? seed : 0x9E3779B97F4A7C15ULL;
    int64_t cap = 4096;
    int64_t *cand = (int64_t *)malloc(cap * sizeof(int64_t));
    if (!cand) { fail = 1; }
    for (int64_t i = 0; !fail && i < q; ++i) {
        int64_t cnt = 0;
        const int64_t *row = pp + i * 27;
        for (int j = 0; j < 27; ++j) {
            int64_t slot = lookup(kp, m, row[j]);
            if (slot < 0) continue;
            int64_t b = st[slot], e = st[slot + 1];
            if (cnt + (e - b) > cap) {
                while (cnt + (e - b) > cap) cap *= 2;
                int64_t *nc = (int64_t *)realloc(cand, cap * sizeof(int64_t));
                if (!nc) { fail = 1; break; }
                cand = nc;
            }
            for (int64_t t = b; t < e; ++t) cand[cnt++] = mb[t];
        }
        if (fail) break;
        int64_t *row_out = o + i * k;
        if (cnt >= k) {
            // partial Fisher-Yates for k draws without replacement
            for (int64_t t = 0; t < k; ++t) {
                int64_t j = t + (int64_t)(xs64(&rng) % (uint64_t)(cnt - t));
                int64_t tmp = cand[t]; cand[t] = cand[j]; cand[j] = tmp;
                row_out[t] = cand[t];
            }
        } else if (cnt > 0) {
            for (int64_t t = 0; t < k; ++t)
                row_out[t] = cand[xs64(&rng) % (uint64_t)cnt];
        }
        // cnt == 0 cannot happen for self-inclusive probes; leave zeros
    }
    free(cand);
    Py_END_ALLOW_THREADS
    if (fail) {
        Py_DECREF(out);
        PyErr_NoMemory();
        return NULL;
    }
    return out;
}

static PyMethodDef methods[] = {
    {"moments27", moments27, METH_VARARGS,
     "27-neighborhood voxel moment accumulation"},
    {"neighbor_gather", neighbor_gather, METH_VARARGS,
     "sample K neighbor indices from 27-voxel member lists"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_lrg_native", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit__lrg_native(void) {
    import_array();
    return PyModule_Create(&moduledef);
}
