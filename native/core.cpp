// cyten_tpu native core: host-side plan construction for block-sparse ops.
//
// Role-equivalent to the reference's native layer (src/check.cpp, pybind/core.cpp)
// which is a build-system skeleton; here the native code implements the actual
// host-side hot spots (SURVEY.md §2.8): the contraction-plan grouping that the
// abelian backend runs at trace time for every distinct block structure.
//
// Bound via the CPython C API (no pybind11 in this environment).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <unordered_map>
#include <vector>

namespace cyten_tpu {

// trivial smoke function, mirroring the reference's cyten::add (src/check.cpp:9-11)
static long add(long i, long j) { return i + j; }

struct PairHash {
    size_t operator()(const std::pair<int64_t, int64_t>& p) const {
        uint64_t a = static_cast<uint64_t>(p.first);
        uint64_t b = static_cast<uint64_t>(p.second);
        a ^= b + 0x9e3779b97f4a7c15ULL + (a << 6) + (a >> 2);
        return static_cast<size_t>(a);
    }
};

// compose_plan: given merged integer keys for the contracted and kept index
// columns of two block-sparse tensors, enumerate all GEMM pairs (ia, ib) with
// matching contracted keys and assign each pair an output-block id, numbering
// output blocks by first appearance of the kept-key pair (a_keep, b_keep).
static void compose_plan(const int64_t* a_contr, const int64_t* a_keep, Py_ssize_t na,
                         const int64_t* b_contr, const int64_t* b_keep, Py_ssize_t nb,
                         std::vector<int64_t>& ia, std::vector<int64_t>& ib,
                         std::vector<int64_t>& out_id, int64_t& n_out) {
    std::unordered_map<int64_t, std::vector<int64_t>> groups;
    groups.reserve(static_cast<size_t>(na) * 2);
    for (Py_ssize_t i = 0; i < na; ++i) {
        groups[a_contr[i]].push_back(i);
    }
    std::unordered_map<std::pair<int64_t, int64_t>, int64_t, PairHash> out_ids;
    n_out = 0;
    for (Py_ssize_t j = 0; j < nb; ++j) {
        auto it = groups.find(b_contr[j]);
        if (it == groups.end()) continue;
        for (int64_t i : it->second) {
            auto key = std::make_pair(a_keep[i], b_keep[j]);
            auto found = out_ids.find(key);
            int64_t oid;
            if (found == out_ids.end()) {
                oid = n_out++;
                out_ids.emplace(key, oid);
            } else {
                oid = found->second;
            }
            ia.push_back(i);
            ib.push_back(j);
            out_id.push_back(oid);
        }
    }
}

}  // namespace cyten_tpu

// ----------------------------- Python bindings ------------------------------------

static PyObject* py_add(PyObject*, PyObject* args) {
    long i, j;
    if (!PyArg_ParseTuple(args, "ll", &i, &j)) return nullptr;
    return PyLong_FromLong(cyten_tpu::add(i, j));
}

// helper: parse a contiguous int64 buffer from any object supporting the buffer
// protocol (numpy arrays of dtype int64)
struct BufferView {
    Py_buffer view{};
    bool ok = false;
    const int64_t* data() const { return static_cast<const int64_t*>(view.buf); }
    Py_ssize_t len() const { return view.len / static_cast<Py_ssize_t>(sizeof(int64_t)); }
    ~BufferView() {
        if (ok) PyBuffer_Release(&view);
    }
};

static bool get_i64_buffer(PyObject* obj, BufferView& out) {
    if (PyObject_GetBuffer(obj, &out.view, PyBUF_CONTIG_RO | PyBUF_FORMAT) != 0)
        return false;
    out.ok = true;
    if (out.view.itemsize != sizeof(int64_t)) {
        PyErr_SetString(PyExc_TypeError, "expected int64 array");
        return false;
    }
    return true;
}

static PyObject* py_compose_plan(PyObject*, PyObject* args) {
    PyObject *a_contr_o, *a_keep_o, *b_contr_o, *b_keep_o;
    if (!PyArg_ParseTuple(args, "OOOO", &a_contr_o, &a_keep_o, &b_contr_o,
                          &b_keep_o))
        return nullptr;
    BufferView a_contr, a_keep, b_contr, b_keep;
    if (!get_i64_buffer(a_contr_o, a_contr) || !get_i64_buffer(a_keep_o, a_keep) ||
        !get_i64_buffer(b_contr_o, b_contr) || !get_i64_buffer(b_keep_o, b_keep))
        return nullptr;
    if (a_contr.len() != a_keep.len() || b_contr.len() != b_keep.len()) {
        PyErr_SetString(PyExc_ValueError, "mismatched array lengths");
        return nullptr;
    }
    std::vector<int64_t> ia, ib, out_id;
    int64_t n_out = 0;
    Py_BEGIN_ALLOW_THREADS
    cyten_tpu::compose_plan(a_contr.data(), a_keep.data(), a_contr.len(),
                            b_contr.data(), b_keep.data(), b_contr.len(), ia, ib,
                            out_id, n_out);
    Py_END_ALLOW_THREADS

    Py_ssize_t n = static_cast<Py_ssize_t>(ia.size());
    PyObject* ia_b = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(ia.data()), n * sizeof(int64_t));
    PyObject* ib_b = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(ib.data()), n * sizeof(int64_t));
    PyObject* oid_b = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out_id.data()), n * sizeof(int64_t));
    PyObject* res = Py_BuildValue("(NNNl)", ia_b, ib_b, oid_b, (long)n_out);
    return res;
}

static PyMethodDef Methods[] = {
    {"add", py_add, METH_VARARGS, "add(i, j) -> i + j (smoke test)"},
    {"compose_plan", py_compose_plan, METH_VARARGS,
     "compose_plan(a_contr, a_keep, b_contr, b_keep) -> (ia, ib, out_id, n_out)\n"
     "Enumerate GEMM pairs for block-sparse compose; int64 buffers in, raw int64\n"
     "bytes out."},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_core",
                                       "cyten_tpu native core", -1, Methods};

PyMODINIT_FUNC PyInit__core(void) { return PyModule_Create(&moduledef); }
