"""Optional C implementation of the elimination sweep's union-find loop.

The sweep (tree.py ``_eliminate``) is an inherently sequential
union-find pass — the one kernel numpy cannot vectorize — and the
interpreted loop runs at ~1M unions/s/core, the documented serial floor
of the driver tree build. This module compiles the EXACT same loop
(path-halving find, adopt, union; integer-for-integer identical to the
Python version) to a tiny shared library at first use and calls it via
ctypes on the numpy buffers, ~50x faster.

Strictly an accelerator, never a dependency: any failure (no compiler,
read-only tmp, load error) silently yields the interpreted fallback, so
the engine still runs on nodes without a toolchain; set
SPARK_GRAFT_NO_CSWEEP=1 to force the fallback (used by the equivalence
tests). The compiled artifact is cached per source-hash in the temp dir
and the rename is atomic, so concurrent executor workers race safely.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>

/* Elimination sweep over (lo, hi) pairs already sorted by hi.
   Exact port of tree.py::_eliminate's loop: for each edge, find the
   root of lo's component with path halving; if it differs from hi,
   emit (root -> hi) and union. uf must arrive initialized to the
   identity permutation; kid_out/par_out must hold min(n_edges,
   n_vertices) slots. Returns the number of pairs emitted. */
int64_t sheep_sweep(const int64_t *lo, const int64_t *hi, int64_t n_edges,
                    int64_t *uf, int64_t *kid_out, int64_t *par_out) {
    int64_t n_out = 0;
    for (int64_t i = 0; i < n_edges; i++) {
        int64_t x = hi[i];
        int64_t r = lo[i];
        int64_t p = uf[r];
        while (p != r) {       /* path halving, as in the Python sweep */
            int64_t pp = uf[p];
            uf[r] = pp;
            r = pp;
            p = uf[r];
        }
        if (r != x) {
            kid_out[n_out] = r;
            par_out[n_out] = x;
            n_out++;
            uf[r] = x;
        }
    }
    return n_out;
}
"""

_cached_fn = None
_load_attempted = False


def _compile() -> str | None:
    """Compile the kernel once per source version; atomic cache in tmp."""
    tag = hashlib.md5(_C_SRC.encode()).hexdigest()[:16]
    tmpdir = tempfile.gettempdir()
    so_path = os.path.join(tmpdir, f"sheep_csweep_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    c_path = os.path.join(tmpdir, f"sheep_csweep_{tag}_{os.getpid()}.c")
    build_path = so_path + f".build_{os.getpid()}"
    try:
        with open(c_path, "w") as f:
            f.write(_C_SRC)
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", "-o", build_path, c_path],
            check=True,
            capture_output=True,
            timeout=60,
        )
        os.rename(build_path, so_path)  # atomic: concurrent compiles race safely
        return so_path
    except Exception:
        return None
    finally:
        for p in (c_path, build_path):
            try:
                os.remove(p)
            except OSError:
                pass


def loaded():
    """The compiled sweep as a python callable, or None (fallback).

    Signature: fn(lo, hi, uf, kid_out, par_out) -> n_out, where all five
    are int64 C-contiguous numpy arrays, lo/hi sorted by hi, uf the
    identity permutation of n_vertices (mutated in place).
    """
    global _cached_fn, _load_attempted
    if _load_attempted:
        return _cached_fn
    _load_attempted = True
    if os.environ.get("SPARK_GRAFT_NO_CSWEEP") == "1":
        return None
    so_path = _compile()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
        raw = lib.sheep_sweep
        raw.restype = ctypes.c_int64
        raw.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
    except Exception:
        return None

    p64 = ctypes.POINTER(ctypes.c_int64)

    def fn(lo: np.ndarray, hi: np.ndarray, uf: np.ndarray,
           kid_out: np.ndarray, par_out: np.ndarray) -> int:
        return raw(
            lo.ctypes.data_as(p64),
            hi.ctypes.data_as(p64),
            len(lo),
            uf.ctypes.data_as(p64),
            kid_out.ctypes.data_as(p64),
            par_out.ctypes.data_as(p64),
        )

    _cached_fn = fn
    return fn
