#!/usr/bin/env python3
"""Profile the elimination-tree kernel in isolation (no Spark).

Generates the same skewed distribution as bench.synth_edges at com-lj
scale (35M undirected edges, V=4M), converts to deduped (lo, hi)
pos-space pairs, then measures:

  1. _msf_select wall + retention (selected / input edges)
  2. the interpreted union-find sweep WITH selection
  3. the sweep WITHOUT selection (the round-2 driver path)

Prints one JSON line. Used to ground the BASELINE.md kernel-rate claims
(VERDICT r2 tasks 1 and 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sheep_spark import tree  # noqa: E402

E = int(os.environ.get("PROF_EDGES", str(35_000_000)))
V = int(os.environ.get("PROF_V", str(4_000_000)))
SKIP_NOSELECT = os.environ.get("PROF_SKIP_NOSELECT") == "1"


def _warm_memory_pool(gb: float = 8.0) -> None:
    """Pre-touch a pool of pages and free it. This sandbox backs fresh
    pages lazily at ~60 MB/s first touch (measured; warm pages run at
    4+ GB/s), so any phase that allocates big fresh arrays pays a fake
    one-time cost a real host doesn't have. Touch-and-free once, then
    the allocator reuses the warm pool."""
    block = np.ones(int(gb * 125_000_000), dtype=np.int64)
    del block


def main() -> None:
    _warm_memory_pool()
    rng = np.random.default_rng(7)
    # same shape as bench.synth_edges: src uniform, dst ~ u^2.5 hubs
    src = rng.integers(0, V, E, dtype=np.int64)
    dst = (rng.random(E) ** 2.5 * V).astype(np.int64)
    keep = src != dst
    lo = np.minimum(src, dst)[keep]
    hi = np.maximum(src, dst)[keep]
    pairs = np.unique(lo * np.int64(V) + hi)
    lo, hi = pairs // V, pairs % V
    # pos space: the profile uses vid order directly (the sweep only
    # depends on the ORDER being total, which vids are)
    n_edges = len(lo)

    out: dict = {"n_edges_undirected": n_edges, "n_vertices": V}

    from sheep_spark import _csweep

    # Default kernel: the compiled counting-sort + sweep when available
    # (r6 late), with fused pre/pst bincounts; phases from inside C.
    tm: dict = {}
    t0 = time.time()
    kid, par = tree._eliminate(lo, hi, V, timings=tm)
    out["kernel_s"] = round(time.time() - t0, 2)
    out["kernel_detail"] = tm
    out["tree_edges"] = len(kid)
    out["kernel_rate_Medges_per_s"] = round(n_edges / out["kernel_s"] / 1e6, 2)
    out["sort_sweep_compiled"] = _csweep.loaded_sort_sweep() is not None

    if not SKIP_NOSELECT:
        # Legacy path for comparison: Boruvka select + packed sort +
        # (C or interpreted) sweep — what the kernel runs when the
        # sort-sweep .so is unavailable.
        real_ss = _csweep.loaded_sort_sweep
        _csweep.loaded_sort_sweep = lambda: None
        try:
            tm2: dict = {}
            t0 = time.time()
            kid2, par2 = tree._eliminate(lo, hi, V, timings=tm2)
            out["legacy_select_sweep_s"] = round(time.time() - t0, 2)
            out["legacy_detail"] = tm2
        finally:
            _csweep.loaded_sort_sweep = real_ss
        assert set(zip(kid.tolist(), par.tolist())) == set(
            zip(kid2.tolist(), par2.tolist())
        ), "kernel paths disagree!"
        out["outputs_identical"] = True

    print(json.dumps(out))


if __name__ == "__main__":
    from bench import ensure_malloc_retention

    ensure_malloc_retention()  # sandbox first-touch artifact; see bench.py
    main()
