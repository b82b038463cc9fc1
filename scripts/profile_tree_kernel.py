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

    t0 = time.time()
    sl, sh = tree._msf_select(lo, hi, V)
    out["select_s"] = round(time.time() - t0, 2)
    out["selected_edges"] = len(sl)
    out["retention"] = round(len(sl) / n_edges, 4)

    t0 = time.time()
    kid, par = tree._eliminate(sl, sh, V, select=False)
    sweep_s = time.time() - t0
    out["sweep_selected_s"] = round(sweep_s, 2)
    out["tree_edges"] = len(kid)
    out["with_select_total_s"] = round(out["select_s"] + sweep_s, 2)
    out["effective_rate_Medges_per_s"] = round(
        n_edges / (out["select_s"] + sweep_s) / 1e6, 2
    )

    if not SKIP_NOSELECT:
        t0 = time.time()
        kid2, par2 = tree._eliminate(lo, hi, V, select=False)
        out["sweep_noselect_s"] = round(time.time() - t0, 2)
        out["noselect_rate_Medges_per_s"] = round(n_edges / (time.time() - t0) / 1e6, 2)
        assert set(zip(kid.tolist(), par.tolist())) == set(
            zip(kid2.tolist(), par2.tolist())
        ), "selection changed the tree!"
        out["outputs_identical"] = True

    print(json.dumps(out))


if __name__ == "__main__":
    from bench import ensure_malloc_retention

    ensure_malloc_retention()  # sandbox first-touch artifact; see bench.py
    main()
