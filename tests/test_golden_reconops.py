"""Golden cross-validation of SWC topological sorting against the
reference's OWN supplements/reconops.py run verbatim.

sort_swc decides the row order and re-numbering of every converted
reconstruction; pin the traversal (first-child DFS, branch children
prepended to the pending roots, root-detection fallback ladder, re-point
parents at the FIRST row with the old id) by executing the reference
function, not re-derived expectations.
"""

from __future__ import annotations

import importlib.util
import sys

import numpy as np
import pandas as pd
import pytest

from tests.refshims import REF

pytestmark = pytest.mark.skipif(
    not (REF / "supplements" / "reconops.py").exists(),
    reason="reference supplements unavailable")


@pytest.fixture(scope="module")
def ref_reconops():
    # reconops.py does `from cli_interface import PrintColors` (flat import
    # relative to its own directory)
    supp = str(REF / "supplements")
    if supp not in sys.path:
        sys.path.insert(0, supp)
    spec = importlib.util.spec_from_file_location(
        "ref_reconops", REF / "supplements" / "reconops.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _swc(rows):
    return pd.DataFrame(rows, columns=["id", "type", "x", "y", "z",
                                       "radius", "parent_id"])


CASES = {
    "linear_shuffled": _swc([
        [3, 2, 30.0, 31.0, 32.0, 1.0, 2],
        [1, 1, 10.0, 11.0, 12.0, 2.0, -1],
        [2, 2, 20.0, 21.0, 22.0, 1.5, 1],
    ]),
    "branching": _swc([
        [1, 1, 0.0, 0.0, 0.0, 3.0, -1],
        [2, 2, 1.0, 0.0, 0.0, 1.0, 1],
        [3, 2, 0.0, 1.0, 0.0, 1.0, 1],
        [4, 2, 2.0, 0.0, 0.0, 1.0, 2],
        [5, 2, 0.0, 2.0, 0.0, 1.0, 3],
        [6, 2, 3.0, 0.0, 0.0, 1.0, 4],
    ]),
    "two_trees_gapped_ids": _swc([
        [10, 1, 0.0, 0.0, 0.0, 2.0, -1],
        [11, 2, 1.0, 0.0, 0.0, 1.0, 10],
        [40, 1, 9.0, 9.0, 9.0, 2.0, -1],
        [41, 2, 8.0, 9.0, 9.0, 1.0, 40],
        [12, 2, 2.0, 0.0, 0.0, 1.0, 11],
    ]),
    "root_sentinel_zero": _swc([
        [1, 1, 0.0, 0.0, 0.0, 2.0, 0],
        [2, 2, 1.0, 0.0, 0.0, 1.0, 1],
    ]),
    "duplicate_rows": _swc([
        [1, 1, 0.0, 0.0, 0.0, 2.0, -1],
        [2, 2, 1.0, 0.0, 0.0, 1.0, 1],
        [2, 2, 1.0, 0.0, 0.0, 1.0, 1],
        [3, 2, 2.0, 0.0, 0.0, 1.0, 2],
    ]),
    "no_root_sentinel_forces_id1": _swc([
        [1, 1, 0.0, 0.0, 0.0, 2.0, 99],
        [2, 2, 1.0, 0.0, 0.0, 1.0, 1],
    ]),
    "wide_branching": _swc([
        [1, 1, 0.0, 0.0, 0.0, 3.0, -1],
        [2, 2, 1.0, 0.0, 0.0, 1.0, 1],
        [3, 2, 2.0, 0.0, 0.0, 1.0, 1],
        [4, 2, 3.0, 0.0, 0.0, 1.0, 1],
        [5, 2, 4.0, 0.0, 0.0, 1.0, 3],
        [6, 2, 5.0, 0.0, 0.0, 1.0, 3],
        [7, 2, 6.0, 0.0, 0.0, 1.0, 6],
    ]),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_sort_swc_matches_reference(ref_reconops, name):
    from ipp_tpu.utils import reconops as ro

    df = CASES[name]
    ref = ref_reconops.sort_swc(df.copy())
    ours = ro.sort_swc(df.copy())
    pd.testing.assert_frame_equal(
        ours.reset_index(drop=True), ref.reset_index(drop=True),
        check_dtype=False)
    # every parent precedes its child (-1 and 0 are root sentinels)
    ids = ours["id"].to_numpy()
    for i, pid in enumerate(ours["parent_id"].to_numpy()):
        if pid > 0:
            assert np.where(ids == pid)[0][0] < i


def test_sort_swc_golden_fuzz(ref_reconops):
    """Seeded random forests (multi-tree, shuffled rows, gapped ids,
    random branching) vs the reference's sort_swc run verbatim — the DFS
    ordering, root ladder and parent re-pointing must agree on arbitrary
    topologies, not just the hand-picked cases."""
    from ipp_tpu.utils import reconops as ro

    r = np.random.default_rng(20260819)
    for _ in range(12):
        n = int(r.integers(4, 40))
        n_trees = int(r.integers(1, 4))
        ids = r.choice(np.arange(1, 6 * n), size=n, replace=False)
        ids = np.sort(ids)
        rows = []
        roots = set(range(min(n_trees, n)))
        for i in range(n):
            if i in roots:
                parent = -1
            else:
                parent = int(ids[int(r.integers(0, i))])  # earlier node
            rows.append([int(ids[i]), int(r.integers(1, 5)),
                         float(r.uniform(0, 100)), float(r.uniform(0, 100)),
                         float(r.uniform(0, 100)), float(r.uniform(0.5, 3)),
                         parent])
        df = _swc(rows).sample(frac=1.0, random_state=int(r.integers(1 << 30)))
        df = df.reset_index(drop=True)
        ref = ref_reconops.sort_swc(df.copy())
        ours = ro.sort_swc(df.copy())
        pd.testing.assert_frame_equal(
            ours.reset_index(drop=True), ref.reset_index(drop=True),
            check_dtype=False)
