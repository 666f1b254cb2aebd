"""Golden cross-validation of place_tiles_lqp against the reference's own
LQP solver (TeraStitcher/pyscripts/LQP_HE.py:1-702, driven by
TPAlgoLQP.cpp:110-242).

The reference solves an integer quadratic program in DISPLACEMENT space:
variables = per-edge EAST/SOUTH displacements, equality constraints = loop
closure around every grid square (A X = 0), objective = sum R_e (X_e-D_e)^2,
bounds = default +- delay, SLSQP relaxation + three integer heuristics.
Our place_tiles_lqp solves the POSITION-space weighted LS — the identical
relaxation (X_e = p_v - p_u makes A X = 0 automatic) — and rounds.

LQP_HE.py is Python 2; it is loaded from the reference tree at test time
and mechanically translated (print statements -> pass, `<>` -> `!=`) so the
reference's own optimization/heuristic code runs, not a reimplementation.

The grids here are ADVERSARIAL: loop-inconsistent displacements and
unreliable edges, where LS-vs-IQP divergence would show (VERDICT r2 #5).
"""

import re
from pathlib import Path

import numpy as np
import pytest

from ipp_tpu.geometry.stacks import Displacement, TileGrid, TileStack
from ipp_tpu.stitch.place import place_tiles_lqp

LQP_SRC = Path("/root/reference/TeraStitcher/pyscripts/LQP_HE.py")

pytestmark = pytest.mark.skipif(not LQP_SRC.exists(),
                                reason="reference LQP_HE.py unavailable")


def _load_reference_lqp():
    """Load the reference solver functions from the (Python 2) source."""
    src = LQP_SRC.read_text()
    src = src.replace("<>", "!=")
    # Python-2 integer division at LQP_HE.py:480-481 (constraint row index)
    src = src.replace("sorted_inds[0]/(cols-1)", "sorted_inds[0]//(cols-1)")
    # print statements (diagnostics only) -> pass, preserving indentation
    src = re.sub(r"^(\s*)print\b.*$", r"\1pass", src, flags=re.MULTILINE)
    ns = {"__name__": "ref_lqp"}
    exec(compile(src, str(LQP_SRC), "exec"), ns)
    return ns


def _reference_positions(rows, cols, D, R, defaults, delay, ns):
    """Drive the reference pipeline for one axis: SLSQP + sol_to_integer +
    the TPAlgoLQP.cpp position accumulation (TPAlgoLQP.cpp:213-233).

    D/R/defaults are dicts over edges: ('E', r, c) covers (r,c)->(r,c+1)
    (j = r*(cols-1)+c), ('S', r, c) covers (r,c)->(r+1,c)
    (j = rows*(cols-1) + r*cols + c) — the TPAlgoLQP variable layout.
    """
    from scipy.optimize import minimize

    n_e = rows * (cols - 1)
    n_vars = n_e + (rows - 1) * cols
    n_constraints = (rows - 1) * (cols - 1)

    def j_of(edge):
        kind, r, c = edge
        return r * (cols - 1) + c if kind == "E" else n_e + r * cols + c

    Dv = np.zeros(n_vars)
    Rv = np.zeros(n_vars)
    dv = np.zeros(n_vars)
    for e in D:
        Dv[j_of(e)] = D[e]
        Rv[j_of(e)] = R[e]
        dv[j_of(e)] = defaults[e]

    # constraint matrix exactly as TPAlgoLQP.cpp:132-145 writes it
    A = np.zeros((n_constraints, n_vars), dtype=int)
    v_ind = n_e - 1
    for i in range(n_constraints):
        if i % (cols - 1) == 0:
            v_ind += 1
        A[i, i] = 1
        A[i, v_ind] = -1
        A[i, v_ind + 1] = 1
        A[i, i + (cols - 1)] = -1
        v_ind += 1

    bnds = [(dv[j] - delay, dv[j] + delay) for j in range(n_vars)]
    constr = {"type": "eq", "fun": lambda x: A.dot(x)}
    res = minimize(ns["objective_fun"], dv, args=(Dv, Rv), method="SLSQP",
                   jac=False, bounds=bnds, constraints=constr)
    ns["n_constraints"] = n_constraints  # module global sol_to_integer reads
    out = ns["sol_to_integer"](res.x, Dv, Rv, A, rows, cols)
    intS = np.asarray(out[6], dtype=int)
    assert np.all(A.dot(intS) == 0), "reference integer solution inconsistent"

    # position accumulation (TPAlgoLQP.cpp:216-231)
    pos = np.zeros((rows, cols), dtype=int)
    p = 0
    for r in range(rows - 1):
        for c in range(cols - 1):
            pos[r, c + 1] = pos[r, c] + intS[r * (cols - 1) + c]
        pos[r + 1, 0] = p + intS[n_e + r * cols]
        p = pos[r + 1, 0]
    for c in range(cols - 1):
        pos[rows - 1, c + 1] = pos[rows - 1, c] + intS[(rows - 1) * (cols - 1) + c]
    return pos


def _make_grid(rows, cols, D, R, defaults, delay):
    """TileGrid carrying the same problem: our NORTH/WEST displacements are
    the mirrored EAST/SOUTH edges (p[child] = p[parent] - displ)."""
    stacks = []
    for r in range(rows):
        row = []
        for c in range(cols):
            row.append(TileStack(row=r, col=c, dir_name=f"{r}_{c}",
                                 root_dir="/nonexistent",
                                 abs_h=c * 100, abs_v=r * 100, abs_d=0))
        stacks.append(row)
    grid = TileGrid(stacks, voxel_um=(1.0, 1.0, 1.0),
                    stacks_dir="/nonexistent")

    def disp(val, rel, dflt):
        # only axis 0 (V) is exercised; others mirror it so every axis of
        # the solver sees the same adversarial structure
        return Displacement(
            displ=(-val, -val, -val), default_displ=(-dflt, -dflt, -dflt),
            reliability=(rel, rel, rel), ncc_peak=(rel, rel, rel),
            ncc_width=(5, 5, 5), ncc_w_range_thr=(24, 24, 24),
            ncc_inv_width=(25, 25, 25), delay=(delay, delay, delay))

    for r in range(rows):
        for c in range(cols):
            if c + 1 < cols:
                e = ("E", r, c)
                stacks[r][c + 1].west = disp(D[e], R[e], defaults[e])
            if r + 1 < rows:
                e = ("S", r, c)
                stacks[r + 1][c].north = disp(D[e], R[e], defaults[e])
    return grid


def _cost(pos, D, R):
    """The reference's own selection metric (LQP_HE.py sol_cost:198-209)
    evaluated on a position grid: sum R_e (implied X_e - D_e)^2."""
    c = 0.0
    for (kind, r, cc), d in D.items():
        x = (pos[r, cc + 1] - pos[r, cc] if kind == "E"
             else pos[r + 1, cc] - pos[r, cc])
        c += R[(kind, r, cc)] * (x - d) ** 2
    return c


def _compare(rows, cols, D, R, defaults, delay):
    ns = _load_reference_lqp()
    ref = _reference_positions(rows, cols, D, R, defaults, delay, ns)
    grid = _make_grid(rows, cols, D, R, defaults, delay)
    place_tiles_lqp(grid)
    got = np.array([[grid.stacks[r][c].abs_v for c in range(cols)]
                    for r in range(rows)])
    ref = ref - ref.min()
    got = got - got.min()
    # our implied edge displacements must respect the reference's bounds
    for (kind, r, cc), dflt in defaults.items():
        x = (got[r, cc + 1] - got[r, cc] if kind == "E"
             else got[r + 1, cc] - got[r, cc])
        assert abs(x - dflt) <= delay, ((kind, r, cc), x, dflt, delay)
    # golden criterion: agree with the reference's integer heuristic to
    # <=1 px, OR be strictly no worse under the reference's OWN objective
    # (its three heuristics are approximations, not the optimum; on
    # loop-inconsistent grids ours finds lower-cost integer solutions)
    diff = int(np.abs(got - ref).max())
    c_ref = _cost(ref, D, R)
    c_got = _cost(got, D, R)
    assert diff <= 1 or c_got <= c_ref, (
        f"diff={diff}, cost ref={c_ref} got={c_got}\nref:\n{ref}\ngot:\n{got}")
    return diff, c_ref, c_got


def test_lqp_loop_inconsistent_grid():
    """3x3 grid with a deliberately inconsistent loop: around each square
    the measured displacements do not sum to zero, so the solver must
    spread the error by reliability."""
    rows = cols = 3
    delay = 10
    defaults = {}
    D = {}
    R = {}
    for r in range(rows):
        for c in range(cols - 1):
            defaults[("E", r, c)] = 100
    for r in range(rows - 1):
        for c in range(cols):
            defaults[("S", r, c)] = 100
    # consistent base 100 everywhere, then perturb to break loop closure
    for e in defaults:
        D[e] = 100
        R[e] = 0.9
    D[("E", 0, 0)] = 104   # top edge of square (0,0) off by +4
    R[("E", 0, 0)] = 0.3   # ...and less reliable than its loop partners
    D[("S", 1, 1)] = 97    # shared edge of squares (1,0) and (1,1)
    R[("S", 1, 1)] = 0.6
    _compare(rows, cols, D, R, defaults, delay)


def test_lqp_bounds_active():
    """A grid whose measured displacements exceed the delay bounds: both
    solvers must clamp — the integer solution's implied edge
    displacements stay within default +- delay (LQP_HE.py bnds)."""
    rows = cols = 3
    delay = 3
    defaults, D, R = {}, {}, {}
    for r in range(rows):
        for c in range(cols - 1):
            defaults[("E", r, c)] = 100
    for r in range(rows - 1):
        for c in range(cols):
            defaults[("S", r, c)] = 100
    for e in defaults:
        D[e] = 100
        R[e] = 0.9
    # reliable measurements OUTSIDE the bounds: the QP must clamp to +-3
    D[("E", 0, 0)] = 108
    D[("S", 0, 0)] = 92
    R[("E", 0, 0)] = 0.95
    R[("S", 0, 0)] = 0.95
    _compare(rows, cols, D, R, defaults, delay)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_lqp_random_adversarial_grids(seed):
    """Randomized sweep: loop-inconsistent displacements, mixed
    reliabilities, occasional unreliable resets and out-of-bound
    measurements — every draw must satisfy the golden criterion
    (<=1 px agreement or no worse under the reference's own cost)."""
    rng = np.random.default_rng(seed)
    rows = int(rng.integers(2, 5))
    cols = int(rng.integers(2, 5))
    delay = int(rng.integers(4, 12))
    defaults, D, R = {}, {}, {}
    for r in range(rows):
        for c in range(cols - 1):
            defaults[("E", r, c)] = 100
    for r in range(rows - 1):
        for c in range(cols):
            defaults[("S", r, c)] = 80
    for e in defaults:
        D[e] = defaults[e] + int(rng.integers(-delay - 2, delay + 3))
        R[e] = float(rng.uniform(0.2, 0.95))
        if rng.random() < 0.2:  # unreliable: step-4 reset semantics
            D[e] = defaults[e]
            R[e] = 0.0
    _compare(rows, cols, D, R, defaults, delay)


def test_integer_refine_repairs_bound_violating_start():
    """rint of a bound-clamped continuous solution can land 1 px outside
    the window; the refine stage must repair it, not freeze on it."""
    from ipp_tpu.stitch.place import _integer_refine

    # one edge 0->1, default 100, delay 2, start violating at x = 103
    pos = np.array([0, 103], np.int64)
    us = np.array([0])
    vs = np.array([1])
    ds = np.array([105.0])      # measurement pulls OUTWARD
    ws = np.array([0.9])
    dflt = np.array([100.0])
    delays = np.array([2.0])
    out = _integer_refine(pos, us, vs, ds, ws, dflt, delays)
    x = out[1] - out[0]
    assert abs(x - 100.0) <= 2.0, x  # back inside the bound window
    assert x == 102, x  # at the bound nearest the measurement


def test_lqp_unreliable_edges_grid():
    """4x3 grid where several edges are UNRELIABLE (R=0, displ reset to the
    default as step 4 does) and the reliable ones disagree: the integer
    heuristic must still produce loop-consistent positions near ours."""
    rows, cols = 4, 3
    delay = 8
    defaults, D, R = {}, {}, {}
    for r in range(rows):
        for c in range(cols - 1):
            defaults[("E", r, c)] = 120
    for r in range(rows - 1):
        for c in range(cols):
            defaults[("S", r, c)] = 80
    rng = np.random.default_rng(3)
    for e in defaults:
        D[e] = defaults[e] + int(rng.integers(-4, 5))
        R[e] = float(rng.uniform(0.5, 0.95))
    # unreliable edges: reset to defaults with zero reliability (the step-4
    # thresholdDisplacements semantics, StackStitcher.cpp:1619-1720)
    for e in [("E", 1, 0), ("S", 0, 2), ("S", 2, 1)]:
        D[e] = defaults[e]
        R[e] = 0.0
    _compare(rows, cols, D, R, defaults, delay)
