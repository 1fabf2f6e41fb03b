"""CSV export of assembled block matrices (reference utils.py:28-40 parity,
without the pandas dependency): dumps dense L/D/XI/G for offline inspection."""

from __future__ import annotations

import numpy as np


def write_matrix_csv(path: str, mat: np.ndarray) -> None:
    np.savetxt(path, np.asarray(mat), delimiter=",", fmt="%.17g")


def write_blocks_to_csv(op, directory: str = ".", phase: str = "n") -> list:
    """Dump one phase's L, D, XI, G as {L,D,XI,G}_matrix.csv
    (reference file names, utils.py:31-40). Small grids only (dense)."""
    import os

    from mpbp_tpu.models.fields import MACGrid
    from mpbp_tpu.models.multiphase import (divergence_operator, drag_diagonal,
                                            gradient_operator,
                                            laplacian_operator)

    ph = op.phase_n if phase == "n" else op.phase_s
    grid = op.grid
    xi = op.params["xi"]
    blocks = {
        "L": laplacian_operator(ph, grid),
        "D": divergence_operator(ph, grid),
        "XI": drag_diagonal(ph, xi, grid),
        "G": gradient_operator(ph, grid),
    }
    paths = []
    for name, st in blocks.items():
        p = os.path.join(directory, f"{name}_matrix.csv")
        write_matrix_csv(p, st.to_dense())
        paths.append(p)
    return paths
