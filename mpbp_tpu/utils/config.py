"""Config system — dataclasses + CLI binding.

Replaces the reference's hard-coded constants and feature booleans
(reference solve.py:290-297, apply.py:9-13) with structured, serializable
configuration (SURVEY.md section 5.6).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any


@dataclasses.dataclass
class ProblemConfig:
    """Physical + discretization parameters (reference solve.py:17-28)."""

    n: int = 16
    c: float = 1.0
    d: float = -1.0
    xi: float = 1.0
    eta_n: float = 100.0
    eta_s: float = 1.0
    problem: str = "variable"      # "variable" | "constant" theta_n MMS


@dataclasses.dataclass
class SolverConfig:
    """Krylov + preconditioner settings (reference solve.py:240-286)."""

    pc: str = "lsc_ilut"
    tol: float = 1e-8
    maxiter: int = 150
    ilut_fill: int = 400
    ilut_tau: float = 3e-5
    ilut_refine: int = 0
    inner_tol: float = 1e-4
    inner_iters: int = 60
    dtype: str = "float64"
    precision: str = "full"        # full | ir | hybrid (drivers.solve_multiphase)
    fused_pallas: bool = False     # Pallas F-apply in the PC inner solves
                                   # (TPU backends; drivers.lsc_inners)


@dataclasses.dataclass
class MeshConfig:
    """Device-mesh layout for the sharded paths (SURVEY.md section 2.4)."""

    n_devices: int = 0             # 0 = all available
    axis: str = "x"


def add_dataclass_args(parser: argparse.ArgumentParser, dc, prefix: str = ""):
    for f in dataclasses.fields(dc):
        t = f.type if isinstance(f.type, type) else type(f.default)
        parser.add_argument(f"--{prefix}{f.name.replace('_', '-')}",
                            type=t, default=f.default)


def dataclass_from_args(cls, args: argparse.Namespace, prefix: str = ""):
    kw = {}
    for f in dataclasses.fields(cls):
        kw[f.name] = getattr(args, f"{prefix}{f.name}")
    return cls(**kw)


def to_json(*configs) -> str:
    out: dict[str, Any] = {}
    for c in configs:
        out[type(c).__name__] = dataclasses.asdict(c)
    return json.dumps(out, indent=2)


def from_json(s: str) -> tuple:
    data = json.loads(s)
    mapping = {"ProblemConfig": ProblemConfig, "SolverConfig": SolverConfig,
               "MeshConfig": MeshConfig}
    return tuple(mapping[k](**v) for k, v in data.items() if k in mapping)
