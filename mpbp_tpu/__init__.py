"""mpbp_tpu: TPU-native sparse linear-algebra framework for multiphase Stokes
block preconditioning (capabilities of abarret/mp-block-preconditioners,
re-designed for JAX/XLA/Pallas/pjit)."""

__version__ = "0.1.0"
