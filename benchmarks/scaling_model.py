"""Weak-scaling model for the sharded FGMRES iteration (no pod required).

BASELINE.json asks for ">=80% weak-scaling efficiency on 2+ hosts"; this
environment has one chip, so the multi-chip story is validated functionally
(SHARDED_r03/MULTIHOST_r03: iteration-count invariance across 1-8 devices
and 2 processes) and projected here from measured single-chip numbers plus
v5e interconnect specs — the "How to Scale Your Model" counting method:
compute time from measured HBM-bound kernel throughput, communication time
from bytes-on-the-wire over ICI/DCN bandwidth, overlap where the program
overlaps them.

Per FGMRES iteration on a P-device row-sharded mesh (n x n grid, 5 fields):
  * fused matvec: 13 * (n^2/P) * 4 B of HBM traffic per device (measured
    682-815 Gnnz/s => 633-755 GB/s effective single-chip), plus a halo
    exchange of 2 rows * 5 fields * n * 4 B to ring neighbors over ICI —
    overlappable with interior compute (parallel/halo.py does; the
    shard_map Pallas path issues it before the kernel).
  * CGS2 Arnoldi: two all-reduces of (j+2) scalars (latency-bound) over the
    mesh; cgs1 halves that. All-reduce latency ~1-5 us intra-slice (ICI),
    ~30-100 us cross-host (DCN) per hop-stage.

Efficiency(P) = T(1) / T_per_device(P) with the iteration count held fixed
(measured invariant). Prints one JSON line per (n, P) config.
"""

from __future__ import annotations

import json

# Measured single-chip constants (BENCH_r03 / KERNELS_r03, v5e)
HBM_GBPS_EFF = 672e9          # effective fused-apply bandwidth (82% peak)
PLANES = 13                   # fused apply planes in+out
FIELDS = 5
BYTES = 4

# v5e interconnect (public specs)
ICI_GBPS = 186e9              # per-link, ~3 links usable per chip
ICI_LAT = 2e-6                # per neighbor message
DCN_GBPS = 25e9               # per host NIC (conservative)
DCN_LAT = 50e-6

# Arnoldi reduction model: CGS2 = 2 all-reduces/iter of ~m scalars
REDUCTIONS = {"cgs2": 2, "cgs1": 1}
M_SCALARS = 64                # Krylov dim scale for the reduction payload


def model(n: int, P: int, hosts: int = 1, orthog: str = "cgs2"):
    rows_local = n // P
    t_matvec = PLANES * rows_local * n * BYTES / HBM_GBPS_EFF
    halo_bytes = 2 * FIELDS * n * BYTES
    t_halo = halo_bytes / ICI_GBPS + 2 * ICI_LAT
    # halo overlaps interior compute; only the non-overlapped remainder bills
    t_halo_eff = max(0.0, t_halo - t_matvec * (2.0 / max(rows_local, 1)))
    nred = REDUCTIONS[orthog]
    lat = DCN_LAT if hosts > 1 else ICI_LAT
    bw = DCN_GBPS if hosts > 1 else ICI_GBPS
    import math
    t_red = nred * (math.ceil(math.log2(max(P, 2))) * lat
                    + M_SCALARS * BYTES / bw)
    # projection GEMVs stream the local Krylov basis: 2 passes of m vectors
    t_proj = 2 * M_SCALARS / 8 * rows_local * n * FIELDS * BYTES / HBM_GBPS_EFF
    return t_matvec + t_halo_eff + t_red + t_proj


def main():
    import math

    for hosts, orthog in ((1, "cgs2"), (2, "cgs1"), (4, "cgs1")):
        for n in (512, 1024, 2048):
            # weak scaling: the grid grows with sqrt(P) so the per-device
            # work (rows x n) stays constant; efficiency = T(1)/T(P)
            rows = []
            for P in (1, 4, 16, 64):
                nn = int(n * math.sqrt(P))
                rows.append((P, nn, model(nn, P, hosts, orthog)))
            t1 = rows[0][2]
            for P, nn, tP in rows:
                print(json.dumps({
                    "metric": "weak_scaling_model",
                    "hosts": hosts, "orthog": orthog,
                    "n_base": n, "n_global": nn, "devices": P,
                    "iter_time_us": round(tP * 1e6, 2),
                    "efficiency": round(t1 / tP, 3)}))


if __name__ == "__main__":
    main()
