"""Sweep the RDF kernel's (hi, lo) one-hot split on hardware.

The VPU one-hot build costs ``hi_pad + k_lo`` compare rows per pair
(minimised near ``k_lo = sqrt(total_bins)``), but the MXU contraction
``(hi_pad, T) x (k_lo, T)`` may pad the lo axis to the systolic array's
128 lanes — in which case MXU time scales with ``hi_pad`` alone and the
current near-square default (k=64, hi=24 at 2 species x 500 bins) trades
VPU for MXU in an unmeasured way. This sweeps k_lo and reports Gpairs/s
per choice; histograms must be exactly equal across splits (the split is
an encoding detail).

Run on TPU (idle host!): python benchmarks/rdf_split_sweep.py
Writes benchmarks/rdf_split_sweep.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_ATOMS = 10240
N_FRAMES = 64
N_BINS = 500
SPLITS = [None, 24, 32, 40, 48, 64, 96, 128]


def main():
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.pallas_rdf import rdf_histogram_pallas
    from lammps_analysis_tpu.ops.rdf import build_species_layout

    out = {
        "n_atoms": N_ATOMS,
        "n_frames": N_FRAMES,
        "n_bins": N_BINS,
        "backend": jax.default_backend(),
    }
    a = jnp.ones((512, 512))
    np.asarray(a @ a)
    t0 = time.perf_counter()
    np.asarray((a + 1.0) @ a)
    out["probe_s"] = round(time.perf_counter() - t0, 2)

    rng = np.random.default_rng(0)
    box = 40.0
    cutoff = 19.9
    half = N_ATOMS // 2
    sid, n_pad, _, _, _ = build_species_layout(
        [half, N_ATOMS - half], pad_to=128
    )
    pos = jnp.asarray(
        rng.uniform(0, box, (N_FRAMES, n_pad, 3)).astype(np.float32)
    )
    sid_j = jnp.asarray(sid)
    box_j = jnp.asarray(np.array([box] * 3, np.float32))
    pairs = N_FRAMES * N_ATOMS * (N_ATOMS - 1) / 2

    ref = None
    for k_lo in SPLITS:
        def run():
            return rdf_histogram_pallas(
                pos, sid_j, cutoff, N_BINS, 2, box_j, k_lo=k_lo
            )

        h = np.asarray(run())  # compile + execute + fetch
        if ref is None:
            ref = h
        else:
            exact = np.array_equal(ref, h)
            out.setdefault("exact_match", {})[str(k_lo)] = bool(exact)
        t0 = time.perf_counter()
        r = None
        for _ in range(3):
            r = run()
        jax.block_until_ready(r)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / 3
        key = "default" if k_lo is None else str(k_lo)
        out.setdefault("gpairs_per_s", {})[key] = round(pairs / dt / 1e9, 2)
        print(key, out["gpairs_per_s"][key], flush=True)

    path = REPO / "benchmarks" / "rdf_split_sweep.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
