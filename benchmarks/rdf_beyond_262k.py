"""Large-N RDF through the production route, up to the ADF-verified max.

The README's large-N RDF rows (131k/262k) came from an E9 ad-hoc session;
this script makes the measurement reproducible AND extends it to 393216
and 524288 atoms — the sizes the ADF windowed route was hardware-verified
at in r5 — so both flagship kernels have scaling rows at the same max N.

The RDF kernel is O(N^2) masked tiles (no cells by design: the reference
is O(N^2) minibatched too, `/root/reference/mdsuite/calculators/
radial_distribution_function.py:617-689`, and cell lists lose to the
masked kernel below ~32k while pair THROUGHPUT at fixed N^2 work is the
honest metric above it). Density is held at the 65k row's 0.128 /A^3 by
scaling the box with N^(1/3).

Run on the TPU: ``python benchmarks/rdf_beyond_262k.py``
Appends results under ``rdf_large_n`` in ``large_n_scaling.json``.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# (n_atoms, frames_per_call): call heights shrink as N^2 work grows so
# every timed call stays in the tall-call regime (>1e10 pairs/call)
# without exceeding ~15 s/call.
SIZES = [(131072, 4), (262144, 2), (393216, 1), (524288, 1),
         (786432, 1), (1048576, 1)]
DENSITY = 65536 / 80.0**3


def _steady(fn, repeats):
    import jax

    t0 = time.perf_counter()
    np.asarray(fn())  # warmup: compile + execute + fetch
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(repeats):
        out = fn()
    jax.block_until_ready(out)
    np.asarray(out)
    return (time.perf_counter() - t0) / repeats, warm_s


def main():
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.rdf import build_species_layout
    from lammps_analysis_tpu.parallel.sharded_ops import sharded_rdf_histogram

    # epoch probe (CLAUDE.md discipline: numbers are only meaningful with
    # the tunnel health recorded alongside); backend init + first-call
    # compile are drained first so the probe measures the tunnel, not
    # process startup
    jax.devices()
    x = jnp.ones((512, 512), jnp.float32)
    np.asarray(x @ x)
    t0 = time.perf_counter()
    np.asarray(x @ x)
    probe_s = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    rows = []
    for n_atoms, f in SIZES:
        box = float((n_atoms / DENSITY) ** (1.0 / 3.0))
        half = n_atoms // 2
        sid, n_pad, ptab, n_pairs, _ = build_species_layout(
            [half, n_atoms - half], pad_to=128
        )
        pos = jnp.asarray(
            rng.uniform(0, box, size=(f, n_pad, 3)).astype(np.float32)
        )
        sid_j, ptab_j = jnp.asarray(sid), jnp.asarray(ptab)
        box_j = jnp.asarray(np.array([box] * 3, np.float32))
        dt, warm_s = _steady(
            lambda: sharded_rdf_histogram(
                pos, sid_j, ptab_j, box_j,
                cutoff=round(box / 2 - 0.1, 1), n_bins=500,
                n_pairs=n_pairs, i_block=128,
            ),
            repeats=3 if f > 1 else 2,
        )
        pairs = f * n_atoms * (n_atoms - 1) / 2
        row = {
            "n_atoms": n_atoms,
            "frames_per_call": f,
            "gpairs_per_s": round(pairs / dt / 1e9, 2),
            "s_per_frame": round(dt / f, 3),
            "warmup_s": round(warm_s, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    path = pathlib.Path(__file__).parent / "large_n_scaling.json"
    doc = json.loads(path.read_text())
    doc["rdf_large_n"] = {
        "probe_s_epoch": round(probe_s, 2),
        "measured": time.strftime("%Y-%m-%d %H:%M"),
        "density_per_A3": round(DENSITY, 4),
        "rows": rows,
        "note": (
            "production route (parallel.sharded_ops), O(N^2) masked Pallas "
            "tiles, 500 bins, cutoff ~box/2; box scaled to hold the 65k "
            "row's density. 393216/524288 match the ADF windowed route's "
            "hardware-verified maximum (adf_beyond_cap); 786432/1048576 "
            "verify the raised PALLAS_RDF_SINGLE_FRAME_N_MAX envelope "
            "(one frame's VMEM rows are 33.5 MB at 1M — the >320k XLA "
            "fallback crash found by this script is unreachable below it)."
        ),
    }
    path.write_text(json.dumps(doc, indent=1))
    print("backend:", jax.devices()[0].device_kind, "probe_s:", round(probe_s, 2))


if __name__ == "__main__":
    main()
