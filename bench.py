"""Headline benchmark: RDF atom-pairs/s on the available accelerator.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

``vs_baseline`` compares against the reference's TF kernel measured on CPU
(``benchmarks/tf_reference_baseline.py``; the reference publishes no numbers
— BASELINE.md): value / tf_cpu_value on the identical synthetic workload
(2048 atoms, 8 frames, 300 bins, minimum-image cutoff histogram).
"""

from __future__ import annotations

import json
import pathlib
import time

import numpy as np

REPO = pathlib.Path(__file__).parent
WORKLOAD = dict(n_atoms=2048, n_frames=8, n_bins=300)


def measure_rdf_pairs_per_s(n_atoms, n_frames, n_bins, repeats=5):
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.rdf import build_species_layout
    from lammps_analysis_tpu.parallel.sharded_ops import sharded_rdf_histogram

    rng = np.random.default_rng(0)
    box = 20.0
    cutoff = 9.9
    half = n_atoms // 2
    sid, n_pad, ptab, n_pairs, _ = build_species_layout([half, n_atoms - half],
                                                        pad_to=128)
    pos = rng.uniform(0, box, size=(n_frames, n_pad, 3)).astype(np.float32)

    pos_j = jnp.asarray(pos)
    sid_j = jnp.asarray(sid)
    ptab_j = jnp.asarray(ptab)
    box_j = jnp.asarray(np.array([box] * 3, dtype=np.float32))

    def run():
        h = sharded_rdf_histogram(
            pos_j, sid_j, ptab_j, box_j,
            cutoff=cutoff, n_bins=n_bins, n_pairs=n_pairs, i_block=128,
        )
        return h

    np.asarray(run())  # compile + execute + fetch
    t0 = time.perf_counter()
    h = None
    for _ in range(repeats):
        h = run()
    jax.block_until_ready(h)
    elapsed = (time.perf_counter() - t0) / repeats
    pairs = n_frames * n_atoms * (n_atoms - 1) / 2
    return pairs / elapsed


def tf_baseline_value():
    path = REPO / "benchmarks" / "tf_baseline.json"
    if path.exists():
        return json.loads(path.read_text())["value"]
    return None


def main():
    value = measure_rdf_pairs_per_s(**WORKLOAD)
    baseline = tf_baseline_value()
    vs = value / baseline if baseline else None
    print(
        json.dumps(
            {
                "metric": "rdf_atom_pairs_per_s",
                "value": value,
                "unit": "pairs/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
