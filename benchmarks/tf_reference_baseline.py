"""Measure the reference's TF kernel throughput on CPU (baseline anchor).

The reference (MDSuite) publishes no benchmark numbers (BASELINE.md), and
its Green-Kubo path needs tensorflow_probability which is not in this image,
so the comparison baseline is measured directly: this script re-creates the
reference RDF hot loop — gather pair indices, subtract, minimum image, norm,
``tf.histogram_fixed_width`` (``radial_distribution_function.py:617-689``)
— as TF graph ops on CPU and times it on the same synthetic workload
``bench.py`` uses. Result is cached to ``benchmarks/tf_baseline.json``.
"""

import itertools
import json
import pathlib
import time

import numpy as np


def measure(n_atoms=2048, n_frames=8, n_bins=300, repeats=3):
    import tensorflow as tf

    rng = np.random.default_rng(0)
    box = np.float32(20.0)
    cutoff = np.float32(9.9)
    pos = rng.uniform(0, box, size=(n_frames, n_atoms, 3)).astype(np.float32)

    iu = np.triu_indices(n_atoms, k=1)
    idx_i = tf.constant(iu[0])
    idx_j = tf.constant(iu[1])
    box_t = tf.constant([box, box, box])

    @tf.function
    def frame_hist(p):
        r_i = tf.gather(p, idx_i, axis=0)
        r_j = tf.gather(p, idx_j, axis=0)
        r_ij = r_i - r_j
        r_ij -= tf.math.rint(r_ij / box_t) * box_t
        d = tf.norm(r_ij, axis=-1)
        d = tf.boolean_mask(d, d < cutoff)
        return tf.histogram_fixed_width(d, [0.0, cutoff], nbins=n_bins)

    # warmup/trace
    _ = frame_hist(tf.constant(pos[0]))
    t0 = time.perf_counter()
    for _ in range(repeats):
        total = None
        for f in range(n_frames):
            h = frame_hist(tf.constant(pos[f]))
            total = h if total is None else total + h
        _ = total.numpy()
    elapsed = (time.perf_counter() - t0) / repeats
    pairs = n_frames * n_atoms * (n_atoms - 1) / 2
    return pairs / elapsed


if __name__ == "__main__":
    pps = measure()
    out = {
        "metric": "rdf_atom_pairs_per_s",
        "value": pps,
        "unit": "pairs/s",
        "hardware": "CPU (TF graph, reference-equivalent kernel)",
    }
    path = pathlib.Path(__file__).parent / "tf_baseline.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
