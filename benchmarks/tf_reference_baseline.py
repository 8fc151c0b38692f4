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


def measure_msd(n_atoms=10240, n_frames=2048, window=512, stride=256,
                repeats=2):
    """Reference windowed-MSD rate (``einstein_diffusion_coefficients.py:
    168-190``): per sliding window, squared difference from the window
    origin summed over particles and dims, as TF graph ops on CPU.
    Returns window-frame * atom updates per second."""
    import tensorflow as tf

    rng = np.random.default_rng(1)
    x = np.cumsum(
        rng.normal(size=(n_frames, n_atoms, 3)).astype(np.float32), axis=0
    )
    x_t = tf.constant(x)

    @tf.function
    def window_msd(s0):
        seg = x_t[s0 : s0 + window]
        return tf.reduce_sum(
            tf.math.squared_difference(seg, seg[0:1]), axis=[1, 2]
        )

    starts = list(range(0, n_frames - window + 1, stride))
    _ = window_msd(tf.constant(0))
    t0 = time.perf_counter()
    for _ in range(repeats):
        total = None
        for s0 in starts:
            m = window_msd(tf.constant(s0))
            total = m if total is None else total + m
        _ = total.numpy()
    elapsed = (time.perf_counter() - t0) / repeats
    return len(starts) * window * n_atoms / elapsed


def measure_vacf(n_atoms=10240, n_frames=2048, window=512, stride=256,
                 repeats=2):
    """Reference windowed-VACF rate: the biased autocorrelation the
    reference computes with tfp.stats.auto_correlation (not in this
    image) re-created with its FFT formulation as TF graph ops on CPU.
    Returns window-frame * atom updates per second."""
    import tensorflow as tf

    rng = np.random.default_rng(2)
    v = rng.normal(size=(n_frames, n_atoms, 3)).astype(np.float32)
    v_t = tf.constant(np.transpose(v, (1, 2, 0)))  # (N, 3, T)
    fft_len = 2 * window

    @tf.function
    def window_vacf(s0):
        seg = v_t[:, :, s0 : s0 + window]
        f = tf.signal.rfft(seg, fft_length=[fft_len])
        acf = tf.signal.irfft(f * tf.math.conj(f), fft_length=[fft_len])
        return tf.reduce_sum(acf[:, :, :window], axis=[0, 1]) / window

    starts = list(range(0, n_frames - window + 1, stride))
    _ = window_vacf(tf.constant(0))
    t0 = time.perf_counter()
    for _ in range(repeats):
        total = None
        for s0 in starts:
            a = window_vacf(tf.constant(s0))
            total = a if total is None else total + a
        _ = total.numpy()
    elapsed = (time.perf_counter() - t0) / repeats
    return len(starts) * window * n_atoms / elapsed


if __name__ == "__main__":
    pps = measure()
    msd = measure_msd()
    vacf = measure_vacf()
    out = {
        "metric": "rdf_atom_pairs_per_s",
        "value": pps,
        "unit": "pairs/s",
        "hardware": "CPU (TF graph, reference-equivalent kernel)",
        "msd_window_frame_atoms_per_s": msd,
        "vacf_window_frame_atoms_per_s": vacf,
    }
    path = pathlib.Path(__file__).parent / "tf_baseline.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))
