"""Reproducible kernel sweep: every RDF strategy + Pallas + ACF/MSD.

Regenerates the numbers in ``docs/design.md`` on the current accelerator.
Writes ``benchmarks/kernel_sweep_results.json``.

Run: python benchmarks/kernel_sweep.py [--quick]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _time(fn, fetch, repeats):
    fetch(fn())  # compile + execute + fetch
    t0 = time.perf_counter()
    out = None
    for _ in range(repeats):
        out = fn()
    import jax

    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def sweep_rdf(n_atoms, n_frames, n_bins, strategies, repeats=5):
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.pallas_rdf import rdf_histogram_pallas
    from lammps_analysis_tpu.ops.rdf import build_species_layout, rdf_histogram

    rng = np.random.default_rng(0)
    box, cutoff = 40.0, 19.9
    half = n_atoms // 2
    sid, n_pad, ptab, n_pairs, _ = build_species_layout(
        [half, n_atoms - half], pad_to=128
    )
    pos = jnp.asarray(
        rng.uniform(0, box, size=(n_frames, n_pad, 3)).astype(np.float32)
    )
    sid_j, ptab_j = jnp.asarray(sid), jnp.asarray(ptab)
    box_j = jnp.asarray(np.array([box] * 3, np.float32))
    pairs = n_frames * n_atoms * (n_atoms - 1) / 2
    out = {}
    for strategy in strategies:
        dt = _time(
            lambda: rdf_histogram(
                pos, sid_j, ptab_j, box_j, cutoff, n_bins, n_pairs,
                i_block=256, strategy=strategy,
            ),
            np.asarray,
            repeats,
        )
        out[f"xla_{strategy}_gpairs_per_s"] = round(pairs / dt / 1e9, 3)
    import jax

    if jax.default_backend() == "tpu":
        dt = _time(
            lambda: rdf_histogram_pallas(
                pos, sid_j, cutoff, n_bins, 2, (box,) * 3
            ),
            np.asarray,
            repeats,
        )
        out["pallas_gpairs_per_s"] = round(pairs / dt / 1e9, 3)
    return out


def sweep_adf(n_atoms, n_frames, n_bins, repeats=3):
    """XLA neighbor-list ADF vs the fused Pallas pipeline at 10k atoms.

    Both paths run at EXACT f32 numerics (the gram einsums force
    Precision.HIGHEST — at TPU default precision the angle stage is ~2x
    faster but bins ~2/3 of the weighted counts into wrong bins, measured
    vs an f64 oracle). The stage split shows where time goes: the exact
    top_k over all N dominates and is insensitive to k (hierarchical and
    approx_max_k variants measured within 10-20%).
    """
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops import adf as A
    from lammps_analysis_tpu.ops.pallas_adf import (
        adf_histogram_pallas,
        adf_neighbor_lists,
        adf_pairs_histogram_pallas,
        pallas_neighbor_lists,
    )

    rng = np.random.default_rng(2)
    box, cutoff = 40.0, 5.5  # ~110 neighbors: inside the K=128 pallas list
    half = n_atoms // 2
    sid = np.concatenate(
        [np.zeros(half, np.int32), np.ones(n_atoms - half, np.int32)]
    )
    pos = jnp.asarray(
        rng.uniform(0, box, size=(n_frames, n_atoms, 3)).astype(np.float32)
    )
    sid_j = jnp.asarray(sid)
    ttab, order = A.build_triple_table(2)
    box_j = jnp.asarray(np.array([box] * 3, np.float32))
    out = {}
    dt = _time(
        lambda: A.adf_histogram_neighbors(
            pos, sid_j, jnp.asarray(ttab), box_j, cutoff, n_bins,
            len(order), norm_power=4, max_neighbors=128,
        )[0],
        np.asarray,
        repeats,
    )
    out["xla_neighbor_s_per_frame"] = round(dt / n_frames, 4)
    if jax.default_backend() == "tpu":
        dt_p = _time(
            lambda: adf_histogram_pallas(
                pos, sid_j, box_j, cutoff, n_bins, 2, norm_power=4
            )[0],
            np.asarray,
            repeats,
        )
        out["pallas_s_per_frame"] = round(dt_p / n_frames, 4)
        out["pallas_speedup_vs_xla"] = round(dt / dt_p, 2)
        # realistic first-shell cutoff: the center-packed angle stage
        # engages (p centers per 128-lane row)
        cut_shell = 3.6
        dt_shell = _time(
            lambda: adf_histogram_pallas(
                pos, sid_j, box_j, cut_shell, n_bins, 2, norm_power=4
            )[0],
            np.asarray,
            repeats,
        )
        dt_shell_xla = _time(
            lambda: A.adf_histogram_neighbors(
                pos, sid_j, jnp.asarray(ttab), box_j, cut_shell, n_bins,
                len(order), norm_power=4, max_neighbors=128,
            )[0],
            np.asarray,
            repeats,
        )
        out["pallas_firstshell_s_per_frame"] = round(dt_shell / n_frames, 4)
        out["xla_firstshell_s_per_frame"] = round(dt_shell_xla / n_frames, 4)
        out["firstshell_speedup_vs_xla"] = round(dt_shell_xla / dt_shell, 2)
        # stage split: Pallas set-compaction stage 1 vs the old top_k,
        # then the packed angle histogram
        dt_s1 = _time(
            lambda: pallas_neighbor_lists(pos, sid_j, box_j, cutoff, k_n=128),
            lambda o: np.asarray(o[4]),
            repeats,
        )
        dt_s1_topk = _time(
            lambda: adf_neighbor_lists(pos, sid_j, box_j, cutoff, k_n=128),
            lambda o: np.asarray(o[4]),
            repeats,
        )
        lists = pallas_neighbor_lists(pos, sid_j, box_j, cutoff, k_n=128)
        dt_s2 = _time(
            lambda: adf_pairs_histogram_pallas(
                *lists[:4], n_bins, 2, norm_power=4
            ),
            np.asarray,
            repeats,
        )
        out["stage1_pallas_s_per_frame"] = round(dt_s1 / n_frames, 4)
        out["stage1_topk_s_per_frame"] = round(dt_s1_topk / n_frames, 4)
        out["stage2_pallas_s_per_frame"] = round(dt_s2 / n_frames, 4)
    return out


def sweep_correlations(repeats=3):
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.correlation import windowed_acf_sum
    from lammps_analysis_tpu.ops.msd import windowed_msd_sum

    rng = np.random.default_rng(1)
    t, n, w, s = 16384, 256, 512, 256
    x = jnp.asarray(rng.normal(size=(t, n, 3)).astype(np.float32))
    n_windows = (t - w) // s + 1
    frames = n_windows * w * n
    dt = _time(
        lambda: windowed_acf_sum(x, w, s, chunk=16),
        lambda o: np.asarray(o[0]),
        repeats,
    )
    out = {"acf_corr_frames_per_s": round(frames / dt)}
    tau = jnp.arange(w)
    dt = _time(
        lambda: windowed_msd_sum(x, tau, w, s, chunk=16),
        lambda o: np.asarray(o[0]),
        repeats,
    )
    out["msd_window_frames_per_s"] = round(frames / dt)
    return out


def main():
    quick = "--quick" in sys.argv
    import jax

    results = {"backend": jax.default_backend()}
    strategies = ("outer",) if quick else ("outer", "compare")
    results["rdf_2048_300bins"] = sweep_rdf(2048, 8, 300, strategies)
    if not quick:
        results["rdf_10240_500bins"] = sweep_rdf(10240, 4, 500, ("outer",))
        results["adf_10240_500bins"] = sweep_adf(10240, 2, 500)
    results["correlations"] = sweep_correlations()
    path = pathlib.Path(__file__).parent / "kernel_sweep_results.json"
    path.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
