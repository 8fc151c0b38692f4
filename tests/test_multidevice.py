"""Multi-device agreement: 1-device and 8-device meshes must give identical
results (SURVEY §4: the TPU analog of the reference's batched-vs-full
equivalence testing). Runs on the virtual 8-CPU-device mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_analysis_tpu.ops import adf as adf_ops
from lammps_analysis_tpu.ops import rdf as rdf_ops
from lammps_analysis_tpu.parallel import (
    make_data_mesh,
    sharded_adf_histogram,
    sharded_rdf_histogram,
    sharded_windowed_msd,
    use_mesh,
)


@pytest.fixture()
def system(rng):
    counts = [24, 16]
    box = np.array([5.0, 5.0, 5.0], np.float64)
    sid, n_pad, ptab, n_pairs, _ = rdf_ops.build_species_layout(counts, pad_to=8)
    pos = np.zeros((16, n_pad, 3))
    pos[:, : sum(counts)] = rng.uniform(0, 5, size=(16, sum(counts), 3))
    return sid, n_pad, ptab, n_pairs, pos, box


def test_rdf_1_vs_8_devices(system):
    sid, n_pad, ptab, n_pairs, pos, box = system
    results = {}
    for n_dev in (1, 8):
        with use_mesh(make_data_mesh(n_dev)):
            h = sharded_rdf_histogram(
                jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
                jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
                i_block=8,
            )
        results[n_dev] = np.asarray(h)
    np.testing.assert_array_equal(results[1], results[8])


def test_rdf_remainder_frames(system):
    """Frame count not divisible by device count: tail must be exact."""
    sid, n_pad, ptab, n_pairs, pos, box = system
    pos = pos[:13]  # 13 frames over 8 devices -> main 8 + tail 5
    results = {}
    for n_dev in (1, 8):
        with use_mesh(make_data_mesh(n_dev)):
            h = sharded_rdf_histogram(
                jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
                jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
                i_block=8,
            )
        results[n_dev] = np.asarray(h)
    np.testing.assert_array_equal(results[1], results[8])


def test_adf_1_vs_8_devices(system):
    sid, n_pad, ptab, n_pairs, pos, box = system
    ttab, order = adf_ops.build_triple_table(2)
    results = {}
    for n_dev in (1, 8):
        with use_mesh(make_data_mesh(n_dev)):
            h = sharded_adf_histogram(
                jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
                jnp.asarray(box), cutoff=2.0, n_bins=36,
                n_triples=len(order), c_block=8,
            )
        results[n_dev] = np.asarray(h)
    np.testing.assert_allclose(results[1], results[8], rtol=1e-6)


def test_msd_1_vs_8_devices(rng):
    pos = np.cumsum(rng.normal(size=(60, 24, 3)), axis=0)
    tau = jnp.arange(16)
    results = {}
    for n_dev in (1, 8):
        with use_mesh(make_data_mesh(n_dev)):
            s, nw = sharded_windowed_msd(
                jnp.asarray(pos), tau, window=16, stride=8
            )
        results[n_dev] = np.asarray(s)
    np.testing.assert_allclose(results[1], results[8], rtol=1e-12)


def test_msd_remainder_particles(rng):
    """Particle count not divisible by device count."""
    pos = np.cumsum(rng.normal(size=(40, 13, 3)), axis=0)
    tau = jnp.arange(8)
    results = {}
    for n_dev in (1, 8):
        with use_mesh(make_data_mesh(n_dev)):
            s, _ = sharded_windowed_msd(
                jnp.asarray(pos), tau, window=8, stride=8
            )
        results[n_dev] = np.asarray(s)
    np.testing.assert_allclose(results[1], results[8], rtol=1e-12)


def test_graft_entry_multichip():
    """The driver's dryrun contract must keep passing."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_rdf_2d_mesh_matches_1d(system):
    """(data, atoms) 2-D mesh RDF == single-device counts exactly."""
    from lammps_analysis_tpu.parallel.mesh import make_2d_mesh
    from lammps_analysis_tpu.parallel.sharded_ops import (
        sharded_rdf_histogram_2d,
    )

    sid, n_pad, ptab, n_pairs, pos, box = system
    ref = np.asarray(
        rdf_ops.rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
            i_block=8,
        )
    )
    mesh = make_2d_mesh(data=2, atoms=4)
    h = np.asarray(
        sharded_rdf_histogram_2d(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
            mesh=mesh,
        )
    )
    np.testing.assert_array_equal(h, ref)


def test_rdf_pallas_vmem_fallback(system, monkeypatch):
    """When a single frame exceeds the Pallas VMEM budget the backend must
    silently fall back to the XLA kernel (exercised here by shrinking the
    budget; in production this is the N > ~40k atoms regime)."""
    from lammps_analysis_tpu.parallel import sharded_ops

    sid, n_pad, ptab, n_pairs, pos, box = system
    ref = np.asarray(
        rdf_ops.rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
            i_block=8,
        )
    )
    monkeypatch.setattr(sharded_ops, "PALLAS_RDF_VMEM_BUDGET", 1)
    with use_mesh(make_data_mesh(1)):
        h = np.asarray(
            sharded_rdf_histogram(
                jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
                jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
                i_block=8, use_pallas=True,
            )
        )
    np.testing.assert_array_equal(h, ref)
