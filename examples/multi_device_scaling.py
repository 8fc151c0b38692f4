"""Example: running calculators on a multi-device mesh.

The framework's parallelism is mesh-based (SURVEY §2.7): calculators
shard their frame batches over a ``jax.sharding.Mesh`` and merge
histograms / correlation partial sums with ``psum`` collectives — on
real hardware those ride the ICI links. This example demonstrates:

* building a 1-D ``("data",)`` mesh and scoping it with ``use_mesh``;
* that a FULL streamed calculator (store -> RadialDistributionFunction
  -> Computation) produces identical results on 1 device and on 8;
* the 2-D ``("data", "atoms")`` mesh route for the pairwise kernels
  (frames data-parallel, i-atom rows tensor-parallel with the j side
  all-gathered).

No TPU pod is needed to try it: the script re-execs itself onto an
8-virtual-device CPU mesh (the same trick the test suite and the
driver's multi-chip dry run use). On a real multi-chip host, delete the
bootstrap block — ``jax.devices()`` already has the mesh's devices.

Run:  python examples/multi_device_scaling.py
"""

import os
import pathlib
import shutil
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_DEVICES = 8

# ---- virtual-device bootstrap (CPU stand-in for an 8-chip mesh) ----
if os.environ.get("_MESH_EXAMPLE_CHILD") != "1":
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        tok for tok in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in tok
    ]
    flags.append(f"--xla_force_host_platform_device_count={N_DEVICES}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["_MESH_EXAMPLE_CHILD"] = "1"
    os.execve(sys.executable, [sys.executable, __file__], env)

import numpy as np  # noqa: E402

import lammps_analysis_tpu as latpu  # noqa: E402
from lammps_analysis_tpu.database import (  # noqa: E402
    SpeciesInfo,
    TrajectoryChunkData,
    TrajectoryMetadata,
)
from lammps_analysis_tpu.database.properties import PropertyInfo  # noqa: E402
from lammps_analysis_tpu.file_io import ScriptInput  # noqa: E402
from lammps_analysis_tpu.parallel import (  # noqa: E402
    make_data_mesh,
    use_mesh,
)


def main():
    import jax

    assert len(jax.devices()) >= N_DEVICES
    # cleaned up at the end of main() — mkdtemp alone leaked a store
    # directory per run (incl. every examples smoke-test invocation)
    workdir = pathlib.Path(tempfile.mkdtemp(prefix="mesh_example_"))

    # -- a small synthetic two-species system, ingested through the store
    rng = np.random.default_rng(3)
    n_frames, box = 64, 10.0
    pos = rng.uniform(0, box, size=(n_frames, 64, 3))
    POS = PropertyInfo("Positions", 3)
    species = [SpeciesInfo("Na", 32, [POS]), SpeciesInfo("Cl", 32, [POS])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=species, box_l=[box] * 3,
        sample_rate=1, temperature=1400.0,
    )
    chunk = TrajectoryChunkData(species, n_frames)
    chunk.add_data(pos[:, :32], 0, "Na", "Positions")
    chunk.add_data(pos[:, 32:], 0, "Cl", "Positions")
    project = latpu.Project(name="mesh_demo", storage_path=workdir)
    exp = project.add_experiment(
        "melt", timestep=0.002, units="metal",
        simulation_data=ScriptInput(chunk, meta, "synthetic"),
    )

    # -- the same calculator on a 1-device and an 8-device mesh
    kw = dict(number_of_configurations=32, cutoff=4.9, number_of_bins=60,
              plot=False)
    with use_mesh(make_data_mesh(1)):
        rdf_1 = exp.run.RadialDistributionFunction(**kw)
    with use_mesh(make_data_mesh(N_DEVICES)):
        rdf_8 = exp.run.RadialDistributionFunction(force=True, **kw)
    for pair in rdf_1.data_dict:
        np.testing.assert_array_equal(
            np.asarray(rdf_1.data_dict[pair]["y"]),
            np.asarray(rdf_8.data_dict[pair]["y"]),
        )
    print(f"RDF identical on 1 and {N_DEVICES} devices "
          f"(pairs: {sorted(rdf_1.data_dict)})")

    # -- 2-D (data, atoms) mesh: the tensor-parallel pairwise route
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.rdf import build_species_layout
    from lammps_analysis_tpu.parallel.mesh import make_2d_mesh
    from lammps_analysis_tpu.parallel.sharded_ops import (
        sharded_rdf_histogram,
        sharded_rdf_histogram_2d,
    )

    sid, n_pad, ptab, n_pairs, _ = build_species_layout([32, 32], pad_to=8)
    pos_pad = np.zeros((16, n_pad, 3), np.float32)
    pos_pad[:, :64] = pos[:16].astype(np.float32)
    args = (
        jnp.asarray(pos_pad), jnp.asarray(sid), jnp.asarray(ptab),
        jnp.asarray(np.array([box] * 3, np.float32)),
    )
    mesh2d = make_2d_mesh(data=2, atoms=N_DEVICES // 2)
    hist2d = sharded_rdf_histogram_2d(
        *args, cutoff=4.9, n_bins=60, n_pairs=n_pairs, mesh=mesh2d,
    )
    with use_mesh(make_data_mesh(1)):
        hist1 = sharded_rdf_histogram(
            *args, cutoff=4.9, n_bins=60, n_pairs=n_pairs, i_block=8,
        )
    np.testing.assert_allclose(np.asarray(hist2d), np.asarray(hist1))
    print(f"2-D (data=2, atoms={N_DEVICES // 2}) mesh histogram matches "
          "the single-device kernel")

    figures = workdir / "mesh_demo" / "figures"
    print(f"done; figures were written under {figures} "
          "(temporary workdir removed)")
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
