"""Example: transport coefficients from LAMMPS flux/log output.

Mirrors the reference's flux-file workflows (GK viscosity-flux / thermal
conductivity from global observables): ingest a flux file with
``LAMMPSFluxFile`` (user supplies sample_rate and box, as upstream), then
run the Green-Kubo viscosity directly on the stored stress columns.

Run:  python examples/flux_transport_analysis.py
"""

import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import lammps_analysis_tpu as latpu
from lammps_analysis_tpu.file_io import LAMMPSFluxFile


def write_flux_file(path, n_steps=20000, sigma=1.2, seed=7):
    """Synthetic stress/flux log with exponentially correlated noise."""
    rng = np.random.default_rng(seed)
    tau = 8.0  # correlation time in samples
    alpha = np.exp(-1.0 / tau)
    noise = rng.normal(scale=sigma * np.sqrt(1 - alpha**2),
                       size=(n_steps, 3))
    series = np.zeros((n_steps, 3))
    for t in range(1, n_steps):
        series[t] = alpha * series[t - 1] + noise[t]
    with open(path, "w") as f:
        f.write("# synthetic LAMMPS flux output\n")
        f.write("time temp pxy pxz pyz\n")
        for t in range(n_steps):
            f.write(
                f"{t} 300.0 {series[t, 0]:.8f} {series[t, 1]:.8f} "
                f"{series[t, 2]:.8f}\n"
            )
    return series


def main():
    workdir = pathlib.Path(tempfile.mkdtemp(prefix="flux_example_"))
    flux_path = workdir / "stress_flux.dat"
    write_flux_file(flux_path)

    project = latpu.Project(name="flux_study", storage_path=workdir)
    exp = project.add_experiment(
        "viscosity_run",
        timestep=0.002,
        temperature=300.0,
        units="metal",
        simulation_data=LAMMPSFluxFile(
            flux_path, sample_rate=10, box_l=[30.0, 30.0, 30.0]
        ),
    )
    print("stored observables:", exp.store.properties_of("Observables"))

    res = exp.run.GreenKuboViscosityFlux(
        data_range=256, correlation_time=64, plot=True
    )
    eta = res["System"]["viscosity"][0]
    sem = res["System"]["uncertainty"][0]
    print(f"eta = {eta:.4e} +- {sem:.1e} Pa s")

    # temperature sanity via the time-series hub
    out = exp.time_series.Temperature(window=50)
    print("mean temperature column:", float(np.mean(out["series"]["Observables"])))
    print("figures:", sorted(p.name for p in (exp.path / "figures").iterdir()))


if __name__ == "__main__":
    main()
