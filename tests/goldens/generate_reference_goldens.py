"""Generate golden outputs by EXECUTING the reference's own code.

VERDICT r2 item 2: the parity harness previously certified this build
against a numpy re-derivation written by the same author — a shared
misreading of a prefactor would pass silently. This script runs the
ACTUAL reference implementation (``/root/reference/mdsuite``) on small
deterministic inputs and freezes its outputs as JSON goldens consumed by
``tests/test_reference_goldens.py``.

The full ``import mdsuite`` is impossible offline — these hard deps are
absent from the image (verified 2026-08-20):

    GPUtil, pysmiles, zinchub, scooby, bokeh, open3d, znvis, pubchempy,
    tensorflow_probability, sqlalchemy

so the generator imports the reference's kernel modules THROUGH the real
package tree with fake parent packages (bypassing only the ``__init__``
files) and stubs exactly three sqlalchemy/bokeh-backed modules that the
calculator import chain touches but the kernels never call
(``database.scheme``, ``database.calculator_database``,
``visualizer.d2_data_visualization``) plus ``GPUtil``. Everything
numerical below — TF kernels, prefactors, ideal-gas corrections, spline
fits — is the reference's own code, byte-for-byte from
``/root/reference``.

Not reproducible from reference code offline: the Green-Kubo window ACF
(``tfp.stats.auto_correlation`` — tensorflow_probability missing). Its
semantics are instead pinned by ``tests/test_ops_correlation.py``
against the definition of the biased estimator.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tests/goldens/generate_reference_goldens.py
"""

import itertools
import json
import pathlib
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = pathlib.Path(__file__).resolve().parent


def install_reference_modules():
    """Fake-parent import scaffolding for /root/reference/mdsuite."""
    for name, path in [
        ("mdsuite", f"{REF}/mdsuite"),
        ("mdsuite.utils", f"{REF}/mdsuite/utils"),
        ("mdsuite.utils.tensor_flow", f"{REF}/mdsuite/utils/tensor_flow"),
        ("mdsuite.calculators", f"{REF}/mdsuite/calculators"),
        ("mdsuite.database", f"{REF}/mdsuite/database"),
        ("mdsuite.memory_management", f"{REF}/mdsuite/memory_management"),
        ("mdsuite.visualizer", f"{REF}/mdsuite/visualizer"),
    ]:
        mod = types.ModuleType(name)
        mod.__path__ = [path]
        sys.modules[name] = mod

    gputil = types.ModuleType("GPUtil")
    gputil.getGPUs = lambda: []
    sys.modules["GPUtil"] = gputil

    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:  # absent from this venv; only __init__ uses it
            pr = types.ModuleType("pkg_resources")
            pr.resource_stream = None
            sys.modules["pkg_resources"] = pr

    scheme = types.ModuleType("mdsuite.database.scheme")
    scheme.Computation = type("Computation", (), {})
    scheme.ComputationResult = type("ComputationResult", (), {})
    sys.modules["mdsuite.database.scheme"] = scheme

    calcdb = types.ModuleType("mdsuite.database.calculator_database")

    class CalculatorDatabase:
        def __init__(self, experiment):
            self.experiment = experiment

    calcdb.CalculatorDatabase = CalculatorDatabase
    sys.modules["mdsuite.database.calculator_database"] = calcdb

    vis = types.ModuleType("mdsuite.visualizer.d2_data_visualization")
    vis.DataVisualizer2D = type("DataVisualizer2D", (), {})
    sys.modules["mdsuite.visualizer.d2_data_visualization"] = vis

    trafos = types.ModuleType("mdsuite.transformations")
    trafos.__path__ = [f"{REF}/mdsuite/transformations"]
    sys.modules["mdsuite.transformations"] = trafos

    fio = types.ModuleType("mdsuite.file_io")
    fio.__path__ = [f"{REF}/mdsuite/file_io"]
    sys.modules["mdsuite.file_io"] = fio
    # `mdsuite.file_io.file_read.FileProcessor` is referenced through the
    # ATTRIBUTE chain (tabular_text_files.py:57); pre-existing fake
    # modules suppress the import system's parent-attr wiring
    sys.modules["mdsuite"].file_io = fio
    sys.modules["mdsuite"].database = sys.modules["mdsuite.database"]

    # structure_factor.py pulls bokeh plotting symbols and the top-level
    # `from mdsuite import data, utils`
    bokeh = types.ModuleType("bokeh")
    bokeh_models = types.ModuleType("bokeh.models")
    bokeh_models.HoverTool = type("HoverTool", (), {})
    bokeh_plotting = types.ModuleType("bokeh.plotting")
    bokeh_plotting.figure = lambda *a, **k: None
    sys.modules["bokeh"] = bokeh
    sys.modules["bokeh.models"] = bokeh_models
    sys.modules["bokeh.plotting"] = bokeh_plotting
    data_mod = types.ModuleType("mdsuite.data")
    data_mod.__path__ = [f"{REF}/mdsuite/data"]
    sys.modules["mdsuite.data"] = data_mod
    sys.modules["mdsuite"].data = data_mod
    sys.modules["mdsuite"].utils = sys.modules["mdsuite.utils"]

    # `from mdsuite.utils import config` (and DatasetKeys) expect the
    # singletons re-exported by the real utils/__init__.py (bypassed here)
    import importlib

    cfg = importlib.import_module("mdsuite.utils.config")
    sys.modules["mdsuite.utils"].config = cfg.config
    consts = importlib.import_module("mdsuite.utils.constants")
    sys.modules["mdsuite.utils"].DatasetKeys = consts.DatasetKeys

    mm = importlib.import_module("mdsuite.memory_management.memory_manager")
    sys.modules["mdsuite.memory_management"].MemoryManager = mm.MemoryManager


def golden_system(rng):
    """Deterministic 2-species NaCl-like test frame set (reference layout)."""
    n_na, n_cl, n_frames, box = 10, 8, 4, 6.0
    pos = rng.uniform(0.0, box, size=(n_na + n_cl, n_frames, 3))
    return pos, n_na, n_cl, n_frames, box


def gen_rdf(rdf_mod, linalg, units_mod):
    import tensorflow as tf

    rng = np.random.default_rng(42)
    pos, n_na, n_cl, n_frames, box = golden_system(rng)
    n_atoms = n_na + n_cl
    # cutoff beyond sqrt(2)/2 * box exercises every piece of the
    # ideal-gas correction (spherical + correction_1 + correction_2,
    # reference :719-826)
    cutoff, n_bins = 4.5, 50

    RDF = rdf_mod.RadialDistributionFunction
    self = RDF.__new__(RDF)
    metal = units_mod.units_dict["metal"]
    self.experiment = types.SimpleNamespace(
        box_array=[box, box, box],
        volume=box**3,
        species={
            "Na": types.SimpleNamespace(n_particles=n_na),
            "Cl": types.SimpleNamespace(n_particles=n_cl),
        },
        units=metal,
    )
    self.args = types.SimpleNamespace(
        number_of_bins=n_bins,
        cutoff=cutoff,
        species=["Na", "Cl"],
        molecules=False,
        atom_selection=np.s_[:],
        number_of_configurations=n_frames,
        start=0,
        stop=n_frames - 1,
    )
    self._dtype = tf.float32  # reference :128 (dtype property)
    self._initialize_rdf_parameters()

    positions_tensor = tf.constant(pos, dtype=tf.float32)
    indices = linalg.get_partial_triu_indices(n_atoms, n_atoms, 0)
    d_ij = self.get_dij(
        indices,
        positions_tensor,
        positions_tensor,
        tf.cast(self.experiment.box_array, dtype=self.dtype),
    )
    counts = self.compute_species_values(indices, 0, d_ij)
    result = {
        "positions_atoms_time_dims": pos.tolist(),
        "n_na": n_na,
        "n_cl": n_cl,
        "n_frames": n_frames,
        "box": box,
        "cutoff": cutoff,
        "n_bins": n_bins,
        "ideal_correction": np.asarray(self.ideal_correction).tolist(),
        "counts": {k: np.asarray(v).tolist() for k, v in counts.items()},
        "prefactors": {
            k: np.asarray(self._calculate_prefactor(k)).tolist()
            for k in self.key_list
        },
        "x_nm": self._ang_to_nm(
            np.linspace(0.0, cutoff, n_bins)
        ).tolist(),
        "g": {
            k: (
                np.asarray(counts[k], dtype=float)
                * self._calculate_prefactor(k)
            ).tolist()
            for k in self.key_list
        },
    }
    return result


def gen_adf(adf_mod, linalg, nlist):
    import tensorflow as tf

    rng = np.random.default_rng(43)
    # small dense system so every species triple occurs
    n_na, n_cl, n_frames, box = 7, 6, 3, 5.0
    pos = rng.uniform(0.0, box, size=(n_na + n_cl, n_frames, 3))
    n_atoms = n_na + n_cl
    cutoff, n_bins, norm_power = 3.2, 40, 4

    ADF = adf_mod.AngularDistributionFunction
    self = ADF.__new__(ADF)
    self.experiment = types.SimpleNamespace(box_array=[box, box, box])
    self.args = types.SimpleNamespace(number_of_bins=n_bins)
    self.cutoff = cutoff
    self.number_of_atoms = n_atoms
    self.adf_minibatch = 2
    self.use_tf_function = False
    self.bin_range = [0.0, 3.15]  # reference :216 ("a chemists pi")
    self.norm_power = norm_power

    # reference _build_histograms body (:400-433) on one position block
    tmp = tf.transpose(tf.constant(pos, dtype=tf.float32), (1, 0, 2))
    timesteps = tmp.shape[0]
    r_ij_mat, r_ijk_indices = self._compute_rijk_matrices(tmp, timesteps)

    species_indices = [("Na", 0, n_na), ("Cl", n_na, n_atoms)]
    histograms = {}
    n_triples = {}
    for species in itertools.combinations_with_replacement(species_indices, 3):
        condition, name = self._compute_angles(species, r_ijk_indices)
        picked = tf.gather_nd(r_ijk_indices, tf.where(condition))
        angle_vals, pre_factor = linalg.get_angles(r_ij_mat, picked)
        pre_factor = 1 / pre_factor**self.norm_power
        histogram, _ = np.histogram(
            np.asarray(angle_vals),
            bins=n_bins,
            range=self.bin_range,
            weights=np.asarray(pre_factor),
            density=True,
        )
        histograms[name] = histogram.tolist()
        n_triples[name] = int(picked.shape[0])
    return {
        "positions_atoms_time_dims": pos.tolist(),
        "n_na": n_na,
        "n_cl": n_cl,
        "n_frames": n_frames,
        "box": box,
        "cutoff": cutoff,
        "n_bins": n_bins,
        "norm_power": norm_power,
        "bin_range": self.bin_range,
        "n_triples": n_triples,
        "histograms": histograms,
    }


def gen_linalg(linalg):
    import tensorflow as tf

    rng = np.random.default_rng(44)
    box = np.array([4.0, 5.0, 6.0])
    r_ij = rng.uniform(-9.0, 9.0, size=(6, 5, 3))
    min_image = linalg.apply_minimum_image(
        tf.constant(r_ij, tf.float64), tf.constant(box, tf.float64)
    )
    d = rng.uniform(0.0, 5.0, size=(64,))
    cut = np.asarray(
        linalg.apply_system_cutoff(tf.constant(d, tf.float64), 3.0)
    )
    v1 = rng.normal(size=(12, 3))
    v2 = rng.normal(size=(12, 3))
    ang = linalg.angle_between(
        tf.constant(v1, tf.float64), tf.constant(v2, tf.float64)
    )
    tri = linalg.get_partial_triu_indices(7, 3, 2)
    return {
        "box": box.tolist(),
        "r_ij": r_ij.tolist(),
        "min_image": np.asarray(min_image).tolist(),
        "cutoff_in": d.tolist(),
        "cutoff_out": cut.tolist(),
        "v1": v1.tolist(),
        "v2": v2.tolist(),
        "angles": np.asarray(ang).tolist(),
        "partial_triu_7_3_2": np.asarray(tri).tolist(),
    }


def gen_fit_and_helpers(chm):
    rng = np.random.default_rng(45)
    t = np.linspace(0.1, 10.0, 120)
    msd = 6.0 * 1.7 * t + 0.3 * np.log1p(t) + 0.02 * rng.normal(size=t.size)
    popt, pcov, gradients, gradient_errors = chm.fit_einstein_curve(
        t, msd, fit_max_index=119
    )
    a = rng.normal(size=(40, 3))
    b = rng.normal(size=(40, 3))
    acf = chm.correlate(a, b)
    msd_op = chm.msd_operation(a, b)
    return {
        "time": t.tolist(),
        "msd": msd.tolist(),
        "popt": np.asarray(popt).tolist(),
        "pcov": np.asarray(pcov).tolist(),
        "gradients": np.asarray(gradients).tolist(),
        "gradient_errors": np.asarray(gradient_errors).tolist(),
        "corr_a": a.tolist(),
        "corr_b": b.tolist(),
        "correlate": np.asarray(acf).tolist(),
        "msd_operation": np.asarray(msd_op).tolist(),
    }


def gen_units_and_meta(units_mod, meta):
    out = {"units": {}}
    for name in ("real", "metal", "si"):
        u = units_mod.units_dict[name]
        out["units"][name] = {
            k: getattr(u, k)
            for k in (
                "time", "length", "energy", "NkTV2p", "boltzmann",
                "temperature", "pressure",
            )
        }
    out["constants"] = {
        "standard_state_pressure": units_mod.standard_state_pressure,
        "avogadro_constant": units_mod.avogadro_constant,
        "elementary_charge": units_mod.elementary_charge,
        "boltzmann_constant": units_mod.boltzmann_constant,
        "golden_ratio": units_mod.golden_ratio,
    }
    # golden-section search on a noiseless quartic sampled like the CN
    # calculator does (reference meta_functions.py:376-437)
    x = np.linspace(0.0, 4.0, 200)
    y = (x - 1.3) ** 2 + 0.5
    lo, hi = meta.golden_section_search([x, y], 3.0, 0.5)
    out["golden_section"] = {
        "x": x.tolist(), "y": y.tolist(),
        "a": float(lo), "b": float(hi),
    }
    return out


def gen_transformations():
    """Execute every reference transformation kernel on random batches.

    ``transform_batch`` methods are pure (no instance state except
    ``CoordinateWrapper.center_box``), so instances come from ``__new__``.
    Reference layout is (atoms, time, dims); the consuming test
    transposes for this build's time-leading layout.
    """
    import importlib

    import tensorflow as tf

    P = importlib.import_module("mdsuite.database.mdsuite_properties")
    mpp = P.mdsuite_properties
    rng = np.random.default_rng(46)
    box = np.array([5.0, 6.0, 7.0])
    n_a, n_b, t1, t2 = 6, 4, 9, 7
    dt, sr = 0.05, 4.0

    def arr(*shape, lo=-3.0, hi=3.0):
        return rng.uniform(lo, hi, size=shape)

    ins = {
        "box": box.tolist(),
        "time_step": dt,
        "sample_rate": sr,
        "pos_a_1": arr(n_a, t1, 3, lo=0.0, hi=5.0).tolist(),
        "pos_a_2": arr(n_a, t2, 3, lo=0.0, hi=5.0).tolist(),
        "upos_a": (arr(n_a, t1, 3, lo=-2.0, hi=9.0)).tolist(),
        "spos_a": arr(n_a, t1, 3, lo=0.0, hi=1.0).tolist(),
        "images_a": rng.integers(-3, 4, size=(n_a, t1, 3)).astype(float).tolist(),
        "vel_a": arr(n_a, t1, 3).tolist(),
        "vel_b": arr(n_b, t1, 3).tolist(),
        "upos_b": (arr(n_b, t1, 3, lo=-2.0, hi=9.0)).tolist(),
        "q_a": np.full((n_a, t1, 1), 1.0).tolist(),
        "q_b": np.full((n_b, t1, 1), -1.0).tolist(),
        "stress_a": arr(n_a, t1, 6).tolist(),
        "stress_b": arr(n_b, t1, 6).tolist(),
        "ke_a": (arr(n_a, t1, 1, lo=0.0, hi=2.0)).tolist(),
        "ke_b": (arr(n_b, t1, 1, lo=0.0, hi=2.0)).tolist(),
        "pe_a": (arr(n_a, t1, 1, lo=-2.0, hi=0.0)).tolist(),
        "pe_b": (arr(n_b, t1, 1, lo=-2.0, hi=0.0)).tolist(),
        "force_a": arr(n_a, t1, 3).tolist(),
        # kinaci needs equal species sizes (upstream add_n)
        "kin_pos_a": arr(n_a, t1, 3).tolist(),
        "kin_pos_b": arr(n_a, t1, 3).tolist(),
        "kin_vel_b": arr(n_a, t1, 3).tolist(),
        "kin_force_b": arr(n_a, t1, 3).tolist(),
        "kin_pe_b": (arr(n_a, t1, 1, lo=-2.0, hi=0.0)).tolist(),
    }
    T = lambda name: importlib.import_module(f"mdsuite.transformations.{name}")
    c = lambda x: tf.constant(np.asarray(x), tf.float64)
    out = {"inputs": ins}

    # unwrap: two chained batches exercise the carryover
    uw = T("unwrap_coordinates").CoordinateUnwrapper
    self_uw = uw.__new__(uw)
    o1, carry = self_uw.transform_batch(
        {mpp.positions.name: c(ins["pos_a_1"]),
         mpp.box_length.name: c(box)}, None,
    )
    o2, _ = self_uw.transform_batch(
        {mpp.positions.name: c(ins["pos_a_2"]),
         mpp.box_length.name: c(box)}, carry,
    )
    out["unwrap_batch1"] = np.asarray(o1).tolist()
    out["unwrap_batch2"] = np.asarray(o2).tolist()

    uvi = T("unwrap_via_indices").UnwrapViaIndices
    out["unwrap_via_indices"] = np.asarray(
        uvi.__new__(uvi).transform_batch(
            {mpp.positions.name: c(ins["pos_a_1"]),
             mpp.box_length.name: c(box),
             mpp.box_images.name: c(ins["images_a"])}, None,
        )
    ).tolist()

    wr = T("wrap_coordinates").CoordinateWrapper
    for center in (False, True):
        self_wr = wr.__new__(wr)
        self_wr.center_box = center
        out[f"wrap_center_{center}"] = np.asarray(
            self_wr.transform_batch(
                {mpp.unwrapped_positions.name: c(ins["upos_a"]),
                 mpp.box_length.name: c(box)}, None,
            )
        ).tolist()

    sc = T("scale_coordinates").ScaleCoordinates
    out["scale"] = np.asarray(
        sc.__new__(sc).transform_batch(
            {mpp.scaled_positions.name: c(ins["spos_a"]),
             mpp.box_length.name: c(box)}, None,
        )
    ).tolist()

    vfp = T("velocity_from_positions").VelocityFromPositions
    out["velocity_from_positions"] = np.asarray(
        vfp.__new__(vfp).transform_batch(
            {mpp.unwrapped_positions.name: c(ins["upos_a"]),
             mpp.time_step.name: tf.constant(dt, tf.float64),
             mpp.sample_rate.name: tf.constant(sr, tf.float64)}, None,
        )
    ).tolist()

    ic = T("ionic_current").IonicCurrent
    out["ionic_current"] = np.asarray(
        ic.__new__(ic).transform_batch(
            {"A": {mpp.velocities.name: c(ins["vel_a"]),
                   mpp.charge.name: c(ins["q_a"])},
             "B": {mpp.velocities.name: c(ins["vel_b"]),
                   mpp.charge.name: c(ins["q_b"])}}, None,
        )
    ).tolist()

    tdm = T("translational_dipole_moment").TranslationalDipoleMoment
    out["translational_dipole_moment"] = np.asarray(
        tdm.__new__(tdm).transform_batch(
            {"A": {mpp.unwrapped_positions.name: c(ins["upos_a"]),
                   mpp.charge.name: c(ins["q_a"])},
             "B": {mpp.unwrapped_positions.name: c(ins["upos_b"]),
                   mpp.charge.name: c(ins["q_b"])}}, None,
        )
    ).tolist()

    tfx = T("thermal_flux").ThermalFlux
    out["thermal_flux"] = np.asarray(
        tfx.__new__(tfx).transform_batch(
            {"A": {mpp.stress.name: c(ins["stress_a"]),
                   mpp.velocities.name: c(ins["vel_a"]),
                   mpp.kinetic_energy.name: c(ins["ke_a"]),
                   mpp.potential_energy.name: c(ins["pe_a"])},
             "B": {mpp.stress.name: c(ins["stress_b"]),
                   mpp.velocities.name: c(ins["vel_b"]),
                   mpp.kinetic_energy.name: c(ins["ke_b"]),
                   mpp.potential_energy.name: c(ins["pe_b"])}}, None,
        )
    ).tolist()

    ihc = T("integrated_heat_current").IntegratedHeatCurrent
    out["integrated_heat_current"] = np.asarray(
        ihc.__new__(ihc).transform_batch(
            {"A": {mpp.unwrapped_positions.name: c(ins["upos_a"]),
                   mpp.kinetic_energy.name: c(ins["ke_a"]),
                   mpp.potential_energy.name: c(ins["pe_a"])},
             "B": {mpp.unwrapped_positions.name: c(ins["upos_b"]),
                   mpp.kinetic_energy.name: c(ins["ke_b"]),
                   mpp.potential_energy.name: c(ins["pe_b"])}}, None,
        )
    ).tolist()

    mf = T("momentum_flux").MomentumFlux
    out["momentum_flux"] = np.asarray(
        mf.__new__(mf).transform_batch(
            {"A": {mpp.stress.name: c(ins["stress_a"])},
             "B": {mpp.stress.name: c(ins["stress_b"])}}, None,
        )
    ).tolist()

    kin = T("kinaci_integrated_heat_current").KinaciIntegratedHeatCurrent
    kin_batch = {
        "A": {mpp.unwrapped_positions.name: c(ins["kin_pos_a"]),
              mpp.velocities.name: c(ins["vel_a"]),
              mpp.forces.name: c(ins["force_a"]),
              mpp.potential_energy.name: c(ins["pe_a"]),
              mpp.time_step.name: tf.constant(dt, tf.float64),
              mpp.sample_rate.name: tf.constant(sr, tf.float64)},
        "B": {mpp.unwrapped_positions.name: c(ins["kin_pos_b"]),
              mpp.velocities.name: c(ins["kin_vel_b"]),
              mpp.forces.name: c(ins["kin_force_b"]),
              mpp.potential_energy.name: c(ins["kin_pe_b"]),
              mpp.time_step.name: tf.constant(dt, tf.float64),
              mpp.sample_rate.name: tf.constant(sr, tf.float64)},
    }
    k1, k_carry = kin.__new__(kin).transform_batch(kin_batch, None)
    out["kinaci_batch1"] = np.asarray(k1).tolist()
    # upstream's cross-batch resume is broken: transform_batch returns a
    # 1-D per-atom carry (``add_n(integrals)[:, -1]``) but the next call
    # tiles it with 2-D multiples (``tf.tile(carryover, (1, batch_size))``,
    # kinaci_integrated_heat_current.py:66) — InvalidArgumentError on
    # every multi-batch run. Record the crash, then the intended
    # semantics with the carry reshaped to the (n, 1) the tile expects.
    try:
        kin.__new__(kin).transform_batch(kin_batch, k_carry)
        out["kinaci_carry_crashes_upstream"] = False
    except Exception as err:
        out["kinaci_carry_crashes_upstream"] = (
            f"{type(err).__name__}: {str(err)[:160]}"
        )
    k2, _ = kin.__new__(kin).transform_batch(
        kin_batch, tf.reshape(k_carry, (-1, 1))
    )
    out["kinaci_batch2_same_inputs_with_carry"] = np.asarray(k2).tolist()
    return out


def gen_structure_factor():
    """Execute the reference's (upstream-disabled) StructureFactor math.

    The class is instantiated via ``__new__`` with the form-factor CSV
    read directly; every numerical method below is reference code. A
    synthetic 2-species RDF with Gaussian bumps feeds the partial-SF /
    weight / total pipeline. The proper Cromer-Mann factor computed from
    the SAME CSV row is recorded alongside so the consuming test can pin
    each upstream divergence (unsquared q/4pi exponent, '+c' added once
    per a-term, per-q Faber-Ziman denominator collapsed by np.mean, the
    same-species factor 2, the 0.5 scale, the missing density).
    """
    import importlib

    import pandas as pd

    sf_mod = importlib.import_module("mdsuite.calculators.structure_factor")
    SF = sf_mod.StructureFactor
    self = SF.__new__(SF)

    # pandas 2 removed float(<1-row Series>), which the reference's
    # _compute_form_factors relies on (written for pandas 1 — the
    # upstream code crashes outright on modern pandas). This shim
    # restores the pandas-1 access pattern without touching the math:
    # column access on a .loc[mask] single-row result yields a scalar.
    class _FFShim:
        def __init__(self, df):
            self._df = df

        def __getitem__(self, key):
            return self._df[key]

        @property
        def loc(self):
            df = self._df

            class _Loc:
                def __getitem__(_, mask):
                    row = df[mask]
                    assert len(row) == 1
                    return {
                        c: (
                            row[c].iloc[0]
                            if c == "Element"
                            else float(row[c].iloc[0])
                        )
                        for c in row.columns
                    }

            return _Loc()

    self.form_factor_data = _FFShim(
        pd.read_csv(f"{REF}/mdsuite/data/form_fac_coeffs.csv")
    )
    resolution = 40
    self.args = types.SimpleNamespace(resolution=resolution)
    self.q_values = np.linspace(0.5, 12, resolution)

    # synthetic RDF computation: g(r) = 1 + gaussian bump, x stored in nm
    r_ang = np.linspace(0.02, 9.0, 120)
    rng = np.random.default_rng(47)
    rdf_dict = {}
    for pair, (center, height) in {
        "Na_Na": (3.2, 0.8), "Na_Cl": (2.6, 1.6), "Cl_Cl": (3.8, 0.6),
    }.items():
        g = 1.0 + height * np.exp(-((r_ang - center) ** 2) / 0.18)
        rdf_dict[pair] = {"x": (r_ang / 10.0).tolist(), "y": g.tolist()}
    self.rdf_data = types.SimpleNamespace(
        data_dict={
            k: {"x": np.array(v["x"]), "y": np.array(v["y"])}
            for k, v in rdf_dict.items()
        }
    )
    self.species_dict = {
        "Na": types.SimpleNamespace(molar_fraction=0.5, form_factor=None),
        "Cl": types.SimpleNamespace(molar_fraction=0.5, form_factor=None),
    }
    self._compute_form_factors()
    partial = self._compute_partial_structure_factors()
    weights = self._compute_weight_factors()
    total = self._compute_total_structure_factor(partial, weights)

    # proper Cromer-Mann from the SAME CSV rows, for the consuming test
    proper = {}
    csv_coeffs = {}
    for name in ("Na", "Cl"):
        row = self.form_factor_data.loc[
            self.form_factor_data["Element"] == name
        ]
        f = np.zeros(resolution)
        for i in range(4):
            f += float(row[f"a{i + 1}"]) * np.exp(
                -float(row[f"b{i + 1}"]) * (self.q_values / (4 * np.pi)) ** 2
            )
        f += float(row["c"])
        proper[name] = f.tolist()
        csv_coeffs[name] = {
            **{f"a{i + 1}": float(row[f"a{i + 1}"]) for i in range(4)},
            **{f"b{i + 1}": float(row[f"b{i + 1}"]) for i in range(4)},
            "c": float(row["c"]),
        }
    return {
        "q": self.q_values.tolist(),
        "resolution": resolution,
        "rdf": rdf_dict,
        "molar_fractions": {"Na": 0.5, "Cl": 0.5},
        "reference_form_factors": {
            n: np.asarray(s.form_factor).tolist()
            for n, s in self.species_dict.items()
        },
        "proper_cromer_mann": proper,
        "csv_coefficients": csv_coeffs,
        "reference_partial_sf": {
            k: np.asarray(v).tolist() for k, v in partial.items()
        },
        "reference_weights": {
            k: np.asarray(v).tolist() for k, v in weights.items()
        },
        "reference_total_sf": np.asarray(total).tolist(),
    }


def gen_lammps_reader():
    """Run the REFERENCE LAMMPS dump reader end-to-end on a synthetic file.

    Shuffled atom ids, two species, positions + velocities + charge
    columns: exercises the column map, species discovery, the id sort,
    and chunk assembly. The golden records the file text plus every
    chunk array in the reference layout (atoms, time, dims); the
    consuming test feeds the same text to this build's reader.
    """
    import importlib
    import tempfile

    ltf = importlib.import_module("mdsuite.file_io.lammps_trajectory_files")

    rng = np.random.default_rng(48)
    n_atoms, n_frames, box = 20, 3, 9.0
    species_of = ["Na" if i % 3 else "Cl" for i in range(n_atoms)]
    pos = rng.uniform(0, box, size=(n_frames, n_atoms, 3))
    vel = rng.normal(size=(n_frames, n_atoms, 3))
    q = np.where(np.array([s == "Na" for s in species_of]), 1.0, -1.0)
    lines = []
    for t in range(n_frames):
        lines += [
            "ITEM: TIMESTEP", str(t * 7), "ITEM: NUMBER OF ATOMS",
            str(n_atoms), "ITEM: BOX BOUNDS pp pp pp",
            f"0 {box}", f"0 {box}", f"0 {box}",
            "ITEM: ATOMS id element x y z vx vy vz q",
        ]
        for i in rng.permutation(n_atoms):
            lines.append(
                f"{i + 1} {species_of[i]} "
                f"{pos[t, i, 0]:.8f} {pos[t, i, 1]:.8f} {pos[t, i, 2]:.8f} "
                f"{vel[t, i, 0]:.8f} {vel[t, i, 1]:.8f} {vel[t, i, 2]:.8f} "
                f"{q[i]:.3f}"
            )
    text = "\n".join(lines) + "\n"
    with tempfile.NamedTemporaryFile(
        "w", suffix=".lammpstraj", delete=False
    ) as f:
        f.write(text)
        path = f.name

    reader = ltf.LAMMPSTrajectoryFile(path)
    meta = reader.metadata
    chunks = list(reader.get_configurations_generator())
    data = {}
    for sp in meta.species_list:
        for prop in sp.properties:
            # reference chunk storage: get_data() -> {species: {prop:
            # (n_configs, n_particles, dims) array}} (simulation_database
            # .py:226-227)
            arrs = [
                np.asarray(c.get_data()[sp.name][prop.name]) for c in chunks
            ]
            data[f"{sp.name}/{prop.name}"] = np.concatenate(
                arrs, axis=0
            ).tolist()
    return {
        "file_text": text,
        "n_configurations": int(meta.n_configurations),
        "box_l": [float(b) for b in meta.box_l],
        "sample_rate": int(meta.sample_rate),
        "species": {
            sp.name: {
                "n_particles": int(sp.n_particles),
                "properties": [p.name for p in sp.properties],
            }
            for sp in meta.species_list
        },
        "data": data,
    }


def gen_extxyz_reader():
    """Reference EXTXYZ reader end-to-end (same pattern as gen_lammps_reader)."""
    import importlib
    import tempfile

    exf = importlib.import_module("mdsuite.file_io.extxyz_files")

    rng = np.random.default_rng(49)
    n_atoms, n_frames, box = 14, 3, 8.5
    species_of = ["O" if i % 3 == 0 else "H" for i in range(n_atoms)]
    pos = rng.uniform(0, box, size=(n_frames, n_atoms, 3))
    force = rng.normal(size=(n_frames, n_atoms, 3))
    lines = []
    for t in range(n_frames):
        lines.append(str(n_atoms))
        lines.append(
            f'Lattice="{box} 0.0 0.0 0.0 {box} 0.0 0.0 0.0 {box}" '
            f"Properties=species:S:1:pos:R:3:force:R:3 time={t * 0.5}"
        )
        for i in range(n_atoms):
            lines.append(
                f"{species_of[i]} "
                f"{pos[t, i, 0]:.8f} {pos[t, i, 1]:.8f} {pos[t, i, 2]:.8f} "
                f"{force[t, i, 0]:.8f} {force[t, i, 1]:.8f} {force[t, i, 2]:.8f}"
            )
    text = "\n".join(lines) + "\n"
    with tempfile.NamedTemporaryFile("w", suffix=".extxyz", delete=False) as f:
        f.write(text)
        path = f.name
    reader = exf.EXTXYZFile(path)
    meta = reader.metadata
    chunks = list(reader.get_configurations_generator())
    data = {}
    for sp in meta.species_list:
        for prop in sp.properties:
            arrs = [
                np.asarray(c.get_data()[sp.name][prop.name]) for c in chunks
            ]
            data[f"{sp.name}/{prop.name}"] = np.concatenate(
                arrs, axis=0
            ).tolist()
    return {
        "file_text": text,
        "n_configurations": int(meta.n_configurations),
        "box_l": [float(b) for b in meta.box_l],
        "sample_rate": None if meta.sample_rate is None else int(meta.sample_rate),
        "species": {
            sp.name: {
                "n_particles": int(sp.n_particles),
                "properties": [p.name for p in sp.properties],
            }
            for sp in meta.species_list
        },
        "data": data,
    }


def main():
    install_reference_modules()
    import importlib

    linalg = importlib.import_module("mdsuite.utils.linalg")
    nlist = importlib.import_module("mdsuite.utils.neighbour_list")
    chm = importlib.import_module("mdsuite.utils.calculator_helper_methods")
    units_mod = importlib.import_module("mdsuite.utils.units")
    meta = importlib.import_module("mdsuite.utils.meta_functions")
    rdf_mod = importlib.import_module(
        "mdsuite.calculators.radial_distribution_function"
    )
    adf_mod = importlib.import_module(
        "mdsuite.calculators.angular_distribution_function"
    )

    goldens = {
        "golden_rdf.json": gen_rdf(rdf_mod, linalg, units_mod),
        "golden_adf.json": gen_adf(adf_mod, linalg, nlist),
        "golden_linalg.json": gen_linalg(linalg),
        "golden_fit_helpers.json": gen_fit_and_helpers(chm),
        "golden_units_meta.json": gen_units_and_meta(units_mod, meta),
        "golden_transformations.json": gen_transformations(),
        "golden_structure_factor.json": gen_structure_factor(),
        "golden_lammps_reader.json": gen_lammps_reader(),
        "golden_extxyz_reader.json": gen_extxyz_reader(),
    }
    for fname, data in goldens.items():
        path = OUT / fname
        path.write_text(json.dumps(data))
        print(f"wrote {path} ({path.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
