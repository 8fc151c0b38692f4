"""Test-only numpy ports of the reference's observable math.

Each function re-derives, directly from the reference implementation
(file:line cited per function, paths relative to ``/root/reference/``),
the COMPLETE normalisation chain of one observable — windowing, counters,
prefactors, unit conversions. The parity tests run the framework and these
oracles on the same synthetic trajectory and require agreement at 1e-5 or
better, which is the BASELINE.md numerical-parity target.

Nothing here is imported by the package; this is the independent check.
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import cumulative_trapezoid

# physical constants exactly as the reference defines them
# (mdsuite/utils/units.py:29-42)
BOLTZMANN = 1.380649e-23
ELEMENTARY_CHARGE = 1.602176634e-19


# --------------------------------------------------------------------- RDF
def rdf_reference(
    pos_by_species: dict,
    sample_idx: np.ndarray,
    box: np.ndarray,
    volume: float,
    cutoff: float,
    n_bins: int,
    units_length: float,
):
    """g(r) per species pair, reference math.

    Ports ``calculators/radial_distribution_function.py``: sampled
    configurations (:264), triu minimum-image distances (get_dij :648-689),
    ``tf.histogram_fixed_width`` over [0, cutoff] after the cutoff mask
    (bin_minibatch :617-645, apply_system_cutoff utils/linalg.py:125-137),
    prefactor with factor 2 for like pairs and the ideal-gas shell term
    (_calculate_prefactor :299-345, ideal_correction :719-826 — the
    spherical 4*pi*r^2 branch; tests stay below L/2), Angstrom -> nm x-axis
    (_ang_to_nm :384).
    """
    species = list(pos_by_species)
    concat = np.concatenate([pos_by_species[s] for s in species], axis=1)
    counts = [pos_by_species[s].shape[1] for s in species]
    offsets = np.cumsum([0] + counts)
    sid = np.concatenate(
        [np.full(c, k, dtype=int) for k, c in enumerate(counts)]
    )

    hists = {}
    for a in range(len(species)):
        for b in range(a, len(species)):
            hists[(a, b)] = np.zeros(n_bins, dtype=np.int64)

    for f in sample_idx:
        pos = concat[f]
        n = pos.shape[0]
        iu, ju = np.triu_indices(n, k=1)
        r = pos[ju] - pos[iu]
        r -= box * np.round(r / box)
        d = np.linalg.norm(r, axis=-1)
        sa, sb = sid[iu], sid[ju]
        lo = np.minimum(sa, sb)
        hi = np.maximum(sa, sb)
        for (a, b), h in hists.items():
            sel = d[(lo == a) & (hi == b) & (d < cutoff)]
            # tf.histogram_fixed_width: n_bins equal bins over [0, cutoff],
            # out-of-range clamped (values are already < cutoff here)
            idx = np.clip(
                (sel * n_bins / cutoff).astype(int), 0, n_bins - 1
            )
            np.add.at(h, idx, 1)

    bin_edges = np.linspace(0.0, cutoff, n_bins)
    bin_width = cutoff / n_bins
    assert cutoff <= box[0] / 2, "oracle implements the spherical branch"
    ideal = 4.0 * np.pi * bin_edges**2 * bin_width
    x_nm = (units_length / 1e-9) * bin_edges

    out = {}
    n_frames = len(sample_idx)
    with np.errstate(divide="ignore", invalid="ignore"):
        for (a, b), h in hists.items():
            scale = 2.0 if a == b else 1.0
            rho = counts[b] / volume
            denom = n_frames * rho * ideal * counts[a]
            g = np.where(denom > 0, scale * h / np.where(denom > 0, denom, 1), 0.0)
            out[f"{species[a]}_{species[b]}"] = (x_nm, g)
    return out


# ---------------------------------------------------------------- windows
def _window_starts(total: int, window: int, stride: int) -> np.ndarray:
    n = (total - window) // stride + 1 if total >= window else 0
    return np.arange(max(n, 0)) * stride


def biased_acf(x: np.ndarray) -> np.ndarray:
    """tfp.stats.auto_correlation(center=False, normalize=False) along axis 0.

    ``acf[k] = (1/W) sum_t x[t] x[t+k]`` (every lag divided by W).
    Direct O(W^2) sum — deliberately not FFT, to be independent of the
    framework's estimator.
    """
    w = x.shape[0]
    out = np.zeros_like(x)
    for k in range(w):
        out[k] = np.sum(x[: w - k] * x[k:], axis=0) / w
    return out


# ----------------------------------------------------------- Einstein MSD
def einstein_msd_reference(
    x: np.ndarray, data_range: int, correlation_time: int, dt: float,
    sample_rate: int, units_length: float, units_time: float,
):
    """(time_si, msd_si) — ``einstein_diffusion_coefficients.py:168-205``.

    Per window: sum over particles and dims of squared displacement from the
    window origin; the reference counter adds ``n_particles`` per window in
    ``ensemble_operation`` (:176, ``msd.shape[0]``) and 1 per window in the
    ensemble loop (:245), i.e. total ``n_windows * (n_particles + 1)``.
    """
    t, n, _ = x.shape
    starts = _window_starts(t, data_range, correlation_time)
    msd = np.zeros(data_range)
    for s in starts:
        seg = x[s : s + data_range]
        msd += np.sum((seg - seg[0]) ** 2, axis=(1, 2))
    count = len(starts) * (n + 1)
    msd = msd / count * units_length**2
    times = np.arange(data_range) * dt * sample_rate * units_time
    return times, msd


# ------------------------------------------------- GK ionic conductivity
def gk_ionic_conductivity_reference(
    vel_by_species: dict,
    charges: dict,
    data_range: int,
    correlation_time: int,
    integration_range: int,
    dt: float,
    sample_rate: int,
    temperature: float,
    volume: float,
    units_length: float,
    units_volume: float,
    units_time: float,
):
    """sigma — ``green_kubo_ionic_conductivity.py:151-233`` + the
    IonicCurrent transformation (``transformations/ionic_current.py:40-60``:
    J(t) = sum_species sum_atoms q * v).

    Per window: biased ACF of J summed over components; ACF averaged over
    windows; cumulative trapezoid against raw-sim-unit times; value =
    prefactor * sigma[integration_range - 1] with
    prefactor = e^2 L^2 / (3 kB T V V_u t_u) (:167-186).
    """
    species = list(vel_by_species)
    j = sum(
        charges[s] * vel_by_species[s].sum(axis=1) for s in species
    )  # (T, 3)
    starts = _window_starts(j.shape[0], data_range, correlation_time)
    times = np.arange(data_range) * dt * sample_rate
    acf_sum = np.zeros(data_range)
    per_window = []
    for s in starts:
        seg = j[s : s + data_range]
        jacf = biased_acf(seg).sum(axis=-1)
        acf_sum += jacf
        per_window.append(cumulative_trapezoid(jacf, x=times))
    acf = acf_sum / len(starts)
    sigma = cumulative_trapezoid(acf, x=times)
    sem = np.std(np.asarray(per_window), axis=0) / np.sqrt(len(per_window))

    numerator = ELEMENTARY_CHARGE**2 * units_length**2
    denominator = (
        3 * BOLTZMANN * temperature * volume * units_volume * units_time
    )
    prefactor = numerator / denominator
    ir = min(integration_range - 1, len(sigma) - 1)
    return prefactor * sigma[ir], prefactor * sem[ir], acf, sigma


# -------------------------------------------- GK thermal (both formulations)
def gk_thermal_window_integrals_reference(
    flux: np.ndarray,
    data_range: int,
    correlation_time: int,
    integration_range: int,
    dt: float,
    sample_rate: int,
    temperature: float,
    volume: float,
    units,
):
    """Per-window integrals + prefactor for GK thermal conductivity.

    Reference ``green_kubo_thermal_conductivity.py:153-233``: per window
    jacf = data_range * biased_acf(J) summed over components; per-window
    sigma_w = trapz(jacf[:integration_range], t[:integration_range]);
    the reference then reports ``prefactor * sigma[0]`` as the value and
    ``prefactor * sigma[1]`` as the uncertainty (:215-225) — i.e. the FIRST
    window's integral, not an average (its integration test is disabled
    upstream). The build instead reports
    ``prefactor * mean_w(sigma_w)`` (+ SEM), which reduces to the same
    number in expectation and equals the reference exactly when there is
    one window. Returns (prefactor, per-window sigma array).
    """
    starts = _window_starts(flux.shape[0], data_range, correlation_time)
    times = np.arange(data_range) * dt * sample_rate
    sigmas = []
    for s in starts:
        seg = flux[s : s + data_range]
        jacf = data_range * biased_acf(seg).sum(axis=-1)
        sigmas.append(
            np.trapezoid(
                jacf[:integration_range], x=times[:integration_range]
            )
        )
    denominator = (
        3 * (data_range - 1) * temperature**2 * units.boltzmann * volume
    )
    prefactor_units = units.energy / units.length / units.time
    prefactor = prefactor_units / denominator
    return prefactor, np.asarray(sigmas)


# ----------------------------------------------- generic flux-series GK
def gk_flux_acf_reference(
    series: np.ndarray,
    data_range: int,
    correlation_time: int,
    dt: float,
    sample_rate: int,
    acf_scale: float = 1.0,
):
    """Window-averaged flux ACF + running integral + SEM.

    The shared GK flow of the viscosity/thermal family
    (``green_kubo_viscosity.py:182-233``, ``green_kubo_viscosity_flux.py``,
    with the reference's ``data_range`` multiplier on the biased ACF passed
    as ``acf_scale``) in the build's window-averaged formulation (the
    reference's first-window reporting is pinned separately by
    ``gk_thermal_window_integrals_reference``). The caller applies the
    calculator-specific prefactor.

    Returns ``(acf, integral, integral_sem)`` for a (T, 3) series.
    """
    starts = _window_starts(series.shape[0], data_range, correlation_time)
    times = np.arange(data_range) * dt * sample_rate
    acf_sum = np.zeros(data_range)
    sigmas = []
    for s in starts:
        seg = series[s : s + data_range]
        jacf = acf_scale * biased_acf(seg).sum(axis=-1)
        acf_sum += jacf
        sigmas.append(cumulative_trapezoid(jacf, x=times))
    acf = acf_sum / len(starts)
    integral = cumulative_trapezoid(acf, x=times)
    sem = np.std(np.asarray(sigmas), axis=0) / np.sqrt(len(starts))
    return acf, integral, sem


# ------------------------------------------------------------------- ADF
def adf_reference(
    pos_by_species: dict,
    sample_idx: np.ndarray,
    box: np.ndarray,
    cutoff: float,
    n_bins: int,
    norm_power: int,
):
    """ADF histograms per species triple, reference counting convention.

    Ports ``angular_distribution_function.py:330-430`` +
    ``utils/neighbour_list.py:112-177``: for every central atom i, every
    ORDERED pair of distinct neighbors (j, k) within the cutoff contributes
    the angle j-i-k weighted by ``1/(|r_ij| |r_ik|)^norm_power``; only
    triple keys with non-decreasing species indices
    (``combinations_with_replacement``) are kept. Histogram over
    [0, 3.15] rad; per-batch density normalisation (:421-429); degrees via
    the literal 180/3.14159 (:457-459).
    """
    import itertools

    species = list(pos_by_species)
    concat = np.concatenate([pos_by_species[s] for s in species], axis=1)
    counts = [pos_by_species[s].shape[1] for s in species]
    sid = np.concatenate(
        [np.full(c, k, dtype=int) for k, c in enumerate(counts)]
    )
    keys = list(
        itertools.combinations_with_replacement(range(len(species)), 3)
    )
    hists = {k: np.zeros(n_bins) for k in keys}
    lo, hi = 0.0, 3.15
    bw = (hi - lo) / n_bins

    for f in sample_idx:
        pos = concat[f]
        n = pos.shape[0]
        r = pos[None, :, :] - pos[:, None, :]  # r[i, j] = pos_j - pos_i
        r -= box * np.round(r / box)
        d = np.linalg.norm(r, axis=-1)
        np.fill_diagonal(d, np.inf)
        for i in range(n):
            nb = np.where(d[i] < cutoff)[0]
            for j, k in itertools.permutations(nb, 2):
                key = (sid[i], sid[j], sid[k])
                if not (key[0] <= key[1] <= key[2]):
                    continue
                v1, v2 = r[i, j], r[i, k]
                cos = np.dot(v1, v2) / (d[i, j] * d[i, k])
                ang = np.arccos(np.clip(cos, -1.0, 1.0))
                w = 1.0 / (d[i, j] * d[i, k]) ** norm_power
                b = min(int((ang - lo) / bw), n_bins - 1)
                hists[key][b] += w

    angles_deg = np.linspace(
        lo * (180 / 3.14159), hi * (180 / 3.14159), n_bins
    )
    out = {}
    for key, h in hists.items():
        total = h.sum()
        name = "_".join(species[s] for s in key)
        out[name] = (angles_deg, h / (total * bw) if total > 0 else h)
    return out


# ------------------------------------------------ RDF post-processing chain
def cn_integral_reference(radii: np.ndarray, rdf: np.ndarray,
                          density: float) -> np.ndarray:
    """CN(r) integral exactly as the reference computes it.

    ``calculators/coordination_number_calculation.py:77-81``:
    ``4 pi rho cumtrapz(r[1:]^2 g[1:], x=r[1:])`` — note the extra leading
    point drop (the calculator already dropped radii[0]).
    """
    integral = cumulative_trapezoid(
        radii[1:] ** 2 * rdf[1:], x=radii[1:]
    )
    return 4.0 * np.pi * density * integral


def pmf_reference(rdf: np.ndarray, temperature: float) -> np.ndarray:
    """w(r) per ``calculators/potential_of_mean_force.py:199-201``:
    ``-kT ln g`` scaled by 6.242e8 (J -> "eV" with the reference's
    hard-coded factor, reproduced verbatim for parity)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return -BOLTZMANN * temperature * np.log(rdf) * 6.242e8


def kbi_reference(radii: np.ndarray, rdf: np.ndarray,
                  window: int = 17, order: int = 2) -> np.ndarray:
    """G(r) per ``calculators/kirkwood_buff_integrals.py:172-181``:
    savgol-filtered g, then ``4 pi cumtrapz((g_f[1:] - 1) r[1:]^2)``."""
    from scipy.signal import savgol_filter

    filtered = savgol_filter(np.asarray(rdf, float), window, order)
    return 4.0 * np.pi * cumulative_trapezoid(
        (filtered[1:] - 1.0) * radii[1:] ** 2, x=radii[1:]
    )


def structure_factor_reference(
    radii_ang: np.ndarray,
    rdf_by_pair: dict,
    q: np.ndarray,
    rho_0: float,
    x_frac: dict,
    form_factors: dict,
) -> dict:
    """Faber-Ziman S(q) (standard textbook expressions; the upstream
    implementation ``calculators/structure_factor.py:62-372`` is disabled
    there and omits the density factor — the build documents this
    divergence, so the oracle pins the corrected math instead):
    partial ``S_ab = 1 + 4 pi rho int r^2 (g_ab - 1) sinc(qr) dr``, total
    ``S = 1 + sum_ab (2 - delta_ab) x_a x_b f_a f_b (S_ab - 1) / <f>^2``.
    """
    f_mean = sum(x_frac[s] * form_factors[s] for s in x_frac)
    out = {}
    total = np.zeros_like(q)
    for pair, g in rdf_by_pair.items():
        qr = np.outer(q, radii_ang)
        kernel = radii_ang**2 * np.sin(qr) / qr
        s_partial = 1.0 + 4.0 * np.pi * rho_0 * np.trapezoid(
            kernel * (g - 1.0), x=radii_ang, axis=1
        )
        out[pair] = s_partial
        a, b = pair.split("_")
        factor = 1.0 if a == b else 2.0
        total += (
            factor * x_frac[a] * x_frac[b] * form_factors[a]
            * form_factors[b] / f_mean**2 * (s_partial - 1.0)
        )
    out["System"] = 1.0 + total
    return out


# --------------------------------------------------- GK self-diffusion
def gk_self_diffusion_reference(
    vel: np.ndarray, data_range: int, correlation_time: int, dt: float,
    sample_rate: int, units_length: float, units_time: float,
    integration_range: int,
):
    """``green_kubo_self_diffusion_coefficients.py:179-296``.

    Per window: biased VACF (tfp ``normalize=False, center=False``) scaled
    by ``units_length^2/units_time^2``; the running counter adds
    ``n_particles`` per window (:196) plus 1 per window in the ensemble
    loop (:334); per-window integrals for the SEM use the particle-MEAN
    VACF (:200-203); ``D = sigma[integration_range - 1] / 3`` (:288).

    Returns ``(times_si, acf, integral, integral_sem, D)``.
    """
    t, n, _ = vel.shape
    starts = _window_starts(t, data_range, correlation_time)
    vel_scale = units_length**2 / units_time**2
    times = np.arange(data_range) * dt * sample_rate * units_time
    acf_sum = np.zeros(data_range)
    count = 0
    sigmas = []
    for s in starts:
        seg = vel[s : s + data_range]  # (W, N, 3)
        acf = biased_acf(seg)  # (W, N, 3)
        acf_sum += vel_scale * np.sum(acf, axis=(1, 2))
        count += n + 1
        sigmas.append(cumulative_trapezoid(
            vel_scale * np.mean(np.sum(acf, axis=2), axis=1), x=times
        ))
    acf_avg = acf_sum / count
    sigma = cumulative_trapezoid(acf_avg, x=times)
    sem = np.std(np.array(sigmas), axis=0) / np.sqrt(len(sigmas))
    ir = min(integration_range - 1, len(sigma) - 1)
    return times, acf_avg, sigma, sem, sigma[ir] / 3.0


# ------------------------------------------- Einstein-Helfand MSD series
def eh_msd_reference(
    current_integral: np.ndarray, data_range: int, correlation_time: int,
    dt: float, sample_rate: int, prefactor: float,
):
    """``einstein_helfand_ionic_conductivity.py:142-181``: per window the
    squared difference from the window origin summed over components,
    scaled by the prefactor, averaged over windows; times stay in raw
    simulation units (the prefactor carries every conversion).

    Returns ``(times_raw, msd)`` for a system series of shape (T, 3).
    """
    t = current_integral.shape[0]
    starts = _window_starts(t, data_range, correlation_time)
    msd = np.zeros(data_range)
    for s in starts:
        seg = current_integral[s : s + data_range]
        msd += np.sum((seg - seg[0]) ** 2, axis=-1)
    msd = prefactor * msd / len(starts)
    times = np.arange(data_range) * dt * sample_rate
    return times, msd


# -------------------------------------------- distinct (cross) diffusion
def distinct_einstein_msd_reference(
    xa: np.ndarray, xb: np.ndarray, data_range: int, correlation_time: int,
    same: bool, units_length: float,
):
    """``einstein_distinct_diffusion_coefficients.py:174-265`` via the
    direct O(Na x Nb) Gram loop: per window
    ``mean_i mean_j mean_d (a_i - a_i[0])(b_j - b_j[0])``, minus the
    atom-mean self term when the species coincide
    (``_compute_self_correlation``), window-averaged, scaled by length^2.

    The build computes this through the bilinear identity
    ``mean_ij corr(a_i, b_j) == corr(mean a, mean b)`` — this oracle is
    the independent check that the identity holds numerically.
    """
    t, n_a, _ = xa.shape
    n_b = xb.shape[1]
    starts = _window_starts(t, data_range, correlation_time)
    msd = np.zeros(data_range)
    for s in starts:
        da = xa[s : s + data_range] - xa[s]  # (W, Na, 3)
        db = xb[s : s + data_range] - xb[s]
        acc = np.zeros(data_range)
        for i in range(n_a):
            for j in range(n_b):
                acc += np.mean(da[:, i] * db[:, j], axis=-1)
        acc /= n_a * n_b
        if same:
            acc -= np.mean(np.mean(da * db, axis=-1), axis=1)
        msd += acc
    return msd / len(starts) * units_length**2


def distinct_gk_vacf_reference(
    va: np.ndarray, vb: np.ndarray, data_range: int, correlation_time: int,
    same: bool, dt: float, sample_rate: int, units_length: float,
    units_time: float,
):
    """``green_kubo_distinct_diffusion_coefficients.py:230-313`` with the
    ``correlate`` helper (``utils/calculator_helper_methods.py:110-150``):
    per window ``mean_i mean_j`` of the positive-lag full correlation
    averaged over dims (via np.correlate — independent of the build's FFT
    estimator), self term subtracted for same species;
    ``D = mean_w prefactor * trapz(vacf_w, t_raw)`` with
    ``prefactor = length^2 / (time_unit * (data_range - 1))``.

    Returns ``(vacf_series, D, sem)``.
    """
    t, n_a, _ = va.shape
    n_b = vb.shape[1]
    starts = _window_starts(t, data_range, correlation_time)
    times_raw = np.arange(data_range) * dt * sample_rate
    prefactor = units_length**2 / (units_time * (data_range - 1))

    def pos_lag_corr(a, b):  # (W, 3) x (W, 3) -> (W,)
        return np.mean(
            [np.correlate(a[:, d], b[:, d], "full")[data_range - 1:]
             for d in range(a.shape[1])],
            axis=0,
        )

    vacf_total = np.zeros(data_range)
    sigmas = []
    for s in starts:
        sa = va[s : s + data_range]
        sb = vb[s : s + data_range]
        acc = np.zeros(data_range)
        for i in range(n_a):
            for j in range(n_b):
                acc += pos_lag_corr(sa[:, i], sb[:, j])
        acc /= n_a * n_b
        if same:
            acc -= np.mean(
                [pos_lag_corr(sa[:, i], sb[:, i]) for i in range(n_a)],
                axis=0,
            )
        vacf_total += acc
        sigmas.append(prefactor * np.trapezoid(acc, x=times_raw))
    sigmas = np.asarray(sigmas)
    return (
        vacf_total / len(starts),
        float(np.mean(sigmas)),
        float(np.std(sigmas) / np.sqrt(len(sigmas))),
    )
