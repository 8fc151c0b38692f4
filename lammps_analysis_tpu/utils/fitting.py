"""Host-side fitting helpers for Einstein-type calculators.

Port of the *behavior* of ``mdsuite/utils/calculator_helper_methods.py:41-107``
(``fit_einstein_curve``): pick the fit onset where the MSD curve becomes
linear (vanishing second derivative of a quartic spline), then produce an
incremental series of linear fits whose final member is the reported
gradient. Stays on host (scipy) by design — this is cheap post-processing.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.interpolate import UnivariateSpline
from scipy.optimize import curve_fit


def _line(x, m, a):
    return m * x + a


def fit_einstein_curve(
    x_data: np.ndarray, y_data: np.ndarray, fit_max_index: int
) -> Tuple[np.ndarray, np.ndarray, list, list]:
    """Fit a line to the diffusive regime of an MSD curve.

    Returns ``(popt, pcov, gradients, gradient_errors)`` with identical
    semantics to the reference helper: the onset index is where the
    quartic-spline second derivative is smallest (values below 1e-5 snapped
    to zero), gradients accumulate fits over growing windows, and the fit at
    ``fit_max_index`` is the reported one.
    """
    x_data = np.asarray(x_data, dtype=float)
    y_data = np.asarray(y_data, dtype=float)

    spline = UnivariateSpline(x_data, y_data, s=0, k=4)
    second_deriv = spline.derivative(n=2)(x_data)
    second_deriv[np.abs(second_deriv) < 1e-5] = 0
    start_index = int(np.argmin(np.abs(second_deriv)))

    popt: np.ndarray = np.array([0.0, 0.0])
    pcov: np.ndarray = np.full((2, 2), np.inf)
    gradients, gradient_errors = [], []
    for i in range(start_index + 2, len(y_data)):
        popt_i, pcov_i = curve_fit(
            _line, xdata=x_data[start_index:i], ydata=y_data[start_index:i]
        )
        gradients.append(popt_i[0])
        gradient_errors.append(np.sqrt(np.diag(pcov_i))[0])
        if i == fit_max_index:
            popt, pcov = popt_i, pcov_i
    if not gradients:  # degenerate short series: single fit over everything
        popt, pcov = curve_fit(_line, xdata=x_data, ydata=y_data)
        gradients.append(popt[0])
        gradient_errors.append(np.sqrt(np.diag(pcov))[0])
    return popt, pcov, gradients, gradient_errors
