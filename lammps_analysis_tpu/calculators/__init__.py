"""Calculators: observables computed from stored trajectories."""
from .base import Calculator, TrajectoryCalculator  # noqa: F401
from .einstein_diffusion_coefficients import EinsteinDiffusionCoefficients  # noqa: F401
from .green_kubo_diffusion_coefficients import GreenKuboDiffusionCoefficients  # noqa: F401
from .radial_distribution_function import RadialDistributionFunction  # noqa: F401

ALL_CALCULATORS = {
    cls.__name__: cls
    for cls in (
        RadialDistributionFunction,
        EinsteinDiffusionCoefficients,
        GreenKuboDiffusionCoefficients,
    )
}
