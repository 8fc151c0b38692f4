"""Calculators: observables computed from stored trajectories."""
from .base import Calculator, TrajectoryCalculator  # noqa: F401
from .angular_distribution_function import AngularDistributionFunction  # noqa: F401
from .distinct_diffusion_coefficients import (  # noqa: F401
    EinsteinDistinctDiffusionCoefficients,
    GreenKuboDistinctDiffusionCoefficients,
)
from .einstein_diffusion_coefficients import EinsteinDiffusionCoefficients  # noqa: F401
from .green_kubo_diffusion_coefficients import GreenKuboDiffusionCoefficients  # noqa: F401
from .post_processing import (  # noqa: F401
    CoordinationNumbers,
    KirkwoodBuffIntegral,
    NernstEinsteinIonicConductivity,
    PotentialOfMeanForce,
    StructureFactor,
)
from .radial_distribution_function import RadialDistributionFunction  # noqa: F401
from .spatial_distribution_function import SpatialDistributionFunction  # noqa: F401
from .system_calculators import (  # noqa: F401
    EinsteinHelfandIonicConductivity,
    EinsteinHelfandThermalConductivity,
    EinsteinHelfandThermalKinaci,
    GreenKuboIonicConductivity,
    GreenKuboThermalConductivity,
    GreenKuboViscosity,
    GreenKuboViscosityFlux,
)

ALL_CALCULATORS = {
    cls.__name__: cls
    for cls in (
        RadialDistributionFunction,
        AngularDistributionFunction,
        EinsteinDiffusionCoefficients,
        GreenKuboDiffusionCoefficients,
        EinsteinDistinctDiffusionCoefficients,
        GreenKuboDistinctDiffusionCoefficients,
        GreenKuboIonicConductivity,
        EinsteinHelfandIonicConductivity,
        NernstEinsteinIonicConductivity,
        GreenKuboThermalConductivity,
        EinsteinHelfandThermalConductivity,
        EinsteinHelfandThermalKinaci,
        GreenKuboViscosity,
        GreenKuboViscosityFlux,
        CoordinationNumbers,
        PotentialOfMeanForce,
        KirkwoodBuffIntegral,
        StructureFactor,
        SpatialDistributionFunction,
    )
}
