"""Property -> producing-transformation registry.

Drives automatic dependency resolution for calculators and transformations
(reference: ``mdsuite/transformations/transformation_dict.py:46-62`` and the
string switcher ``calculators/transformations_reference.py:27-34``).
"""

from __future__ import annotations


from .coordinate_transforms import (
    CoordinateUnwrapper,
    CoordinateWrapper,
    ScaleCoordinates,
    UnwrapViaIndices,
    VelocityFromPositions,
)
from .flux_transforms import (
    IntegratedHeatCurrent,
    IonicCurrent,
    KinaciIntegratedHeatCurrent,
    MomentumFlux,
    ThermalFlux,
    TranslationalDipoleMoment,
)
from .map_molecules import MolecularMap

#: property name -> list of transformation classes able to produce it,
#: in preference order.
PROPERTY_TO_TRANSFORMATION = {
    "Unwrapped_Positions": [CoordinateUnwrapper, UnwrapViaIndices],
    "Positions": [CoordinateWrapper, ScaleCoordinates],
    "Velocities_From_Positions": [VelocityFromPositions],
    "Ionic_Current": [IonicCurrent],
    "Translational_Dipole_Moment": [TranslationalDipoleMoment],
    "Thermal_Flux": [ThermalFlux],
    "Integrated_Heat_Current": [IntegratedHeatCurrent],
    "Kinaci_Heat_Current": [KinaciIntegratedHeatCurrent],
    "Momentum_Flux": [MomentumFlux],
}

ALL_TRANSFORMATIONS = {
    cls.__name__: cls
    for cls in (
        CoordinateUnwrapper,
        UnwrapViaIndices,
        CoordinateWrapper,
        ScaleCoordinates,
        VelocityFromPositions,
        IonicCurrent,
        TranslationalDipoleMoment,
        ThermalFlux,
        IntegratedHeatCurrent,
        KinaciIntegratedHeatCurrent,
        MomentumFlux,
        MolecularMap,
    )
}


def transformation_for_property(
    prop_name: str, experiment=None, species: str = None
):
    """Instantiate the preferred producer of ``prop_name`` (or None).

    With experiment context, unwrapping prefers the dump's own image
    counters when they are stored (reference ``_unwrap_choice``,
    ``calculators/trajectory_calculator.py:181-194``).
    """
    classes = PROPERTY_TO_TRANSFORMATION.get(prop_name)
    if not classes:
        return None
    if (
        prop_name == "Unwrapped_Positions"
        and experiment is not None
        and species is not None
        and experiment.store.check_existence(f"{species}/Box_Images")
    ):
        return UnwrapViaIndices()
    return classes[0]()
