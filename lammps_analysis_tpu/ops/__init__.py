"""Device kernels: geometry, histograms, correlation, MSD, RDF, ADF."""
from .correlation import acf_biased, cross_correlation_biased, windowed_acf_sum  # noqa: F401
from .geometry import minimum_image, pair_distances, wrap_coordinates  # noqa: F401
from .histogram import histogram_fixed_width, masked_histogram  # noqa: F401
from .msd import windowed_msd_sum  # noqa: F401
from .rdf import build_species_layout, rdf_histogram  # noqa: F401
from .adf import adf_histogram, build_triple_table  # noqa: F401
