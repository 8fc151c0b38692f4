"""Plotting and visualization (matplotlib backend)."""
from .plots import plot_series_results  # noqa: F401
