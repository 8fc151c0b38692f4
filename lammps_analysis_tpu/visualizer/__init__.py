"""Plotting and visualization (matplotlib backend)."""
from .plots import plot_series_results  # noqa: F401
from .trajectory_visualizer import TrajectoryVisualizer  # noqa: F401
