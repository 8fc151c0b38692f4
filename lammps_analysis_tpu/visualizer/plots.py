"""2-D result plotting (matplotlib backend).

Replaces the reference's bokeh grid plots
(``mdsuite/visualizer/d2_data_visualization.py:36-140``; bokeh is not in the
image) with matplotlib figures written under the experiment's ``figures/``
directory — same artifact contract (one figure per analysis, one panel per
subject).
"""

from __future__ import annotations

import logging
import pathlib
from typing import List

import numpy as np

log = logging.getLogger(__name__)


def plot_series_results(
    computation,
    series_keys: List[str],
    out_dir,
    title: str = "analysis",
) -> pathlib.Path:
    """Plot each subject's (x, y) series into one grid figure -> PNG path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if len(series_keys) < 2:
        raise ValueError("need at least x and y series keys to plot")
    x_key, y_key = series_keys[0], series_keys[1]

    subjects = [
        s for s in computation.keys() if x_key in computation[s] and y_key in computation[s]
    ]
    if not subjects:
        raise ValueError(f"No subjects with series ({x_key}, {y_key}) to plot")

    n = len(subjects)
    ncols = min(n, 3)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(5 * ncols, 3.5 * nrows), squeeze=False
    )
    for i, subject in enumerate(subjects):
        ax = axes[i // ncols][i % ncols]
        data = computation[subject]
        x = np.asarray(data[x_key], dtype=float)
        y = np.asarray(data[y_key], dtype=float)
        m = min(len(x), len(y))
        ax.plot(x[:m], y[:m], lw=1.2)
        ax.set_title(subject, fontsize=10)
        ax.set_xlabel(x_key)
        ax.set_ylabel(y_key)
        ax.grid(alpha=0.3)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.suptitle(title)
    fig.tight_layout()

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"{title}.png"
    fig.savefig(path, dpi=110)
    plt.close(fig)
    log.info("wrote %s", path)
    return path
