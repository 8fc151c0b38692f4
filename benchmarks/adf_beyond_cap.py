"""One hardware point BEYOND the 262,144-atom ADF window cap (VERDICT r5
ask #5).

The auto route hands off from the windowed sorted extract to cell lists
above ``_JCAP_WINDOWED`` (262144 padded atoms,
``parallel/sharded_ops.py`` cells_floor); until r5 no committed
measurement exercised that handoff — the "cells only win beyond the
cap" claim was extrapolated from a 131k A/B. This script measures ONE
row at 393,216 atoms (1.5x the cap) through ``sharded_adf_histogram``'s
production auto routing (n_frames=1), plus the 262,144 point on the
windowed route in the same session for the handoff ratio.

The routing flip itself is pinned by a CPU test
(``tests/test_multidevice.py::test_adf_routing_flips_to_cells_above_cap``).

Run on a healthy chip: ``python benchmarks/adf_beyond_cap.py``
Appends the row to ``benchmarks/large_n_scaling.json`` under
``"adf_beyond_cap"`` and prints it.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

CUTOFF = 3.6
N_BINS = 500
N_BEYOND = 655360
N_AT_CAP = 524288


def probe():
    import subprocess

    code = (
        "import time,numpy as np,jax,jax.numpy as jnp;"
        "a=jnp.ones((512,512));np.asarray(a@a);"
        "t=time.perf_counter();np.asarray((a+1.0)@a);"
        "print('P',round(time.perf_counter()-t,2))"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=420)
    for line in p.stdout.splitlines():
        if line.startswith("P "):
            return float(line.split()[1])
    return -1.0


def measure(n_atoms):
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.adf import build_triple_table
    from lammps_analysis_tpu.parallel.sharded_ops import (
        _AdfPlan,
        sharded_adf_histogram,
    )

    box = 40.0 * (n_atoms / 10240.0) ** (1.0 / 3.0)
    box_np = np.array([box] * 3, np.float32)
    rng = np.random.default_rng(5)
    pos = jnp.asarray(
        rng.uniform(0, box, (1, n_atoms, 3)).astype(np.float32)
    )
    sid = jnp.asarray(
        np.repeat(np.arange(2), -(-n_atoms // 2))[:n_atoms].astype(np.int32)
    )
    ttab, n_triples = build_triple_table(2)
    plan = _AdfPlan(n_atoms, box_np, CUTOFF, use_pallas=True)
    row = {
        "n_atoms": n_atoms,
        "route": "cells" if plan.use_cells else (
            f"windowed-{plan.sort}" if plan.use_sorted else "unsorted"
        ),
    }

    def run():
        return sharded_adf_histogram(
            pos, sid, jnp.asarray(ttab), jnp.asarray(box_np),
            cutoff=CUTOFF, n_bins=N_BINS, n_triples=n_triples,
        )

    t0 = time.perf_counter()
    h = np.asarray(run())  # compile + execute + fetch
    row["compile_s"] = round(time.perf_counter() - t0, 1)
    assert np.isfinite(h).all() and h.sum() > 0
    reps = 2
    t0 = time.perf_counter()
    o = None
    for _ in range(reps):
        o = run()
    import jax

    jax.block_until_ready(o)
    np.asarray(o)
    row["ms_per_frame"] = round((time.perf_counter() - t0) / reps * 1e3, 1)
    return row


def main():
    out = {"probe_s_before": probe()}
    if out["probe_s_before"] < 0 or out["probe_s_before"] > 20:
        print(json.dumps({**out, "aborted": "chip unhealthy"}))
        return
    out["at_cap"] = measure(N_AT_CAP)
    print(json.dumps(out["at_cap"]), flush=True)
    out["beyond_cap"] = measure(N_BEYOND)
    print(json.dumps(out["beyond_cap"]), flush=True)
    out["probe_s_after"] = probe()
    path = HERE / "large_n_scaling.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    data["adf_beyond_cap"] = out
    path.write_text(json.dumps(data, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
