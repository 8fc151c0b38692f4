"""Host VACF throughput vs slab length at the e2e GK-diffusion shapes.

The planner (scale_factor 150) hands GreenKuboDiffusionCoefficients
~6.8k-frame slabs at 10k atoms.  CLAUDE.md's third-pass note says the
windowed FFT ACF amortises better with bigger slabs (13.8 vs 5.3 M
wfa/s on the flux series) — this sweep checks whether that holds for
the per-particle VACF (10k atoms x 3 dims), where each slab is ~60x
larger per frame, and records compile time per distinct slab shape.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/vacf_slab_sweep.py
"""

import json
import pathlib
import time

import numpy as np

import jax
import jax.numpy as jnp

from lammps_analysis_tpu.ops.correlation import windowed_acf_sum

W, STRIDE, N_ATOMS, D = 512, 256, 10_000, 3
rng = np.random.default_rng(0)

rows = []
for t_slab in (1792, 3328, 6912, 13824, 27648):
    x = jnp.asarray(
        rng.standard_normal((t_slab, N_ATOMS, D)).astype(np.float32)
    )
    n_windows = (t_slab - W) // STRIDE + 1
    t0 = time.perf_counter()
    s, pw = windowed_acf_sum(x, W, STRIDE)
    jax.block_until_ready((s, pw))
    compile_and_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    s, pw = windowed_acf_sum(x, W, STRIDE)
    jax.block_until_ready((s, pw))
    warm = time.perf_counter() - t0
    _ = np.asarray(s)
    wfa = n_windows * W * N_ATOMS
    rows.append(
        {
            "t_slab": t_slab,
            "n_windows": n_windows,
            "first_call_s": round(compile_and_first, 2),
            "warm_s": round(warm, 2),
            "wfa_per_s_warm": round(wfa / warm),
            "gib_in": round(x.nbytes / 2**30, 2),
        }
    )
    print(rows[-1], flush=True)
    del x

out = pathlib.Path(__file__).parent / "vacf_slab_sweep.json"
out.write_text(json.dumps({"window": W, "stride": STRIDE,
                           "n_atoms": N_ATOMS, "rows": rows}, indent=1))
print("wrote", out)
