"""Attribute the RDF kernel's residual gap to the VPU roofline by proxy.

VERDICT r3 weak #2: the headline kernel reaches ~33.5% of the modeled VPU
ceiling and the remaining ~3x was attributed only qualitatively (scratch
relayout stores, fori_loop overhead, one-hot MXU transposes, DMA waits).
This script measures a STAGED variant of the production kernel
(``ops/pallas_rdf.py``) where each arm keeps a prefix of the tile body:

  empty     fori_loop spins, one tiny accumulate    -> loop/grid overhead
  loads     + j-row loads and one-hot i-picks       -> + DMA / transpose
  geom      + displacement/min-image/distance/ids   -> + geometry VPU work
  relayout  + the 8 per-row scratch relayout stores -> + relayout cost
  full      + one-hot build and MXU contraction     -> production (local copy)
  prod      the package kernel itself               -> sanity vs `full`

Successive differences attribute the per-pair cost. Each arm runs in its
OWN process (in-process env-flag A/Bs of kernel variants silently alias
the first arm's executable — see CLAUDE.md round-2 ninth-pass learnings):

    python benchmarks/rdf_gap_bounds.py ARM        # one arm, prints JSON
    python benchmarks/rdf_gap_bounds.py driver     # all arms sequentially

Writes benchmarks/rdf_gap_bounds.json in driver mode.
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

import os

TINY = os.environ.get("RDF_GAP_TINY") == "1"  # CPU interpret smoke test
N_ATOMS = 256 if TINY else 10240
# default 4 frames/call isolates per-tile costs; the production wrapper
# picks 32 at 10k atoms (RDF_GAP_F=32 measures at that height)
N_FRAMES = 1 if TINY else int(os.environ.get("RDF_GAP_F", "4"))
N_CALLS = 1 if TINY else max(64 // N_FRAMES, 1)  # 64 frames = bench workload
N_BINS = 100 if TINY else 500
N_SPECIES = 2
BOX = 40.0
CUTOFF = 19.9

ARMS = (
    "empty", "geom", "relayout", "full", "prod",
    # structural variants attacking the two measured overheads (correct
    # histograms, verifiable against the XLA reference):
    "rowwise",   # per-row one-hots + 8 small matmuls — zero relayout stores
    "combflat",  # store the combined id only — 8 relayout stores, not 16
    "ti16",      # combflat + 16-row i-tiles (halved per-tile j-loads/overhead)
    "ti32",      # combflat + 32-row i-tiles
)
# a loads-only arm was attempted twice and REFUTED as unmeasurable: any
# consume of the raw loads/pick outputs (direct reduce, broadcast-sum
# reduce, store-then-flat-reduce) lowers to a vector.multi_reduction
# with a non-constant accumulator, which Mosaic rejects ("only constant
# accumulators supported"). loads+geometry are attributed jointly as
# geom - empty.
EXTRA_ARMS = ("loads",)


def build_variant(arm: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lammps_analysis_tpu.ops.pallas_rdf import (
        _TI,
        _j_block_for,
        _round_up,
        padded_atom_count,
    )

    ti = {"ti16": 16, "ti32": 32}.get(arm, _TI)

    @functools.partial(jax.jit, static_argnames=("n_bins", "n_species"))
    def rdf_variant(positions, species_id, cutoff, n_bins, n_species, box):
        f, n, _ = positions.shape
        n_pairs = n_species * (n_species + 1) // 2
        n_total_bins = n_pairs * n_bins
        k = min(128, _round_up(int(np.ceil(np.sqrt(n_total_bins))), 16))
        n_hi = -(-n_total_bins // k)
        hi_pad = _round_up(n_hi, 8)
        k_pad = _round_up(k, 128)
        j_block = _j_block_for(n)
        n_pad = padded_atom_count(n)
        if n_pad != n:
            positions = jnp.pad(positions, ((0, 0), (0, n_pad - n), (0, 0)))
            species_id = jnp.pad(
                species_id, (0, n_pad - n), constant_values=-1
            )
        n_blocks = n_pad // ti
        n_j_blocks = n_pad // j_block
        px = positions[..., 0]
        py = positions[..., 1]
        pz = positions[..., 2]
        sid_row = species_id.astype(jnp.float32)[None, :]
        n_win = n_pad // 128
        pxf = px.reshape(f * n_win, 128)
        pyf = py.reshape(f * n_win, 128)
        pzf = pz.reshape(f * n_win, 128)
        sidf = sid_row.reshape(n_win, 128)
        box_arr = jnp.asarray(box, dtype=jnp.float32).reshape(3)
        cutoff_f = jnp.asarray(cutoff, dtype=jnp.float32).reshape(())
        params = jnp.stack(
            [box_arr[0], box_arr[1], box_arr[2],
             1.0 / box_arr[0], 1.0 / box_arr[1], 1.0 / box_arr[2],
             cutoff_f, n_bins / cutoff_f, jnp.float32(f)]
        )[None, :]

        def kernel(px_ref, py_ref, pz_ref, pxf_ref, pyf_ref, pzf_ref,
                   sid_row_ref, sidf_ref, params_ref, out_ref, acc_ref,
                   hi_buf_ref, lo_buf_ref):
            i = pl.program_id(0)
            bx = params_ref[0, 0]
            by = params_ref[0, 1]
            bz = params_ref[0, 2]
            ibx = params_ref[0, 3]
            iby = params_ref[0, 4]
            ibz = params_ref[0, 5]
            cutoff_v = params_ref[0, 6]
            inv_bin = params_ref[0, 7]
            n_valid_i = params_ref[0, 8].astype(jnp.int32)

            @pl.when(i == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            i0 = pl.multiple_of(i * ti, ti)
            iwin = i // (128 // ti)
            off = i0 - iwin * 128
            sel = jnp.where(
                (off + jax.lax.broadcasted_iota(jnp.int32, (ti, 1), 0))
                == jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1),
                1.0, 0.0,
            )

            def pick(window):
                return jax.lax.dot_general(
                    sel, window,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            sid_i = pick(sidf_ref[pl.ds(iwin, 1), :])
            hi_ids = jax.lax.broadcasted_iota(
                jnp.int32, (hi_pad, 1), 0
            ).astype(jnp.float32)
            lo_ids = jax.lax.broadcasted_iota(
                jnp.int32, (k, 1), 0
            ).astype(jnp.float32)
            j_min = i0 // j_block
            nj_eff = n_j_blocks - j_min

            def tile_body(step, _):
                fi = step // nj_eff
                j_blk = j_min + step % nj_eff
                j0 = pl.multiple_of(j_blk * j_block, j_block)
                if arm == "empty":
                    # tiniest live accumulate: the loop must survive DCE
                    # (scalar broadcast — (1,1) vector broadcasts are
                    # illegal in Mosaic, scalars are fine)
                    acc_ref[0:1, 0:128] += step.astype(jnp.float32)
                    return 0
                xj = px_ref[fi, pl.ds(j0, j_block)][None, :]
                yj = py_ref[fi, pl.ds(j0, j_block)][None, :]
                zj = pz_ref[fi, pl.ds(j0, j_block)][None, :]
                sb = sid_row_ref[0, pl.ds(j0, j_block)][None, :]
                j_ids = j_blk * j_block + jax.lax.broadcasted_iota(
                    jnp.int32, (1, j_block), 1
                )
                rwin = fi * (n_pad // 128) + iwin
                xi = pick(pxf_ref[pl.ds(rwin, 1), :])
                yi = pick(pyf_ref[pl.ds(rwin, 1), :])
                zi = pick(pzf_ref[pl.ds(rwin, 1), :])
                if arm == "loads":
                    # consume every load via the proven store-then-
                    # reduce-flat pattern (direct reduces of broadcast
                    # sums of (M, 1) pick outputs hit a Mosaic
                    # multi_reduction rejection): one row of the
                    # broadcast sum through the scratch, then a
                    # single-sublane flat reduce.
                    s_row = xj + yj + zj + sb  # (1, TJ), 3 adds
                    t_col = xi + yi + zi + sid_i  # (TI, 1), 3 adds
                    s = t_col + s_row  # (TI, TJ) broadcast add
                    hi_buf_ref[0:1, pl.ds(0, j_block)] = s[0:1, :]
                    acc_ref[0:1, 0:128] += jnp.sum(
                        hi_buf_ref[0:1, pl.ds(0, j_block)]
                    )
                    return 0
                dx = xi - xj
                dy = yi - yj
                dz = zi - zj
                dx = dx - bx * jnp.round(dx * ibx)
                dy = dy - by * jnp.round(dy * iby)
                dz = dz - bz * jnp.round(dz * ibz)
                d = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                sa = sid_i
                lo_s = jnp.minimum(sa, sb)
                hi_s = jnp.maximum(sa, sb)
                pair_id = (
                    lo_s * n_species
                    - lo_s * (lo_s - 1.0) * 0.5
                    + (hi_s - lo_s)
                )
                bin_f = jnp.minimum(jnp.floor(d * inv_bin), n_bins - 1.0)
                combined = pair_id * n_bins + bin_f
                i_ids = i * ti + jax.lax.broadcasted_iota(
                    jnp.int32, (ti, 1), 0
                )
                mask = (
                    (j_ids > i_ids)
                    & (sa >= 0)
                    & (sb >= 0)
                    & (d < cutoff_v)
                )
                if arm in ("combflat", "ti16", "ti32"):
                    # fold the mask into an out-of-range COMBINED id and
                    # relayout only it (8 stores, not 16); the hi/lo
                    # split runs on the flat row instead (same element
                    # count). Masked pairs land at hi == hi_pad — no
                    # one-hot row matches, zero contribution (lo row 0
                    # matches but the hi column is all-zero).
                    comb_m = jnp.where(
                        mask, combined, float(hi_pad * k)
                    )
                    for r in range(ti):
                        lanes = pl.ds(r * j_block, j_block)
                        hi_buf_ref[0:1, lanes] = comb_m[r : r + 1, :]
                    cflat = hi_buf_ref[...]
                    hi_flat = jnp.floor(cflat * (1.0 / k))
                    lo_flat = cflat - hi_flat * k
                    oh_hi = jnp.where(hi_flat == hi_ids, 1.0, 0.0).astype(
                        jnp.bfloat16
                    )
                    oh_lo = jnp.where(lo_flat == lo_ids, 1.0, 0.0).astype(
                        jnp.bfloat16
                    )
                    acc_ref[:, 0:k] += jax.lax.dot_general(
                        oh_hi, oh_lo,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return 0
                hi_id = jnp.floor(combined * (1.0 / k))
                lo_id = combined - hi_id * k
                hi_id = jnp.where(mask, hi_id, float(hi_pad))
                if arm == "geom":
                    acc_ref[0:1, 0:128] += jnp.sum(hi_id) + jnp.sum(lo_id)
                    return 0
                if arm == "rowwise":
                    # no relayout at all: one-hot each (1, TJ) row and
                    # contract per row; the 8 partial products stay in
                    # registers (ONE acc RMW per tile — per-row RMWs
                    # would round-trip VMEM, the fifth-pass trap)
                    tile_acc = None
                    for r in range(ti):
                        hi_r = hi_id[r : r + 1, :]
                        lo_r = lo_id[r : r + 1, :]
                        oh_hi = jnp.where(
                            hi_r == hi_ids, 1.0, 0.0
                        ).astype(jnp.bfloat16)
                        oh_lo = jnp.where(
                            lo_r == lo_ids, 1.0, 0.0
                        ).astype(jnp.bfloat16)
                        p = jax.lax.dot_general(
                            oh_hi, oh_lo,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        tile_acc = p if tile_acc is None else tile_acc + p
                    acc_ref[:, 0:k] += tile_acc
                    return 0
                for r in range(ti):
                    lanes = pl.ds(r * j_block, j_block)
                    hi_buf_ref[0:1, lanes] = hi_id[r : r + 1, :]
                    lo_buf_ref[0:1, lanes] = lo_id[r : r + 1, :]
                hi_flat = hi_buf_ref[...]
                lo_flat = lo_buf_ref[...]
                if arm == "relayout":
                    acc_ref[0:1, 0:128] += (
                        jnp.sum(hi_flat) + jnp.sum(lo_flat)
                    )
                    return 0
                oh_hi = jnp.where(hi_flat == hi_ids, 1.0, 0.0).astype(
                    jnp.bfloat16
                )
                oh_lo = jnp.where(lo_flat == lo_ids, 1.0, 0.0).astype(
                    jnp.bfloat16
                )
                acc_ref[:, 0:k] += jax.lax.dot_general(
                    oh_hi, oh_lo,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return 0

            jax.lax.fori_loop(0, n_valid_i * nj_eff, tile_body, 0)

            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                out_ref[...] = acc_ref[...]

        out = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(
                (hi_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((hi_pad, k_pad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((hi_pad, k_pad), jnp.float32),
                pltpu.VMEM((1, ti * j_block), jnp.float32),
                pltpu.VMEM((1, ti * j_block), jnp.float32),
            ],
            interpret=TINY,
        )(px, py, pz, pxf, pyf, pzf, sid_row, sidf, params)
        return out

    return rdf_variant


def run_arm(arm: str) -> dict:
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.rdf import build_species_layout

    rng = np.random.default_rng(0)
    half = N_ATOMS // 2
    sid, n_pad, ptab, n_pairs, _ = build_species_layout(
        [half, N_ATOMS - half], pad_to=128
    )
    pos = rng.uniform(
        0, BOX, size=(N_FRAMES, n_pad, 3)
    ).astype(np.float32)
    pos_j = jnp.asarray(pos)
    sid_j = jnp.asarray(sid)
    box_j = jnp.asarray(np.array([BOX] * 3, dtype=np.float32))

    if arm == "prod":
        from lammps_analysis_tpu.ops.pallas_rdf import rdf_histogram_pallas

        def call():
            return rdf_histogram_pallas(
                pos_j, sid_j, CUTOFF, N_BINS, N_SPECIES, box_j
            )
    else:
        variant = build_variant(arm)

        def call():
            return variant(pos_j, sid_j, CUTOFF, N_BINS, N_SPECIES, box_j)

    t0 = time.perf_counter()
    first = np.asarray(call())  # compile + execute + fetch
    compile_s = time.perf_counter() - t0
    check = {}
    if arm in ("rowwise", "combflat", "ti16", "ti32", "full", "prod"):
        # the correct-histogram arms must match the independent XLA
        # reference (equal total counts — per-bin f32 boundary rounding
        # may differ between kernels, bench.py discipline)
        from lammps_analysis_tpu.ops.rdf import rdf_histogram

        ref = np.asarray(
            rdf_histogram(
                pos_j, sid_j, jnp.asarray(ptab), box_j, CUTOFF, N_BINS,
                n_pairs, i_block=256, strategy="outer",
            )
        )
        if arm in ("prod",):
            got = first
        else:
            k = min(
                128,
                -(-int(np.ceil(np.sqrt(n_pairs * N_BINS))) // 16) * 16,
            )
            got = (
                first[:, :k].reshape(-1)[: n_pairs * N_BINS]
                .reshape(n_pairs, N_BINS)
            )
        check["rel_count_err_vs_xla"] = float(
            abs(got.sum() - ref.sum()) / max(ref.sum(), 1.0)
        )
    # steady state: chained calls, block+fetch once at the end
    t0 = time.perf_counter()
    h = None
    for _ in range(N_CALLS):
        h = call()
    jax.block_until_ready(h)
    np.asarray(h)
    elapsed = time.perf_counter() - t0
    pairs = N_CALLS * N_FRAMES * N_ATOMS * (N_ATOMS - 1) / 2
    total_frames = N_CALLS * N_FRAMES
    return {
        "arm": arm,
        "compile_s": round(compile_s, 1),
        "ms_per_frame": round(elapsed / total_frames * 1e3, 3),
        "gpairs_per_s": round(pairs / elapsed / 1e9, 3),
        **check,
    }


def probe() -> float:
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


def driver():
    out = {"workload": {
        "n_atoms": N_ATOMS, "frames_per_call": N_FRAMES, "calls": N_CALLS,
        "n_bins": N_BINS, "cutoff": CUTOFF,
    }}
    out["probe_s_before"] = probe()
    import subprocess

    for arm in ARMS:
        p = subprocess.run(
            [sys.executable, __file__, arm], capture_output=True, text=True,
            timeout=1800,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if p.returncode != 0 or not line:
            out[arm] = {"error": (p.stderr or p.stdout)[-400:]}
            print(f"{arm}: FAILED", flush=True)
            continue
        out[arm] = json.loads(line[-1])
        print(line[-1], flush=True)
    out["probe_s_after"] = probe()
    # successive-difference attribution (ms/frame)
    try:
        chain = ["empty", "geom", "relayout", "full"]
        ms = {a: out[a]["ms_per_frame"] for a in chain}
        out["attribution_ms_per_frame"] = {
            "loop_grid_overhead": ms["empty"],
            "loads_geometry_ids": round(ms["geom"] - ms["empty"], 3),
            "relayout_stores": round(ms["relayout"] - ms["geom"], 3),
            "onehot_mxu": round(ms["full"] - ms["relayout"], 3),
            "full_local": ms["full"],
            "prod_package": out.get("prod", {}).get("ms_per_frame"),
        }
        for v in ("rowwise", "combflat"):
            if v in out and "ms_per_frame" in out[v]:
                out["attribution_ms_per_frame"][f"{v}_speedup_x"] = round(
                    out["prod"]["ms_per_frame"] / out[v]["ms_per_frame"], 3
                )
    except Exception as err:
        out["attribution_error"] = str(err)[:200]
    (HERE / "rdf_gap_bounds.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ARMS + EXTRA_ARMS:
        print(json.dumps(run_arm(sys.argv[1])))
    else:
        driver()
