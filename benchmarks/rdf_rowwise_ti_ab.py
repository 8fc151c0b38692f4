"""Taller i-tiles under the rowwise RDF tile body (r5 follow-up).

The r4 tile-height lever stopped at TI=32 because the FLAT variant's
(hi_pad + k, TI*TJ) bf16 one-hot pair hit the 16 MB scoped-VMEM limit.
The shipped rowwise body (r5) has no flat pair — its live tensors are
per-row (hi_pad/k, TJ) one-hots plus the (TI, TJ) id tiles — so TI=64
and TI=128 become compilable and the per-tile j-loads/loop overhead
would halve again IF the compiler doesn't spill the taller id tiles.

Interleaved same-run A/B at the production call heights; exact-count
verified per arm. Writes ``benchmarks/rdf_rowwise_ti_ab.json``.
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

SHAPES = ((10240, 32, 4), (65536, 8, 2))
TIS = (32, 64, 128)
N_BINS = 500
N_SPECIES = 2
REPS = 4
BOX = 40.0
CUTOFF = 19.9


def build_rowwise(ti):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lammps_analysis_tpu.ops.pallas_rdf import (
        _j_block_for,
        _round_up,
        padded_atom_count,
    )

    @functools.partial(jax.jit, static_argnames=("n_bins", "n_species"))
    def rdf_rowwise(positions, species_id, cutoff, n_bins, n_species, box):
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
        assert n_pad % ti == 0
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
                   sid_row_ref, sidf_ref, params_ref, out_ref, acc_ref):
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
            # at ti >= 128 the i-rows span whole folded windows; the
            # one-hot transpose pick generalises (sel covers ti rows of
            # up to one 128-lane window each; ti must divide into 128
            # or be a multiple of it — we restrict to ti in {32,64,128})
            iwin = i * ti // 128 if ti >= 128 else i // (128 // ti)
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
                hi_id = jnp.floor(combined * (1.0 / k))
                lo_id = combined - hi_id * k
                hi_id = jnp.where(mask, hi_id, float(hi_pad))
                tile_acc = None
                for r in range(ti):
                    oh_hi = jnp.where(
                        hi_id[r : r + 1, :] == hi_ids, 1.0, 0.0
                    ).astype(jnp.bfloat16)
                    oh_lo = jnp.where(
                        lo_id[r : r + 1, :] == lo_ids, 1.0, 0.0
                    ).astype(jnp.bfloat16)
                    p = jax.lax.dot_general(
                        oh_hi, oh_lo,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    tile_acc = p if tile_acc is None else tile_acc + p
                acc_ref[:, 0:k] += tile_acc
                return 0

            jax.lax.fori_loop(0, n_valid_i * nj_eff, tile_body, 0)

            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                out_ref[...] = acc_ref[...]

        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(
                (hi_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((hi_pad, k_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((hi_pad, k_pad), jnp.float32)],
        )(px, py, pz, pxf, pyf, pzf, sid_row, sidf, params)

    return rdf_rowwise


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


def main():
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.rdf import build_species_layout

    out = {"probe_s_before": probe()}
    if out["probe_s_before"] < 0 or out["probe_s_before"] > 20:
        print(json.dumps({**out, "aborted": "chip unhealthy"}))
        return

    for n_atoms, f, n_calls in SHAPES:
        rng = np.random.default_rng(0)
        half = n_atoms // 2
        sid, n_pad, ptab, n_pairs, _ = build_species_layout(
            [half, n_atoms - half], pad_to=128
        )
        pos = jnp.asarray(
            rng.uniform(0, BOX, size=(f, n_pad, 3)).astype(np.float32)
        )
        sid_j = jnp.asarray(sid)
        box_j = jnp.asarray(np.array([BOX] * 3, np.float32))
        arms = {}
        ref_hist = None
        for ti in TIS:
            fn = build_rowwise(ti)

            def call(fn=fn):
                return fn(pos, sid_j, CUTOFF, N_BINS, N_SPECIES, box_j)

            try:
                h = np.asarray(call())
            except Exception as err:
                arms[ti] = {"error": str(err)[-200:]}
                continue
            if ref_hist is None:
                ref_hist = h
            arms[ti] = {
                "call": call,
                "identical_to_ti32": bool(np.array_equal(h, ref_hist)),
            }
        # interleaved timing over the arms that compiled
        live = [ti for ti in TIS if "call" in arms.get(ti, {})]
        times = {ti: [] for ti in live}
        for _ in range(REPS):
            for ti in live:
                call = arms[ti]["call"]
                t0 = time.perf_counter()
                h = None
                for _ in range(n_calls):
                    h = call()
                jax.block_until_ready(h)
                np.asarray(h)
                times[ti].append(time.perf_counter() - t0)
        row = {"n_atoms": n_atoms, "f": f}
        pairs_per_seg = n_calls * f * n_atoms * (n_atoms - 1) / 2
        for ti in TIS:
            if ti not in live:
                row[f"ti{ti}"] = arms.get(ti, {})
                continue
            med = float(np.median(times[ti]))
            row[f"ti{ti}"] = {
                "ms_per_frame": round(med / (n_calls * f) * 1e3, 3),
                "gpairs_per_s": round(pairs_per_seg / med / 1e9, 2),
                "identical_to_ti32": arms[ti]["identical_to_ti32"],
                "segments_s": [round(t, 3) for t in times[ti]],
            }
        out[str(n_atoms)] = row
        print(json.dumps(row), flush=True)
    out["probe_s_after"] = probe()
    (HERE / "rdf_rowwise_ti_ab.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
