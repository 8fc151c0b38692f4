"""Staged-arm attribution INSIDE the ADF window extract (r5).

The jrow refutation (``adf_jrow_ab.json``) eliminated the value-store
theory of the extract's cost; the e-curves had already shown extraction
arithmetic is marginal, and the op-count model puts loads+geometry at a
few percent of the measured stage. So where do the ~35-48 ms/frame at
65k live? This script measures successive-prefix arms of the production
kernel (one process per arm — source variants must never share a
process):

  empty      chunk loop spins (window addressing + tiny accumulate)
  loadsgeom  + j-loads, displacement/min-image/distance, mask, key build
             (consumed via the store-then-flat-reduce trick that Mosaic
             accepts; no extraction, no cleanup)
  stores     + the key/value scratch stores of the lean layout
  noclean    + the e_fixed sweep-1 extractions (cleanup REMOVED — rows
             denser than e per chunk are silently dropped; timing-valid,
             results not)
  full       the production kernel (local copy; sanity vs package)

Successive differences attribute ms/frame. Shapes: 65536@f1 (brick,
production plan) and 10240@f16 (z).

Run on a healthy chip:  python benchmarks/adf_extract_arms.py driver
Writes benchmarks/adf_extract_arms.json.
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

ARMS = ("empty", "loadsgeom", "stores", "noclean", "full")
# follow-up arms (r5 second pass): "emptyslim" carries ONLY the (tc, 1)
# slot vector through the chunk fori (accumulators zeroed at the end) —
# if much faster than "empty", the ~0.78 us/iteration anomaly is the
# 33-vreg carry round-tripping per iteration of the dynamic-bound loop.
EXTRA_ARMS = ("emptyslim", "emptyhalf", "emptynofill")
SHAPES = ((65536, 1), (10240, 16))
CUTOFF = 3.6
REPS = 4
TINY = os.environ.get("ADF_ARMS_TINY") == "1"


def build_variant(arm: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lammps_analysis_tpu.ops.pallas_adf import (
        _EMPTY,
        _TAKEN,
        _round_up,
    )

    @functools.partial(
        jax.jit,
        static_argnames=("k_n", "tc", "e_fixed", "w_chunks", "n_arcs"),
    )
    def extract_variant(positions, species_id, box, cutoff, window,
                        k_n, tc, e_fixed, w_chunks, n_arcs):
        f, n, _ = positions.shape
        n_pad = _round_up(n, 128)
        assert n_pad == n  # callers pre-pad
        nc_pad = n_pad
        n_blocks = nc_pad // tc
        px = positions[..., 0].astype(jnp.float32)[:, None, :]
        py = positions[..., 1].astype(jnp.float32)[:, None, :]
        pz = positions[..., 2].astype(jnp.float32)[:, None, :]
        pxc = positions[..., 0].astype(jnp.float32).reshape(f * nc_pad, 1)
        pyc = positions[..., 1].astype(jnp.float32).reshape(f * nc_pad, 1)
        pzc = positions[..., 2].astype(jnp.float32).reshape(f * nc_pad, 1)
        sid_f = species_id.astype(jnp.float32)
        per_frame_sid = species_id.ndim == 2
        sid_row = sid_f[:, None, :] if per_frame_sid else sid_f[None, None, :]
        sid_col = (
            sid_f.reshape(f * nc_pad, 1) if per_frame_sid else sid_f[:, None]
        )
        box_arr = jnp.asarray(box, jnp.float32).reshape(3)
        cutoff_f = jnp.asarray(cutoff, jnp.float32).reshape(())
        inv_box = 1.0 / box_arr
        params = jnp.stack(
            [box_arr[0], box_arr[1], box_arr[2],
             inv_box[0], inv_box[1], inv_box[2],
             cutoff_f, jnp.float32(1.0), jnp.float32(0.0)]
        )[None, :]
        n_chunks_all = n_pad // 128
        sw = min(w_chunks, n_chunks_all)

        def kernel(px_ref, py_ref, pz_ref, pxc_ref, pyc_ref, pzc_ref,
                   sid_row_ref, sid_col_ref, params_ref, win_ref,
                   out_rx_ref, out_ry_ref, out_rz_ref, out_d_ref,
                   out_sid_ref, out_cnt_ref,
                   keys_ref, dxs_ref, dys_ref, dzs_ref, sids_ref):
            bx = params_ref[0, 0]
            by = params_ref[0, 1]
            bz = params_ref[0, 2]
            ibx = params_ref[0, 3]
            iby = params_ref[0, 4]
            ibz = params_ref[0, 5]
            cutoff_v = params_ref[0, 6]
            mic = params_ref[0, 7]
            i_off = params_ref[0, 8]
            ib = pl.program_id(1)

            xi = pxc_ref[...]
            yi = pyc_ref[...]
            zi = pzc_ref[...]
            si = sid_col_ref[...]
            i_ids = i_off + (ib * tc + jax.lax.broadcasted_iota(
                jnp.int32, (tc, 1), 0
            )).astype(jnp.float32)
            slot_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, k_n), 1
            ).astype(jnp.float32)
            sid0 = jnp.full((tc, k_n), -1.0, jnp.float32)
            zk = jnp.zeros((tc, k_n), jnp.float32)
            slot0 = jnp.zeros((tc, 1), jnp.float32)

            def take_min(carry, keys_w, vals_w):
                rxa, rya, rza, sa, slot = carry
                cur = jnp.min(keys_w, axis=1, keepdims=True)
                m_sel = keys_w == cur
                keys_w = jnp.where(m_sel, _TAKEN, keys_w)
                ok = (cur < _EMPTY) & (slot < float(k_n))
                okf = jnp.where(ok, 1.0, 0.0)
                ohb = (slot_iota == slot) & ok

                def pick(vw):
                    return jnp.sum(
                        jnp.where(m_sel, vw, 0.0), axis=1, keepdims=True
                    )

                def put(acc, val):
                    return acc + jnp.where(ohb, val, 0.0)

                vx, vy, vz, vs = vals_w
                rxa = put(rxa, pick(vx))
                rya = put(rya, pick(vy))
                rza = put(rza, pick(vz))
                sa = put(sa, pick(vs) + 1.0)
                slot = slot + okf
                return (rxa, rya, rza, sa, slot), keys_w

            def chunk_work(c, s, carry):
                c0 = pl.multiple_of(c * 128, 128)
                s0 = pl.multiple_of(s * 128, 128)
                lanes = pl.ds(c0, 128)
                slanes = pl.ds(s0, 128)
                if arm == "empty":
                    # keep the loop live with the scalar-broadcast
                    # accumulate (tiny)
                    rxa, rya, rza, sa, slot = carry
                    rxa = rxa + (c + s).astype(jnp.float32) * 0.0
                    return (rxa, rya, rza, sa, slot)
                if arm in ("emptyslim", "emptyhalf", "emptynofill"):
                    slot = carry
                    return slot + (c + s).astype(jnp.float32) * 0.0
                xjc = px_ref[0, 0:1, lanes]
                yjc = py_ref[0, 0:1, lanes]
                zjc = pz_ref[0, 0:1, lanes]
                sjc = sid_row_ref[0, 0:1, lanes]
                dxc = xi - xjc
                dyc = yi - yjc
                dzc = zi - zjc
                dxc = dxc - mic * bx * jnp.round(dxc * ibx)
                dyc = dyc - mic * by * jnp.round(dyc * iby)
                dzc = dzc - mic * bz * jnp.round(dzc * ibz)
                dc = jnp.sqrt(dxc * dxc + dyc * dyc + dzc * dzc)
                jc = (c0 + jax.lax.broadcasted_iota(
                    jnp.int32, (1, 128), 1
                )).astype(jnp.float32)
                validc = (
                    (dc < cutoff_v)
                    & (jc != i_ids)
                    & (sjc >= 0.0)
                    & (si >= 0.0)
                )
                sidc = sjc + 0.0 * i_ids
                chunk = jnp.where(validc, jc + 0.0 * i_ids, _EMPTY)
                if arm == "loadsgeom":
                    # consume chunk + values via the store-then-reduce
                    # trick (direct reduces of these hit the Mosaic
                    # multi_reduction rejection)
                    dxs_ref[:, slanes] = chunk + sidc
                    rxa, rya, rza, sa, slot = carry
                    sa = sa + jnp.sum(
                        dxs_ref[0:1, slanes], axis=1, keepdims=True
                    ) * 0.0
                    return (rxa, rya, rza, sa, slot)
                dxs_ref[:, slanes] = dxc
                dys_ref[:, slanes] = dyc
                dzs_ref[:, slanes] = dzc
                sids_ref[:, slanes] = sidc
                if arm == "stores":
                    keys_ref[:, slanes] = chunk
                    return carry
                vals = (dxc, dyc, dzc, sidc)
                for _ in range(e_fixed):
                    carry, chunk = take_min(carry, chunk, vals)
                keys_ref[:, slanes] = chunk
                return carry

            init = (
                slot0 if arm in ("emptyslim", "emptyhalf", "emptynofill")
                else (zk, zk, zk, sid0, slot0)
            )
            if arm != "emptynofill":
                keys_ref[...] = jnp.full(
                    (tc, sw * 128), _EMPTY, jnp.float32
                )
            carry = init
            w_off = jnp.asarray(0, jnp.int32)
            for a in range(n_arcs):
                a_start = win_ref[0, 0, 2 * a]
                a_cnt = jnp.clip(win_ref[0, 0, 2 * a + 1], 0, sw - w_off)
                if arm == "emptyhalf":
                    # SAME tiny body, HALF the trip count: if this halves
                    # the empty time, the floor is per-iteration loop
                    # mechanics and a paired-chunk body wins it back
                    a_cnt_loop = a_cnt // 2
                else:
                    a_cnt_loop = a_cnt

                def chunk_body(t, carry, a_start=a_start, w_off=w_off):
                    cw = a_start + t
                    cw = jnp.where(
                        cw >= n_chunks_all, cw - n_chunks_all, cw
                    )
                    return chunk_work(cw, w_off + t, carry)

                carry = jax.lax.fori_loop(0, a_cnt_loop, chunk_body, carry)
                w_off = w_off + a_cnt

            if arm in ("full", "noclean"):
                left = jnp.max(jnp.sum(
                    jnp.where(keys_ref[...] < _EMPTY, 1.0, 0.0), axis=1
                )).astype(jnp.int32)
                if arm == "noclean":
                    left = left * 0

                def cleanup(_, carry):
                    vals = (
                        dxs_ref[...], dys_ref[...], dzs_ref[...],
                        sids_ref[...],
                    )
                    carry, keys_w = take_min(carry, keys_ref[...], vals)
                    keys_ref[...] = keys_w
                    return carry

                carry = jax.lax.fori_loop(0, left, cleanup, carry)
            if arm in ("emptyslim", "emptyhalf", "emptynofill"):
                carry = (zk, zk, zk, sid0, carry)
            rxa, rya, rza, sa, slot = carry
            out_rx_ref[...] = rxa
            out_ry_ref[...] = rya
            out_rz_ref[...] = rza
            out_d_ref[...] = jnp.sqrt(rxa * rxa + rya * rya + rza * rza)
            out_sid_ref[...] = sa
            out_cnt_ref[...] = slot

        grid = (f, n_blocks)
        row_spec = pl.BlockSpec(
            (1, 1, n_pad), lambda fi, ib: (fi, 0, 0),
            memory_space=pltpu.VMEM,
        )
        col_spec = pl.BlockSpec(
            (tc, 1), lambda fi, ib: (fi * n_blocks + ib, 0),
            memory_space=pltpu.VMEM,
        )
        sid_row_spec = (
            row_spec if per_frame_sid else pl.BlockSpec(
                (1, 1, n_pad), lambda fi, ib: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        sid_col_spec = (
            col_spec if per_frame_sid else pl.BlockSpec(
                (tc, 1), lambda fi, ib: (ib, 0), memory_space=pltpu.VMEM
            )
        )
        k_spec = pl.BlockSpec(
            (tc, k_n), lambda fi, ib: (fi * n_blocks + ib, 0),
            memory_space=pltpu.VMEM,
        )
        cnt_spec = pl.BlockSpec(
            (tc, 1), lambda fi, ib: (fi * n_blocks + ib, 0),
            memory_space=pltpu.VMEM,
        )
        k_shape = jax.ShapeDtypeStruct((f * nc_pad, k_n), jnp.float32)
        win_spec = pl.BlockSpec(
            (1, 1, 2 * n_arcs), lambda fi, ib: (fi * n_blocks + ib, 0, 0),
            memory_space=pltpu.SMEM,
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[row_spec] * 3 + [col_spec] * 3
            + [sid_row_spec, sid_col_spec]
            + [pl.BlockSpec(memory_space=pltpu.SMEM), win_spec],
            out_specs=[k_spec] * 5 + [cnt_spec],
            out_shape=[k_shape] * 5
            + [jax.ShapeDtypeStruct((f * nc_pad, 1), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((tc, sw * 128), jnp.float32)
            ] * 5,
            interpret=TINY,
        )(px, py, pz, pxc, pyc, pzc, sid_row, sid_col, params,
          window.astype(jnp.int32).reshape(f * n_blocks, 1, 2 * n_arcs))
        return outs

    return extract_variant


def run_arm(arm: str, n_atoms: int, f: int) -> dict:
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops import pallas_adf as _pk
    from lammps_analysis_tpu.parallel.sharded_ops import _AdfPlan

    box = 40.0 * (n_atoms / 10240.0) ** (1.0 / 3.0)
    box_np = np.array([box] * 3, np.float32)
    box_j = jnp.asarray(box_np)
    rng = np.random.default_rng(5)
    pos = jnp.asarray(
        rng.uniform(0, box, (f, n_atoms, 3)).astype(np.float32)
    )
    sid = jnp.asarray(
        np.repeat(np.arange(2), -(-n_atoms // 2))[:n_atoms].astype(np.int32)
    )
    plan = _AdfPlan(n_atoms, box_np, CUTOFF, use_pallas=True)
    if TINY:
        plan.use_sorted = True
        plan.sort = "z"
        plan.extract_e = 2
        plan.w_chunks = 3
        plan._normalise()
    sort = plan.sort
    n_arcs = plan.n_arcs if sort in ("brick", "brick3") else 1
    n_pad = -(-n_atoms // 128) * 128
    wc = min(plan.w_chunks, n_pad // 128)
    tc = _pk._extract_tc_windowed(n_pad, wc)

    if sort == "brick3":
        sort_fn = lambda p, s: _pk._brick3_sort(p, s, box_j, CUTOFF)
    elif sort == "brick":
        sort_fn = lambda p, s: _pk._brick_sort(p, s, box_j, CUTOFF)
    else:
        sort_fn = lambda p, s: _pk._spatial_sort(p, s, box_j)
    pos_s, sid_s = jax.block_until_ready(jax.jit(sort_fn)(pos, sid))
    if sort in ("brick", "brick3"):
        win = _pk._chunk_arcs(
            pos_s, sid_s, box_j, CUTOFF, tc, max(n_arcs, 1)
        )[0]
    else:
        win = _pk._chunk_window(pos_s, sid_s, box_j, CUTOFF, tc)
    win = jax.block_until_ready(win)

    variant = build_variant(arm)

    def sumcall():
        r = variant(pos_s, sid_s, box_j, CUTOFF, win,
                    k_n=plan.k_n, tc=tc, e_fixed=plan.extract_e,
                    w_chunks=wc, n_arcs=n_arcs)
        return r[3].sum() + r[5].sum()

    fn = jax.jit(sumcall)
    t0 = time.perf_counter()
    first = float(np.asarray(fn()))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    o = None
    for _ in range(REPS):
        o = fn()
    jax.block_until_ready(o)
    np.asarray(o)
    ms = (time.perf_counter() - t0) / REPS / f * 1e3
    return {
        "arm": arm, "n_atoms": n_atoms, "f": f, "sort": sort, "tc": tc,
        "e": plan.extract_e, "w_chunks": wc,
        "compile_s": round(compile_s, 1),
        "ms_per_frame": round(ms, 3),
        "checksum": first,
    }


def probe():
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
    out = {"probe_s_before": probe()}
    if out["probe_s_before"] < 0 or out["probe_s_before"] > 20:
        print(json.dumps({**out, "aborted": "chip unhealthy"}))
        return
    for n_atoms, f in SHAPES:
        rows = {}
        for arm in ARMS:
            p = subprocess.run(
                [sys.executable, __file__, arm, str(n_atoms), str(f)],
                capture_output=True, text=True, timeout=1800,
            )
            lines = [ln for ln in p.stdout.splitlines()
                     if ln.startswith("{")]
            if p.returncode != 0 or not lines:
                rows[arm] = {"error": (p.stderr or p.stdout)[-300:]}
                print(f"{arm}@{n_atoms}: FAILED", flush=True)
                continue
            rows[arm] = json.loads(lines[-1])
            print(lines[-1], flush=True)
        try:
            ms = {a: rows[a]["ms_per_frame"] for a in ARMS}
            rows["attribution_ms_per_frame"] = {
                "loop_window_overhead": ms["empty"],
                "loads_geometry_mask": round(
                    ms["loadsgeom"] - ms["empty"], 3),
                "scratch_stores": round(ms["stores"] - ms["loadsgeom"], 3),
                "sweep_extractions": round(ms["noclean"] - ms["stores"], 3),
                "cleanup": round(ms["full"] - ms["noclean"], 3),
                "full": ms["full"],
            }
        except Exception as err:
            rows["attribution_error"] = str(err)[:200]
        out[str(n_atoms)] = rows
    out["probe_s_after"] = probe()
    (HERE / "adf_extract_arms.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] in ARMS + EXTRA_ARMS:
        print(json.dumps(run_arm(sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]))))
    else:
        driver()
