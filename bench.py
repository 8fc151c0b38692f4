"""Headline benchmark: RDF atom-pairs/s on the available accelerator.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

``vs_baseline`` compares against the reference's TF kernel measured on CPU
(``benchmarks/tf_reference_baseline.py``; the reference publishes no numbers
— BASELINE.md): value / tf_cpu_value on the identical synthetic workload
(north star: 10240 atoms, 500 bins, minimum-image cutoff histogram).
"""

from __future__ import annotations

import json
import pathlib
import time

import numpy as np

REPO = pathlib.Path(__file__).parent
# the BASELINE.json north-star size; the TF-CPU reference kernel was
# measured on the same workload (benchmarks/tf_baseline_10k.json)
# 64 frames puts the device in steady state (per-call dispatch amortised);
# the TF-CPU baseline's pairs/s is frame-count-flat, so the per-pair
# comparison is unchanged.
WORKLOAD = dict(n_atoms=10240, n_frames=64, n_bins=500)


def measure_rdf_pairs_per_s(n_atoms, n_frames, n_bins, repeats=3,
                            consistency_check=True):
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.rdf import build_species_layout
    from lammps_analysis_tpu.parallel.sharded_ops import sharded_rdf_histogram

    rng = np.random.default_rng(0)
    box = 40.0
    cutoff = 19.9
    half = n_atoms // 2
    sid, n_pad, ptab, n_pairs, _ = build_species_layout([half, n_atoms - half],
                                                        pad_to=128)
    pos = rng.uniform(0, box, size=(n_frames, n_pad, 3)).astype(np.float32)

    pos_j = jnp.asarray(pos)
    sid_j = jnp.asarray(sid)
    ptab_j = jnp.asarray(ptab)
    box_j = jnp.asarray(np.array([box] * 3, dtype=np.float32))

    def run():
        h = sharded_rdf_histogram(
            pos_j, sid_j, ptab_j, box_j,
            cutoff=cutoff, n_bins=n_bins, n_pairs=n_pairs, i_block=128,
        )
        return h

    first = np.asarray(run())  # compile + execute + fetch
    t0 = time.perf_counter()
    h = None
    for _ in range(repeats):
        h = run()
    jax.block_until_ready(h)
    elapsed = (time.perf_counter() - t0) / repeats
    pairs = n_frames * n_atoms * (n_atoms - 1) / 2

    if not consistency_check:
        return pairs / elapsed
    # cross-kernel consistency check: the production path (Pallas on TPU)
    # must agree with the independent XLA outer-product kernel. A 4-frame
    # slice keeps the O(N^2) XLA reference cheap; the production kernel is
    # frame-batched internally so the slice exercises the same program.
    from lammps_analysis_tpu.ops.rdf import rdf_histogram

    n_check = min(4, n_frames)
    check = np.asarray(
        sharded_rdf_histogram(
            pos_j[:n_check], sid_j, ptab_j, box_j,
            cutoff=cutoff, n_bins=n_bins, n_pairs=n_pairs, i_block=128,
        )
    )
    ref = np.asarray(
        rdf_histogram(
            pos_j[:n_check], sid_j, ptab_j, box_j, cutoff, n_bins, n_pairs,
            i_block=256, strategy="outer",
        )
    )
    rel = abs(check.sum() - ref.sum()) / max(ref.sum(), 1.0)
    global _CONSISTENCY
    _CONSISTENCY = {"rel_count_err_vs_xla": float(rel)}
    return pairs / elapsed


_CONSISTENCY = {}


def _best_of(run_once, work_units, trials=3):
    """Drift-immune rate measurement: best-of-``trials`` wall-clock rate
    plus a ``process_time`` companion.

    This VM's wall clock is 2-4x noisy run-to-run (steal on the shared
    core, page-cache state) and the shared chip drifts +-35% across
    hours; a single mean-of-repeats measurement is indistinguishable
    from a regression.  The best trial is the steady-state capability;
    the process-time rate strips host steal entirely (only meaningful
    for host-executed work — on TPU it reflects dispatch cost, not the
    kernel).  Returns ``(best_wall_rate, best_pt_rate)``.
    """
    best_wall = 0.0
    best_pt = 0.0
    for _ in range(trials):
        w0 = time.perf_counter()
        p0 = time.process_time()
        run_once()
        wall = time.perf_counter() - w0
        pt = time.process_time() - p0
        best_wall = max(best_wall, work_units / wall)
        if pt > 0:
            best_pt = max(best_pt, work_units / pt)
    return best_wall, best_pt


def measure_gk_corr_frames_per_s(t=16384, n=256, window=512, stride=256,
                                 repeats=3):
    """Green-Kubo windowed-ACF throughput (particle-window-frames/s).

    Best-of-3 batches of ``repeats`` dispatches (see ``_best_of``)."""
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.correlation import windowed_acf_sum

    rng = np.random.default_rng(1)
    vel = jnp.asarray(rng.normal(size=(t, n, 3)).astype(np.float32))
    out = windowed_acf_sum(vel, window, stride)
    np.asarray(out[0])  # compile + execute + fetch

    def run_once():
        out = None
        for _ in range(repeats):
            out = windowed_acf_sum(vel, window, stride)
        jax.block_until_ready(out)

    n_windows = (t - window) // stride + 1
    work = repeats * n_windows * window * n
    return _best_of(run_once, work)


def measure_msd_wfa_per_s(t=16384, n=1024, window=512, stride=256,
                          repeats=3):
    """Windowed-MSD throughput (window-frame-atoms/s), comb formulation.

    Best-of-3 batches of ``repeats`` dispatches (see ``_best_of``)."""
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.msd import windowed_msd_sum

    rng = np.random.default_rng(3)
    x = jnp.asarray(
        np.cumsum(rng.normal(size=(t, n, 3)), axis=0).astype(np.float32)
    )
    tau = jnp.arange(window)
    out = windowed_msd_sum(x, tau, window, stride)
    np.asarray(out[0])  # compile + execute + fetch

    def run_once():
        out = None
        for _ in range(repeats):
            out = windowed_msd_sum(x, tau, window, stride)
        jax.block_until_ready(out)

    n_windows = (t - window) // stride + 1
    work = repeats * n_windows * window * n
    return _best_of(run_once, work)


def adf_firstshell_key(n_frames: int, suffix: str = "") -> str:
    """Canonical artifact key for the 10k-atom first-shell ADF pipeline
    at a given call height. One key = one workload: the call height is
    part of the name because the sort+window stage carries ~2.5 ms/frame
    of per-call cost — f2 and f16 differ ~2x and must never share a key
    (cross-artifact trap pinned by ``tests/test_bench_keys.py``)."""
    return f"adf_firstshell_ms_per_frame_f{int(n_frames)}{suffix}"


#: call height of the headline extras row (the production wrapper picks
#: f=16 at 10240 atoms — ``adf_frames_per_call``)
ADF_FIRSTSHELL_F = 16
ADF_FIRSTSHELL_KEY = adf_firstshell_key(ADF_FIRSTSHELL_F)


def measure_adf_ms_per_frame(n_atoms=10240, n_frames=2, n_bins=500,
                             cutoff=3.6, repeats=3, n_species=2,
                             stage_split=False):
    """Production ADF pipeline (z-sorted window extract + folded angle
    stage) — exactly the route the calculator runs. ``n_species`` splits
    the atoms into that many equal species (the stage-2 one-hot space
    grows with the triple count: 4 triples at 2 species, 10 at 3).

    With ``stage_split=True`` additionally times stage 1 (sort + window
    extract) alone and returns a dict — stage2+overhead = pipeline −
    stage1, the number the roofline MFU fraction is defined against
    (``benchmarks/roofline.py::adf_stage2_model``)."""
    import jax
    import jax.numpy as jnp

    from lammps_analysis_tpu.ops.adf import build_triple_table
    from lammps_analysis_tpu.ops import pallas_adf as _pk
    from lammps_analysis_tpu.parallel.sharded_ops import (
        _AdfPlan,
        _adf_pipeline,
    )

    rng = np.random.default_rng(2)
    # constant density (the 10240-atom reference geometry scaled up)
    box = 40.0 * (n_atoms / 10240.0) ** (1.0 / 3.0)
    sid = jnp.asarray(
        np.repeat(np.arange(n_species), -(-n_atoms // n_species))[:n_atoms]
        .astype(np.int32)
    )
    pos = jnp.asarray(
        rng.uniform(0, box, (n_frames, n_atoms, 3)).astype(np.float32)
    )
    box_np = np.array([box] * 3, np.float32)
    box_j = jnp.asarray(box_np)
    ttab, _ = build_triple_table(n_species)
    ttab_j = jnp.asarray(ttab)
    plan = _AdfPlan(n_atoms, box_np, cutoff, use_pallas=True)
    pipe = _adf_pipeline(plan, n_species, cutoff, n_bins, 4)

    def run():
        return pipe(pos, sid, ttab_j, box_j)[0]

    def _fetch(h):
        np.asarray(h) if not isinstance(h, tuple) else np.asarray(h[0])

    def time_ms_per_frame(fn):
        warm = fn()  # compile + execute
        jax.block_until_ready(warm)
        _fetch(warm)  # the warmup must fully DRAIN before t0: an async
        # leftover execution would bleed into the timed window
        t0 = time.perf_counter()
        h = None
        for _ in range(repeats):
            h = fn()
        jax.block_until_ready(h)
        _fetch(h)
        return (time.perf_counter() - t0) / repeats / n_frames * 1000

    pipeline_ms = time_ms_per_frame(lambda: run())
    if not stage_split:
        return pipeline_ms

    # stage 1 alone: the exact extract call the pipeline issues (same
    # plan parameters); only valid on the sorted Pallas route. Outputs
    # reduce to ONE scalar on device — the (F, Npad, K) tensors would
    # otherwise be fetched through the ~30 MB/s tunnel (~84 MB) and bury
    # the few-ms compute, exactly as the pipeline keeps them on-device.
    assert plan.use_sorted and plan.use_pallas_run and not plan.use_cells

    @jax.jit
    def run_stage1(p, s):
        r = _pk.sorted_neighbor_extract(
            p, s, box_j, cutoff, k_n=plan.k_n, e_fixed=plan.extract_e,
            w_chunks=getattr(plan, "w_chunks", None), sort=plan.sort,
            n_arcs=plan.n_arcs if plan.sort in ("brick", "brick3") else 1,
        )
        return jnp.sum(r[3]) + jnp.sum(r[5])

    stage1_ms = time_ms_per_frame(lambda: run_stage1(pos, sid))
    out = {
        "pipeline_ms": pipeline_ms,
        "stage1_ms": stage1_ms,
        "pack": plan.pack,
        "k_n": plan.k_n,
    }
    # the two timings come from separate measurements on a drifting chip:
    # when stage 1 reads at/above ~95% of the pipeline the split is
    # drift-contaminated — omit stage2 (and with it the MFU fraction)
    # rather than stamping a nonsense number
    if stage1_ms < 0.95 * pipeline_ms:
        out["stage2_plus_overhead_ms"] = pipeline_ms - stage1_ms
    return out


def measure_ingest_mb_per_s(n_frames=400, n_atoms=4000):
    """Full LAMMPS dump ingestion throughput: file -> HDF5 store.

    ~65 MB file: the old 7 MB default was dominated by fixed costs
    (project/sqlite/h5py creation) rather than the streaming rate.

    End-to-end through ``Experiment.add_data`` (native parse, flat-gather
    chunk assembly, parse/write overlap thread, h5py writes). Until r3
    this metric timed only the reader generator — the store-write leg was
    unmeasured; the number now covers the whole ingest leg the e2e
    benchmark pays.
    """
    import io
    import tempfile

    from lammps_analysis_tpu.file_io.lammps_dump import LAMMPSDumpFile

    rng = np.random.default_rng(2)
    pos = rng.uniform(0, 30, size=(n_frames, n_atoms, 3))
    buf = io.StringIO()
    for t in range(n_frames):
        buf.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n{n_atoms}\n")
        buf.write("ITEM: BOX BOUNDS pp pp pp\n0 30\n0 30\n0 30\n")
        buf.write("ITEM: ATOMS id element x y z\n")
        for i in range(n_atoms):
            buf.write(
                f"{i + 1} {'Na' if i % 2 else 'Cl'} "
                f"{pos[t, i, 0]:.8f} {pos[t, i, 1]:.8f} {pos[t, i, 2]:.8f}\n"
            )
    with tempfile.NamedTemporaryFile(
        "w", suffix=".lammpstraj", delete=False
    ) as f:
        f.write(buf.getvalue())
        path = f.name
    size_mb = pathlib.Path(path).stat().st_size / 2**20
    import lammps_analysis_tpu as latpu

    # best of 3 fresh ingests: this VM's single shared core shows 2-4x
    # run-to-run noise (page-cache state, writeback, steal); the best run
    # is the steady-state capability the e2e pipeline sees on warm cache.
    # The process_time companion strips host steal (ingest is pure host
    # work, so it is the drift-immune number).
    best = 0.0
    best_pt = 0.0
    for trial in range(3):
        with tempfile.TemporaryDirectory() as proj_dir:
            project = latpu.Project(
                name="ingest_bench", storage_path=proj_dir
            )
            exp = project.add_experiment(f"e{trial}", timestep=0.1, units="metal")
            reader = LAMMPSDumpFile(path)
            reader.spec  # metadata scan excluded from the timing
            t0 = time.perf_counter()
            p0 = time.process_time()
            exp.add_data(reader, update_with_pubchempy=False)
            elapsed = time.perf_counter() - t0
            pt = time.process_time() - p0
        best = max(best, size_mb / elapsed)
        if pt > 0:
            best_pt = max(best_pt, size_mb / pt)
    pathlib.Path(path).unlink()
    return best, best_pt


def tf_baseline_value():
    for name in ("tf_baseline_10k.json", "tf_baseline.json"):
        path = REPO / "benchmarks" / name
        if path.exists():
            return json.loads(path.read_text())["value"]
    return None


def _chip_health(timeout_s: float = 420.0):
    """Bounded TPU health probe in a THROWAWAY subprocess.

    The remote-TPU tunnel on this machine can wedge for hours; a wedged
    tunnel stalls ANY jax backend init indefinitely (observed 18 min for
    one 2 MB round trip, probes > 240 s). Probing in a subprocess keeps
    this process's jax uninitialised, so on failure it can still fall
    back to CPU. Returns ``{backend, init_first_s, probe_s}`` or None.
    """
    import subprocess
    import sys

    code = (
        "import time,numpy as np;t0=time.perf_counter();"
        "import jax,jax.numpy as jnp;a=jnp.ones((512,512));np.asarray(a@a);"
        "t1=time.perf_counter();t2=time.perf_counter();"
        "np.asarray((a+1.0)@a);t3=time.perf_counter();"
        "print('HEALTH',jax.default_backend(),round(t1-t0,1),round(t3-t2,2))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    if proc.returncode != 0:
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("HEALTH "):
            _, backend, init_s, probe_s = line.split()
            return {
                "backend": backend,
                "init_first_s": float(init_s),
                "probe_s": float(probe_s),
            }
    return None


def _last_rebaseline():
    """The most recent one-session on-chip baseline, for context when the
    current session is degraded or fell back to CPU
    (``benchmarks/rebaseline.py`` re-measures all headline numbers with
    the health probe recorded alongside)."""
    try:
        reb = json.loads(
            (pathlib.Path(__file__).parent / "benchmarks"
             / "rebaseline.json").read_text()
        )
    except Exception:
        return None
    return {
        "measured": reb.get("measured"),
        "probe_s": reb.get("probe_s"),
        "rdf_pairs_per_s": reb.get("rdf_pairs_per_s"),
        "rdf_65536_gpairs_per_s": reb.get("rdf_65536_gpairs_per_s"),
        # pre-r5 rebaseline artifacts carried the f16 workload under
        # "adf_ms_per_frame_f16" (the bare key was the f2 workload)
        ADF_FIRSTSHELL_KEY: reb.get(
            ADF_FIRSTSHELL_KEY, reb.get("adf_ms_per_frame_f16")
        ),
    }


# healthy steady-state probe is ~0.1-0.5 s; r3's official record was
# captured at probe 2.53 s and understated the build by ~36%. Anything
# above ~3x steady state is chip weather, not capability.
DEGRADED_PROBE_S = 1.5
WEDGED_PROBE_S = 20.0


def _chip_health_retry(max_attempts=3, backoff_s=(120.0, 300.0)):
    """Probe, and on a degraded (but alive) reading re-probe with bounded
    backoff — outages heal on hour scales, so a couple of spaced retries
    catch the 'elevated for minutes' tail without stalling the driver.

    Returns ``(health_or_None, attempts)`` where ``attempts`` is the list
    of observed probe_s (-1 for a timeout)."""
    attempts = []
    best = None
    for i in range(max_attempts):
        h = _chip_health()
        attempts.append(-1.0 if h is None else h["probe_s"])
        if h is None:
            # the probe subprocess TIMED OUT and was killed: a killed TPU
            # job can wedge the tunnel further (~30 min, CLAUDE.md), so
            # re-probing is near-guaranteed to fail AND may prolong the
            # outage — go straight to the CPU fallback
            return best, attempts
        if best is None or h["probe_s"] < best["probe_s"]:
            best = h
        if h["probe_s"] <= DEGRADED_PROBE_S and h["init_first_s"] <= 300.0:
            return h, attempts
        if i + 1 < max_attempts:
            time.sleep(backoff_s[min(i, len(backoff_s) - 1)])
    return best, attempts


def main():
    import os
    import sys

    forced_cpu = os.environ.get("BENCH_FORCED_CPU") == "1"
    health = None
    probe_attempts = []
    degraded = False
    if not forced_cpu:
        health, probe_attempts = _chip_health_retry()
        # probe_s > ~20 s means the tunnel is wedged-but-crawling (healthy
        # steady state is ~0.1 s; a 135 s probe was measured mid-outage):
        # a full measurement there takes hours and reports garbage. Treat
        # wedged like dead — an honest CPU number beats both.  Between
        # DEGRADED_PROBE_S and WEDGED_PROBE_S the chip is measurable but
        # drifting: measure anyway, but stamp the record as degraded and
        # embed the last healthy rebaseline so the reader can tell
        # capability from weather.
        wedged = health is not None and (
            health["probe_s"] > WEDGED_PROBE_S
            or health["init_first_s"] > 300.0
        )
        degraded = (
            health is not None and not wedged
            and health["probe_s"] > DEGRADED_PROBE_S
        )
        if health is None or wedged:
            # wedged tunnel: a TPU measurement would hang forever. Re-exec
            # on CPU so the driver still gets its one JSON line — an honest
            # (slower) number with the failure annotated beats a hang.
            env = dict(
                os.environ,
                PALLAS_AXON_POOL_IPS="",
                JAX_PLATFORMS="cpu",
                BENCH_FORCED_CPU="1",
            )
            if health is not None:
                env["BENCH_DEGRADED_PROBE_S"] = str(health["probe_s"])
            os.execve(sys.executable, [sys.executable, __file__], env)

    value = measure_rdf_pairs_per_s(**WORKLOAD)
    baseline = tf_baseline_value()
    vs = value / baseline if baseline else None
    extras = {}
    try:
        import jax

        _host_backend = jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        _host_backend = True
    try:
        gk_wall, gk_pt = measure_gk_corr_frames_per_s()
        extras["gk_corr_frames_per_s"] = round(gk_wall)
        if _host_backend and gk_pt:
            extras["gk_corr_frames_per_s_pt"] = round(gk_pt)
    except Exception as err:  # pragma: no cover
        extras["gk_error"] = str(err)[:120]
    try:
        msd_wall, msd_pt = measure_msd_wfa_per_s()
        extras["msd_window_frame_atoms_per_s"] = round(msd_wall)
        if _host_backend and msd_pt:
            extras["msd_window_frame_atoms_per_s_pt"] = round(msd_pt)
    except Exception as err:  # pragma: no cover
        extras["msd_error"] = str(err)[:120]
    try:
        ing_wall, ing_pt = measure_ingest_mb_per_s()
        extras["ingest_mb_per_s"] = round(ing_wall, 1)
        if ing_pt:
            # ingest is always host work: the process-time rate is the
            # steal-immune companion
            extras["ingest_mb_per_s_pt"] = round(ing_pt, 1)
    except Exception as err:  # pragma: no cover
        extras["ingest_error"] = str(err)[:120]
    adf = None
    try:
        import jax

        if jax.default_backend() == "tpu":
            # production call height (adf_frames_per_call picks f=16);
            # stage split makes the stage-2 MFU fraction reportable
            adf = measure_adf_ms_per_frame(
                n_frames=ADF_FIRSTSHELL_F, stage_split=True
            )
            extras[ADF_FIRSTSHELL_KEY] = round(adf["pipeline_ms"], 1)
            extras["adf_stage1_ms_per_frame"] = round(adf["stage1_ms"], 2)
    except Exception as err:  # pragma: no cover
        adf = None
        extras["adf_error"] = str(err)[:120]
    try:
        import jax

        if jax.default_backend() == "tpu":
            # large-N scaling probe: the same fused kernel at 65k atoms
            # (the XLA fallback only engages above ~300k padded atoms)
            extras["rdf_65536_gpairs_per_s"] = round(
                measure_rdf_pairs_per_s(
                    n_atoms=65536, n_frames=8, n_bins=500, repeats=2,
                    consistency_check=False,
                )
                / 1e9,
                2,
            )
    except Exception as err:  # pragma: no cover
        extras["rdf_65k_error"] = str(err)[:120]
    try:
        import jax

        if jax.default_backend() == "tpu":
            # small-system probe: tile-overhead-bound regime (the r5
            # rowwise+TI=128 chain took it 6.5 -> 10.6 Gpairs/s at the
            # kernel level; this row guards that win). 64-frame calls:
            # at 32 frames the 67 Mpair workload was DISPATCH-bound over
            # the tunnel and read 5.7 G (production-path caveat noted in
            # the README small-system row)
            extras["rdf_2048_gpairs_per_s"] = round(
                measure_rdf_pairs_per_s(
                    n_atoms=2048, n_frames=64, n_bins=500, repeats=6,
                    consistency_check=False,
                )
                / 1e9,
                2,
            )
    except Exception as err:  # pragma: no cover
        extras["rdf_2048_error"] = str(err)[:120]
    try:
        import jax

        if jax.default_backend() == "tpu":
            # 1M-atom envelope guard (r5 close-out): the production route
            # serves single-frame fused calls to PALLAS_RDF_SINGLE_FRAME_
            # N_MAX = 1048576 (flat ~20.9 Gpairs/s; 26.3 s/frame). Regressing
            # this row means the routing fix or the kernel envelope broke.
            # consistency_check stays False: the XLA reference kernel is
            # exactly the fallback that crashed the worker at this size.
            extras["rdf_1048576_gpairs_per_s"] = round(
                measure_rdf_pairs_per_s(
                    n_atoms=1048576, n_frames=1, n_bins=500, repeats=1,
                    consistency_check=False,
                )
                / 1e9,
                2,
            )
    except Exception as err:  # pragma: no cover
        extras["rdf_1m_error"] = str(err)[:120]
    extras.update(_CONSISTENCY)
    try:
        # roofline context (benchmarks/roofline.py): fraction of the
        # modeled v5e VPU ceiling (30.1 Gpairs/s at 10240 atoms/500 bins;
        # the kernel is VPU-bound, one-hot build = 78% of VPU work)
        import importlib.util as _ilu

        _spec = _ilu.spec_from_file_location(
            "latpu_roofline",
            pathlib.Path(__file__).parent / "benchmarks" / "roofline.py",
        )
        _roof = _ilu.module_from_spec(_spec)
        _spec.loader.exec_module(_roof)
        _ceiling = _roof.rdf_model()["ceiling_pairs_s"]["vpu"]
        extras["rdf_vpu_roofline_frac"] = round(value / _ceiling, 3)
        if isinstance(adf, dict):
            # ADF MFU: stage-2 fraction of its modeled VPU ceiling (the
            # angle/histogram stage the roofline models) + the modeled
            # extraction efficiency of stage 1's fixed-depth window sweep.
            # stage2 is absent when the split was drift-contaminated.
            _adf_model = _roof.adf_stage2_model(pack=adf["pack"])
            if "stage2_plus_overhead_ms" in adf:
                extras["adf_vpu_roofline_frac"] = round(
                    _adf_model["ceiling_ms_per_frame"]["vpu"]
                    / adf["stage2_plus_overhead_ms"],
                    3,
                )
            else:
                extras["adf_split_note"] = (
                    "stage1 >= 95% of pipeline in separate timings — "
                    "drift-contaminated split, MFU fraction omitted"
                )
            extras["adf_extraction_efficiency"] = round(
                _adf_model["extraction_efficiency"], 3
            )
    except Exception as err:  # pragma: no cover
        extras["roofline_error"] = str(err)[:120]
    if health is not None:
        # chip-state context: this shared chip drifts +-35%; probe_s far
        # above ~0.1-0.5 s steady-state flags a degraded session
        extras["chip_probe_s"] = health["probe_s"]
        extras["chip_init_first_s"] = health["init_first_s"]
    if probe_attempts and len(probe_attempts) > 1:
        extras["chip_probe_attempts_s"] = probe_attempts
    if degraded:
        # measurable-but-drifting chip (probe above ~3x steady state):
        # the numbers below are weather-contaminated — the embedded
        # rebaseline is the last known-healthy capability
        extras["degraded"] = True
        reb = _last_rebaseline()
        if reb is not None:
            extras["last_onchip_rebaseline"] = reb
    if forced_cpu:
        degraded_s = os.environ.get("BENCH_DEGRADED_PROBE_S")
        extras["backend_note"] = (
            "remote TPU tunnel unhealthy "
            + (
                f"(512x512 probe {degraded_s} s; healthy ~0.1 s)"
                if degraded_s
                else "(512x512 probe timed out)"
            )
            + "; CPU fallback measurement"
        )
        reb = _last_rebaseline()
        if reb is not None:
            extras["last_onchip_rebaseline"] = reb
    print(
        json.dumps(
            {
                "metric": "rdf_atom_pairs_per_s",
                "value": value,
                "unit": "pairs/s",
                "vs_baseline": vs,
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
