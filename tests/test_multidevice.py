"""Multi-device agreement: 1-device and 8-device meshes must give identical
results (SURVEY §4: the TPU analog of the reference's batched-vs-full
equivalence testing). Runs on the virtual 8-CPU-device mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_analysis_tpu.ops import adf as adf_ops
from lammps_analysis_tpu.ops import rdf as rdf_ops
from lammps_analysis_tpu.parallel import (
    make_data_mesh,
    sharded_adf_histogram,
    sharded_rdf_histogram,
    sharded_windowed_msd,
    use_mesh,
)


@pytest.fixture()
def system(rng):
    counts = [24, 16]
    box = np.array([5.0, 5.0, 5.0], np.float64)
    sid, n_pad, ptab, n_pairs, _ = rdf_ops.build_species_layout(counts, pad_to=8)
    pos = np.zeros((16, n_pad, 3))
    pos[:, : sum(counts)] = rng.uniform(0, 5, size=(16, sum(counts), 3))
    return sid, n_pad, ptab, n_pairs, pos, box


def test_rdf_1_vs_8_devices(system):
    sid, n_pad, ptab, n_pairs, pos, box = system
    results = {}
    for n_dev in (1, 8):
        with use_mesh(make_data_mesh(n_dev)):
            h = sharded_rdf_histogram(
                jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
                jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
                i_block=8,
            )
        results[n_dev] = np.asarray(h)
    np.testing.assert_array_equal(results[1], results[8])


def test_rdf_remainder_frames(system):
    """Frame count not divisible by device count: tail must be exact."""
    sid, n_pad, ptab, n_pairs, pos, box = system
    pos = pos[:13]  # 13 frames over 8 devices -> main 8 + tail 5
    results = {}
    for n_dev in (1, 8):
        with use_mesh(make_data_mesh(n_dev)):
            h = sharded_rdf_histogram(
                jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
                jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
                i_block=8,
            )
        results[n_dev] = np.asarray(h)
    np.testing.assert_array_equal(results[1], results[8])


def test_adf_1_vs_8_devices(system):
    sid, n_pad, ptab, n_pairs, pos, box = system
    ttab, order = adf_ops.build_triple_table(2)
    results = {}
    for n_dev in (1, 8):
        with use_mesh(make_data_mesh(n_dev)):
            h = sharded_adf_histogram(
                jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
                jnp.asarray(box), cutoff=2.0, n_bins=36,
                n_triples=len(order), c_block=8,
            )
        results[n_dev] = np.asarray(h)
    np.testing.assert_allclose(results[1], results[8], rtol=1e-6)


def test_msd_1_vs_8_devices(rng):
    pos = np.cumsum(rng.normal(size=(60, 24, 3)), axis=0)
    tau = jnp.arange(16)
    results = {}
    for n_dev in (1, 8):
        with use_mesh(make_data_mesh(n_dev)):
            s, nw = sharded_windowed_msd(
                jnp.asarray(pos), tau, window=16, stride=8
            )
        results[n_dev] = np.asarray(s)
    np.testing.assert_allclose(results[1], results[8], rtol=1e-12)


def test_msd_remainder_particles(rng):
    """Particle count not divisible by device count."""
    pos = np.cumsum(rng.normal(size=(40, 13, 3)), axis=0)
    tau = jnp.arange(8)
    results = {}
    for n_dev in (1, 8):
        with use_mesh(make_data_mesh(n_dev)):
            s, _ = sharded_windowed_msd(
                jnp.asarray(pos), tau, window=8, stride=8
            )
        results[n_dev] = np.asarray(s)
    np.testing.assert_allclose(results[1], results[8], rtol=1e-12)


def test_graft_entry_multichip():
    """The driver's dryrun contract must keep passing."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_rdf_2d_mesh_matches_1d(system):
    """(data, atoms) 2-D mesh RDF == single-device counts exactly."""
    from lammps_analysis_tpu.parallel.mesh import make_2d_mesh
    from lammps_analysis_tpu.parallel.sharded_ops import (
        sharded_rdf_histogram_2d,
    )

    sid, n_pad, ptab, n_pairs, pos, box = system
    ref = np.asarray(
        rdf_ops.rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
            i_block=8,
        )
    )
    mesh = make_2d_mesh(data=2, atoms=4)
    h = np.asarray(
        sharded_rdf_histogram_2d(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
            mesh=mesh,
        )
    )
    np.testing.assert_array_equal(h, ref)


def test_rdf_pallas_vmem_fallback(system, monkeypatch):
    """Beyond the verified single-frame envelope the backend must
    silently fall back to the XLA kernel (exercised here by shrinking
    the budget AND the single-frame cap; in production this is the
    padded-N > 1048576 regime — below it a single frame always routes to
    the fused kernel, see test_rdf_frames_per_call_covers_verified_large_n)."""
    from lammps_analysis_tpu.parallel import sharded_ops

    sid, n_pad, ptab, n_pairs, pos, box = system
    ref = np.asarray(
        rdf_ops.rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
            i_block=8,
        )
    )
    monkeypatch.setattr(sharded_ops, "PALLAS_RDF_VMEM_BUDGET", 1)
    monkeypatch.setattr(sharded_ops, "PALLAS_RDF_SINGLE_FRAME_N_MAX", 0)
    with use_mesh(make_data_mesh(1)):
        h = np.asarray(
            sharded_rdf_histogram(
                jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
                jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
                i_block=8, use_pallas=True,
            )
        )
    np.testing.assert_array_equal(h, ref)


def _batched_reference(pos, sid, ttab, box, batches, **kw):
    """Old calculator loop: per-batch host fetch + f64 normalisation."""
    n_bins = kw["n_bins"]
    bin_width = kw.pop("bin_width")
    total = np.zeros((kw["n_triples"], n_bins))
    for s, e in batches:
        h = np.asarray(
            sharded_adf_histogram(
                jnp.asarray(pos[s:e]), sid, ttab, box, **kw
            ),
            dtype=np.float64,
        )
        for t in range(kw["n_triples"]):
            tot = h[t].sum()
            if tot > 0:
                total[t] += h[t] / (tot * bin_width)
    return total


@pytest.mark.parametrize("tiled", [False, True])
def test_adf_batch_runner_matches_loop(system, tiled):
    """AdfBatchRunner (deferred sync, device-side normalisation) must match
    the per-batch host loop it replaced."""
    from lammps_analysis_tpu.ops.adf import ADF_BIN_RANGE
    from lammps_analysis_tpu.parallel.sharded_ops import AdfBatchRunner

    sid, n_pad, ptab, n_pairs, pos, box = system
    ttab, order = adf_ops.build_triple_table(2)
    n_bins = 36
    lo, hi = ADF_BIN_RANGE
    bin_width = (hi - lo) / n_bins
    sid_j, ttab_j, box_j = jnp.asarray(sid), jnp.asarray(ttab), jnp.asarray(box)
    kw = dict(cutoff=2.0, n_bins=n_bins, n_triples=len(order), c_block=8,
              tiled=tiled)
    batches = [(0, 6), (6, 12), (12, 16)]  # uneven tail on purpose
    ref = _batched_reference(
        pos, sid_j, ttab_j, box_j, batches, bin_width=bin_width, **kw
    )

    runner = AdfBatchRunner(
        n_atoms=n_pad, species_id=sid_j, triple_table=ttab_j, box=box_j,
        normalize_per_batch=bin_width, **kw,
    )
    while True:
        for s, e in batches:
            runner.feed(jnp.asarray(pos[s:e]))
        out = runner.finalize()
        if out is not None:
            break
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-6, atol=1e-12)


def test_adf_batch_runner_saturation_retry(system):
    """Force a saturating first plan: finalize() must demand a re-feed and
    the final result must equal the one-shot path."""
    from lammps_analysis_tpu.parallel.sharded_ops import AdfBatchRunner

    sid, n_pad, ptab, n_pairs, pos, box = system
    ttab, order = adf_ops.build_triple_table(2)
    kw = dict(cutoff=4.0, n_bins=24, n_triples=len(order), tiled=True)
    runner = AdfBatchRunner(
        n_atoms=n_pad, species_id=jnp.asarray(sid),
        triple_table=jnp.asarray(ttab), box=jnp.asarray(box), **kw,
    )
    runner.plan.k_n = 8  # far below the in-cutoff count at cutoff 4.0
    runner.plan._normalise()
    runner._reset()
    rounds = 0
    while True:
        rounds += 1
        for s, e in ((0, 8), (8, 16)):
            runner.feed(jnp.asarray(pos[s:e]))
        out = runner.finalize()
        if out is not None:
            break
    assert rounds > 1, "expected at least one saturation escalation"
    ref = sharded_adf_histogram(
        jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
        jnp.asarray(box), **kw,
    )
    # batch-summed f32 histograms reassociate vs the one-shot kernel
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_adf_pipeline_topk_pallas_branch_traces():
    """Large N + cells inapplicable + Pallas angle stage: the top_k stage-1
    branch must define its (absent) counts — this corner raised NameError
    at trace time before the fix. Shape-level trace only (eval_shape)."""
    from lammps_analysis_tpu.parallel.sharded_ops import (
        _AdfPlan,
        _adf_pipeline,
    )

    n = 20480  # > _JCAP, so the unsorted extract kernel is unavailable
    box = np.array([7.0, 7.0, 7.0], np.float32)  # < 3 cells per edge
    cutoff = 2.8
    plan = _AdfPlan(n, box, cutoff, use_pallas=True)
    assert not plan.use_cells
    # this corner is reached when a window overflow disabled the sorted
    # route at a size the unsorted extract cannot take
    plan.use_sorted = False
    plan.w_chunks = None
    if not plan.use_pallas_run:
        plan.k_n = 128
        plan._normalise()
    assert plan.use_pallas_run
    pipeline = _adf_pipeline(plan, 2, cutoff, 24, 4)
    ttab, order = adf_ops.build_triple_table(2)
    out = jax.eval_shape(
        pipeline,
        jax.ShapeDtypeStruct((1, n, 3), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct(ttab.shape, jnp.int32),
        jax.ShapeDtypeStruct((3,), jnp.float32),
    )
    assert out[0].shape == (len(order), 24)


def test_rdf_routes_to_2d_mesh(system):
    """sharded_rdf_histogram under a (data, atoms) mesh must route to the
    tensor-parallel kernel and still produce exact counts."""
    from lammps_analysis_tpu.parallel.mesh import make_2d_mesh

    sid, n_pad, ptab, n_pairs, pos, box = system
    ref = np.asarray(
        rdf_ops.rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
            i_block=8,
        )
    )
    mesh = make_2d_mesh(data=2, atoms=4)
    h = np.asarray(
        sharded_rdf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ptab),
            jnp.asarray(box), cutoff=2.4, n_bins=60, n_pairs=n_pairs,
            mesh=mesh,
        )
    )
    np.testing.assert_array_equal(h, ref)


def test_msd_2d_mesh_uses_all_devices(rng):
    """Windowed MSD on a (data, atoms) mesh shards particles over all
    axes and still matches the single-device sum."""
    from lammps_analysis_tpu.parallel.mesh import make_2d_mesh

    pos = np.cumsum(rng.normal(size=(40, 24, 3)), axis=0)
    tau = jnp.arange(8)
    ref, _ = sharded_windowed_msd(
        jnp.asarray(pos), tau, window=8, stride=8,
        mesh=make_data_mesh(1),
    )
    s, _ = sharded_windowed_msd(
        jnp.asarray(pos), tau, window=8, stride=8,
        mesh=make_2d_mesh(data=2, atoms=4),
    )
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref), rtol=1e-12)


def test_acf_1_vs_8_devices(rng):
    """Particle-sharded windowed ACF: 1-device and 8-device meshes agree,
    including the per-window particle-mean (count-weighted across shards)
    and a remainder-particle tail."""
    from lammps_analysis_tpu.parallel.sharded_ops import sharded_windowed_acf

    vel = jnp.asarray(rng.normal(size=(60, 19, 3)))  # 19: remainder tail
    results = {}
    for n_dev in (1, 8):
        s, pw = sharded_windowed_acf(
            vel, window=16, stride=8, mesh=make_data_mesh(n_dev)
        )
        results[n_dev] = (np.asarray(s), np.asarray(pw))
    np.testing.assert_allclose(results[1][0], results[8][0], rtol=1e-12)
    np.testing.assert_allclose(results[1][1], results[8][1], rtol=1e-12)


def test_adf_2d_mesh_matches_1d(system):
    """ADF on a (data, atoms) mesh shards frames over all axes."""
    from lammps_analysis_tpu.parallel.mesh import make_2d_mesh

    sid, n_pad, ptab, n_pairs, pos, box = system
    ttab, order = adf_ops.build_triple_table(2)
    kw = dict(cutoff=2.0, n_bins=36, n_triples=len(order), c_block=8)
    ref = np.asarray(
        sharded_adf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
            jnp.asarray(box), mesh=make_data_mesh(1), **kw,
        )
    )
    h = np.asarray(
        sharded_adf_histogram(
            jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
            jnp.asarray(box), mesh=make_2d_mesh(data=2, atoms=4), **kw,
        )
    )
    np.testing.assert_allclose(h, ref, rtol=1e-6)


@pytest.mark.parametrize("force_pack", [None, 1])
def test_adf_pipeline_sorted_extract_matches_unsorted(rng, monkeypatch,
                                                      force_pack):
    """The full sorted-extract pipeline route (Morton sort + chunk-skip
    extract + per-frame-centers angle stage) must match the unsorted
    Pallas route, at the plan's natural packing and at pack=1."""
    import functools

    from lammps_analysis_tpu.ops import pallas_adf as PK
    from lammps_analysis_tpu.parallel.sharded_ops import (
        _AdfPlan,
        _adf_pipeline,
    )

    f, n, box_l, cutoff, n_bins = 2, 256, 9.0, 2.0, 36
    pos = rng.uniform(0, box_l, (f, n, 3)).astype(np.float32)
    sid = np.repeat(np.arange(2), n // 2).astype(np.int32)
    ttab, order = adf_ops.build_triple_table(2)
    box = np.array([box_l] * 3, np.float32)
    args = (jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
            jnp.asarray(box))

    # CPU can only execute the kernels in interpret mode
    for fn in ("sorted_neighbor_extract", "_neighbor_extract_pallas",
               "adf_stage2_auto"):
        monkeypatch.setattr(
            PK, fn, functools.partial(getattr(PK, fn), interpret=True)
        )

    results = {}
    for use_sorted in (False, True):
        plan = _AdfPlan(n, box, cutoff, use_pallas=True)
        if not plan.use_pallas_run:
            plan.k_n = 128
            plan._normalise()
        if force_pack is not None:
            plan.pack = force_pack
        plan.use_sorted = use_sorted
        assert plan.use_pallas_run
        h, mc, _ = _adf_pipeline(plan, 2, cutoff, n_bins, 4)(*args)
        results[use_sorted] = np.asarray(h)
        assert int(mc) < plan.k_n
    np.testing.assert_allclose(
        results[True], results[False], rtol=1e-5, atol=1e-6
    )
    assert results[True].sum() > 0


def test_adf_routes_to_2d_mesh(rng, monkeypatch):
    """sharded_adf_histogram under a (data, atoms) mesh must route to the
    center-stripe tensor-parallel pipeline and match the 1-device result."""
    import functools

    from lammps_analysis_tpu.ops import pallas_adf as PK
    from lammps_analysis_tpu.parallel import sharded_ops as SO
    from lammps_analysis_tpu.parallel.mesh import make_2d_mesh

    f, n, box_l, cutoff, n_bins = 4, 1024, 16.0, 2.4, 36
    pos = rng.uniform(0, box_l, (f, n, 3)).astype(np.float32)
    sid = np.repeat(np.arange(2), n // 2).astype(np.int32)
    ttab, order = adf_ops.build_triple_table(2)
    box = np.array([box_l] * 3, np.float32)
    args = (jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
            jnp.asarray(box))
    kw = dict(cutoff=cutoff, n_bins=n_bins, n_triples=len(order))

    # CPU executes the kernels in interpret mode; force the Pallas plan
    for fn in ("sorted_neighbor_extract", "sorted_neighbor_extract_stripe",
               "_neighbor_extract_pallas", "adf_stage2_auto"):
        monkeypatch.setattr(
            PK, fn, functools.partial(getattr(PK, fn), interpret=True)
        )
    real_plan = SO._AdfPlan

    def pallas_plan(n_avail, box_, cutoff_, use_pallas):
        p = real_plan(n_avail, box_, cutoff_, use_pallas=True)
        # the sorted route gates on n >= 4096 (interpret mode would crawl
        # there) — force it so the stripe path actually engages
        p.use_sorted = True
        p.w_chunks = -(-n_avail // 128)
        return p

    monkeypatch.setattr(SO, "_AdfPlan", pallas_plan)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    ref = np.asarray(sharded_adf_histogram(*args, **kw, tiled=True))

    mesh = make_2d_mesh(data=2, atoms=4)
    h2d = np.asarray(
        sharded_adf_histogram(*args, **kw, tiled=True, mesh=mesh)
    )
    np.testing.assert_allclose(h2d, ref, rtol=1e-5, atol=1e-6)
    assert h2d.sum() > 0


def test_adf_window_overflow_retries_unsorted(rng, monkeypatch):
    """An undersized window bound must flow: overflow flag -> escalate
    disables the sorted route -> the retry reproduces the unsorted
    result — no silent under-counting."""
    import functools

    from lammps_analysis_tpu.ops import pallas_adf as PK
    from lammps_analysis_tpu.parallel.sharded_ops import (
        _AdfPlan,
        _adf_tiled_framesharded,
    )

    f, n, box_l, cutoff, n_bins = 2, 256, 9.0, 2.0, 36
    pos = rng.uniform(0, box_l, (f, n, 3)).astype(np.float32)
    sid = np.repeat(np.arange(2), n // 2).astype(np.int32)
    ttab, order = adf_ops.build_triple_table(2)
    box = np.array([box_l] * 3, np.float32)
    args = (jnp.asarray(pos), jnp.asarray(sid), jnp.asarray(ttab),
            jnp.asarray(box))

    for fn in ("sorted_neighbor_extract", "_neighbor_extract_pallas",
               "adf_stage2_auto"):
        monkeypatch.setattr(
            PK, fn, functools.partial(getattr(PK, fn), interpret=True)
        )

    def make_plan(w_chunks):
        plan = _AdfPlan(n, box, cutoff, use_pallas=True)
        if not plan.use_pallas_run:
            plan.k_n = 128
            plan._normalise()
        plan.use_sorted = True
        plan.w_chunks = w_chunks
        return plan

    from lammps_analysis_tpu.parallel.mesh import make_data_mesh

    mesh = make_data_mesh(1)
    ref_plan = make_plan(None)
    ref_plan.use_sorted = False
    ref = np.asarray(_adf_tiled_framesharded(
        *args, cutoff, n_bins, 2, 4, ref_plan, mesh, 1
    ))
    # bound of 1 chunk: every block's 2-chunk window overflows
    plan = make_plan(1)
    h = np.asarray(_adf_tiled_framesharded(
        *args, cutoff, n_bins, 2, 4, plan, mesh, 1
    ))
    assert not plan.use_sorted  # escalate disabled the sorted route
    np.testing.assert_allclose(h, ref, rtol=1e-5, atol=1e-6)


def test_adf_frames_per_call_route_aware(monkeypatch):
    """The TPU tiled route sizes frames-per-feed from its LINEAR footprint
    (the quadratic plan collapses to 1 frame and leaves the pipeline
    dispatch-bound); off-TPU and below the tiled threshold it defers to
    the planner."""
    from lammps_analysis_tpu.parallel import sharded_ops as so

    box = np.array([40.0] * 3, np.float32)
    # off-TPU: keep the planner's batch
    assert so.adf_frames_per_call(10240, box, 3.6, 8 << 30) == 1
    monkeypatch.setattr(so.jax, "default_backend", lambda: "tpu")
    # budget-rich: the measured f=16 sweet spot caps the call height
    assert so.adf_frames_per_call(10240, box, 3.6, 8 << 30) == 16
    # memory-bound at very large N: the linear model shrinks the call
    box_big = box * (262144 / 10240) ** (1 / 3)
    f_big = so.adf_frames_per_call(262144, box_big, 3.6, 8 << 30)
    assert 1 <= f_big < 16
    # tiny systems keep the gram route untouched
    assert so.adf_frames_per_call(1024, np.array([20.0] * 3), 3.6, 8 << 30) == 1


def test_adf_plan_statistical_k_and_chunk_gate():
    """The plan's K bound is statistical (mean + 6*sqrt + 16, 128-mult on
    TPU) and the fold lane-chunking gate engages only when the typical
    row leaves whole 128-lane chunks free (expected < K - 128) — both
    measured on v5e (K 384 -> 256 at cutoff 6.0 was 1.43x; chunking at
    full rows was a 13% loss)."""
    from lammps_analysis_tpu.parallel.sharded_ops import _AdfPlan

    box = np.array([40.0] * 3, np.float32)
    # first shell: expected ~33 -> floor K=128, no chunking possible
    p = _AdfPlan(10240, box, 3.6, use_pallas=True)
    assert p.k_n == 128 and not p.fold_chunk
    # cutoff 5.5: expected ~112 -> K=256, typical row frees chunk 1
    p = _AdfPlan(10240, box, 5.5, use_pallas=True)
    assert p.k_n == 256 and p.fold_chunk
    # cutoff 6.0: expected ~145 -> K=256 (the old 2x margin gave 384),
    # no free chunk for the typical row -> gate off
    p = _AdfPlan(10240, box, 6.0, use_pallas=True)
    assert p.k_n == 256 and not p.fold_chunk
    # saturation doubling keeps the gate consistent with the new K
    p.escalate(p.k_n, 0)  # max_count == k_n means clipped
    assert p.k_n == 512 and p.fold_chunk  # expected 145 < 512 - 128


def test_adf_routing_flips_to_cells_above_cap():
    """The ADF auto route must hand off from the windowed sorted extract
    to cell lists EXACTLY above ``_JCAP_WINDOWED`` (the windowed
    scratch's 262144-atom cap) — the claim measured on hardware by
    ``benchmarks/adf_beyond_cap.py`` (VERDICT r5 ask #5)."""
    from lammps_analysis_tpu.ops.pallas_adf import _JCAP_WINDOWED
    from lammps_analysis_tpu.parallel.sharded_ops import _AdfPlan

    def plan_for(n):
        box = 40.0 * (n / 10240.0) ** (1.0 / 3.0)
        return _AdfPlan(n, np.array([box] * 3, np.float32), 3.6,
                        use_pallas=True)

    at_cap = plan_for(_JCAP_WINDOWED)
    assert not at_cap.use_cells and at_cap.use_sorted
    beyond = plan_for(_JCAP_WINDOWED + 128)
    assert beyond.use_cells, (
        "auto route must flip to cells above the windowed cap"
    )


def test_rdf_frames_per_call_covers_verified_large_n():
    """The fused-kernel chunker must keep serving single-frame calls up
    to the hardware-verified 1048576-atom cap (the 16x many-frame VMEM
    model floors to 0 above ~320k and the old code then routed to the
    XLA fallback, which crashed the TPU worker at 393216 — r5 large-N
    measurement), and fall back to XLA only beyond the cap."""
    from lammps_analysis_tpu.parallel.sharded_ops import (
        PALLAS_RDF_SINGLE_FRAME_N_MAX,
        pallas_rdf_frames_per_call,
    )

    assert pallas_rdf_frames_per_call(10240) == 32  # many-frame regime
    assert pallas_rdf_frames_per_call(262144) == 1
    assert pallas_rdf_frames_per_call(393216) == 1  # the crash size
    assert pallas_rdf_frames_per_call(PALLAS_RDF_SINGLE_FRAME_N_MAX) == 1
    assert (
        pallas_rdf_frames_per_call(PALLAS_RDF_SINGLE_FRAME_N_MAX + 2048)
        == 0
    )  # beyond the verified envelope: XLA fallback


# ------------------------------------------- calculator-level equality
def _nacl_experiment(tmp_path, name):
    """A small two-species experiment streamed from the store."""
    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.database import (
        PropertyInfo,
        SpeciesInfo,
        TrajectoryChunkData,
        TrajectoryMetadata,
    )
    from lammps_analysis_tpu.file_io import ScriptInput

    rng_ = np.random.default_rng(77)
    n_frames, box = 120, 8.0
    pos = rng_.uniform(0, box, size=(n_frames, 20, 3))
    unwrapped = np.cumsum(
        rng_.normal(scale=0.05, size=(n_frames, 20, 3)), axis=0
    )
    POS = PropertyInfo("Positions", 3)
    UNW = PropertyInfo("Unwrapped_Positions", 3)
    sp = [SpeciesInfo("Na", 12, [POS, UNW]), SpeciesInfo("Cl", 8, [POS, UNW])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[box] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    chunk.add_data(pos[:, :12], 0, "Na", "Positions")
    chunk.add_data(pos[:, 12:], 0, "Cl", "Positions")
    chunk.add_data(unwrapped[:, :12], 0, "Na", "Unwrapped_Positions")
    chunk.add_data(unwrapped[:, 12:], 0, "Cl", "Unwrapped_Positions")
    project = latpu.Project(name=name, storage_path=tmp_path)
    return project.add_experiment(
        "e", timestep=0.1, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )


def test_full_rdf_calculator_1_vs_8_devices(tmp_path):
    """The FULL streamed calculator path (store -> RDF -> Computation)
    must agree between a 1-device and the 8-device mesh — the multi-chip
    analog of the reference's batched-vs-whole equivalence discipline
    (``CI/integration_tests/.../test_einstein_diffusion_coefficients.py:45-99``).
    Kernel-level 1-vs-8 tests above don't cover the calculator's own
    sampling/minibatch/prefactor plumbing; this does."""
    exp = _nacl_experiment(tmp_path, "rdfmesh")
    kw = dict(number_of_configurations=24, cutoff=3.9, number_of_bins=80,
              plot=False)
    with use_mesh(make_data_mesh(1)):
        res1 = exp.run.RadialDistributionFunction(**kw)
    with use_mesh(make_data_mesh(8)):
        res8 = exp.run.RadialDistributionFunction(force=True, **kw)
    assert sorted(res1.data_dict) == sorted(res8.data_dict)
    for pair in res1.data_dict:
        np.testing.assert_array_equal(
            np.asarray(res1.data_dict[pair]["y"]),
            np.asarray(res8.data_dict[pair]["y"]),
            err_msg=f"RDF[{pair}] diverges between 1- and 8-device meshes",
        )


def test_full_adf_calculator_1_vs_8_devices(tmp_path):
    """The stripe-sharded tensor-parallel ADF path is the most intricate
    sharding in the build — verify the FULL calculator (store -> sort ->
    window extract -> angle histogram -> Computation) agrees between a
    1-device and the 8-device mesh, not just the kernel (VERDICT r4
    weak #5)."""
    exp = _nacl_experiment(tmp_path, "adfmesh")
    kw = dict(number_of_configurations=12, cutoff=2.4, number_of_bins=40,
              plot=False)
    with use_mesh(make_data_mesh(1)):
        res1 = exp.run.AngularDistributionFunction(**kw)
    with use_mesh(make_data_mesh(8)):
        res8 = exp.run.AngularDistributionFunction(force=True, **kw)
    assert sorted(res1.data_dict) == sorted(res8.data_dict)
    for trip in res1.data_dict:
        np.testing.assert_allclose(
            np.asarray(res1.data_dict[trip]["adf"]),
            np.asarray(res8.data_dict[trip]["adf"]),
            rtol=1e-6, atol=1e-8,
            err_msg=f"ADF[{trip}] diverges between 1- and 8-device meshes",
        )


def test_full_greenkubo_conductivity_1_vs_8_devices(tmp_path):
    """System/GK family calculator-level equality: ionic current trafo +
    windowed ACF + integral end-to-end on both meshes."""
    import lammps_analysis_tpu as latpu
    from lammps_analysis_tpu.database import (
        PropertyInfo,
        SpeciesInfo,
        TrajectoryChunkData,
        TrajectoryMetadata,
    )
    from lammps_analysis_tpu.file_io import ScriptInput

    rng_ = np.random.default_rng(5)
    n_frames, n_each = 400, 8
    VEL = PropertyInfo("Velocities", 3)
    sp = [SpeciesInfo("Na", n_each, [VEL]), SpeciesInfo("Cl", n_each, [VEL])]
    meta = TrajectoryMetadata(
        n_configurations=n_frames, species_list=sp, box_l=[10.0] * 3,
        sample_rate=1, temperature=300.0,
    )
    chunk = TrajectoryChunkData(sp, n_frames)
    for name in ("Na", "Cl"):
        chunk.add_data(
            rng_.normal(size=(n_frames, n_each, 3)), 0, name, "Velocities"
        )
    project = latpu.Project(name="gkmesh", storage_path=tmp_path)
    exp = project.add_experiment(
        "ionic", timestep=0.05, temperature=300.0, units="si",
        simulation_data=ScriptInput(chunk, meta, "d"),
    )
    exp.set_charge("Na", 1.0)
    exp.set_charge("Cl", -1.0)
    kw = dict(data_range=64, correlation_time=16, plot=False)
    with use_mesh(make_data_mesh(1)):
        res1 = exp.run.GreenKuboIonicConductivity(**kw)
    with use_mesh(make_data_mesh(8)):
        res8 = exp.run.GreenKuboIonicConductivity(force=True, **kw)
    np.testing.assert_allclose(
        np.asarray(res1.data_dict["System"]["acf"]),
        np.asarray(res8.data_dict["System"]["acf"]),
        rtol=1e-7, atol=1e-12,
        err_msg="GK conductivity ACF diverges between 1- and 8-device meshes",
    )
    np.testing.assert_allclose(
        float(np.ravel(res1.data_dict["System"]["ionic_conductivity"])[0]),
        float(np.ravel(res8.data_dict["System"]["ionic_conductivity"])[0]),
        rtol=1e-7,
    )


def test_full_einstein_calculator_1_vs_8_devices(tmp_path):
    """Same discipline for the windowed-dynamics family: the streamed
    Einstein diffusion calculator end-to-end on both meshes."""
    exp = _nacl_experiment(tmp_path, "msdmesh")
    kw = dict(data_range=32, correlation_time=8, plot=False)
    with use_mesh(make_data_mesh(1)):
        res1 = exp.run.EinsteinDiffusionCoefficients(**kw)
    with use_mesh(make_data_mesh(8)):
        res8 = exp.run.EinsteinDiffusionCoefficients(force=True, **kw)
    for key in res1.data_dict:
        np.testing.assert_allclose(
            np.asarray(res1.data_dict[key]["msd"]),
            np.asarray(res8.data_dict[key]["msd"]),
            rtol=1e-7, atol=1e-12,
            err_msg=f"MSD[{key}] diverges between 1- and 8-device meshes",
        )
