"""One artifact key = one workload (VERDICT r4 weak #3).

``adf_firstshell_ms_per_frame`` used to mean n_frames=16 in
``bench.py`` extras but n_frames=2 in ``benchmarks/rebaseline.py`` — a
2x phantom for anyone diffing the two artifacts. The keys now carry the
call height (``bench.adf_firstshell_key``); these tests pin the naming
contract at the source level so the workloads cannot silently diverge
again.
"""

from __future__ import annotations

import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _src(rel):
    return (ROOT / rel).read_text()


def test_key_builder_embeds_call_height():
    import bench

    assert bench.adf_firstshell_key(2) == "adf_firstshell_ms_per_frame_f2"
    assert (
        bench.adf_firstshell_key(16, "_brick")
        == "adf_firstshell_ms_per_frame_f16_brick"
    )
    assert bench.ADF_FIRSTSHELL_KEY == bench.adf_firstshell_key(
        bench.ADF_FIRSTSHELL_F
    )


def test_no_bare_firstshell_key_literal_remains():
    # every occurrence of the key family in the two measuring tools must
    # carry a call-height suffix or come from the builder; a new bare
    # string literal reintroduces the ambiguity
    pat = re.compile(r"[\"']adf_firstshell_ms_per_frame(?!_f[\d{])")
    for rel in ("bench.py", "benchmarks/rebaseline.py",
                "benchmarks/roofline.py"):
        hits = pat.findall(_src(rel))
        assert not hits, f"bare firstshell key literal in {rel}"


def test_bench_extras_row_uses_the_named_height():
    # the extras row must measure at ADF_FIRSTSHELL_F — the same
    # n_frames the key advertises
    src = _src("bench.py")
    m = re.search(
        r"measure_adf_ms_per_frame\(\s*\n?\s*n_frames=ADF_FIRSTSHELL_F,"
        r" stage_split=True\s*\n?\s*\)",
        src,
    )
    assert m, "bench extras ADF row no longer keyed to ADF_FIRSTSHELL_F"
    assert 'extras[ADF_FIRSTSHELL_KEY]' in src


def test_rebaseline_stages_build_key_and_workload_together():
    # rebaseline's firstshell() helper must pass the SAME n_frames to
    # both the key builder and the measurement
    src = _src("benchmarks/rebaseline.py")
    assert "def firstshell(n_frames" in src
    assert "bench.adf_firstshell_key(n_frames, suffix)" in src
    assert re.search(
        r"measure_adf_ms_per_frame\(n_frames=n_frames", src
    ), "rebaseline firstshell helper decouples key from workload"
