"""Native C++ parser tests: equivalence with the pandas engine."""

import numpy as np
import pytest

from lammps_analysis_tpu.file_io import native_parser
from lammps_analysis_tpu.file_io.lammps_dump import LAMMPSDumpFile

from test_file_io import write_lammps_dump

pytestmark = pytest.mark.skipif(
    not native_parser.available(), reason="native parser not built"
)


def test_parse_block_values():
    text = b"1 Na 0.5 1.5\n2 Cl 2.5 3.5\n1 Na 4.5 5.5\n2 Cl 6.5 7.5\n"
    out = native_parser.parse_table_block(text, 2, 0, 2, 4)
    assert out.shape == (2, 2, 4)
    np.testing.assert_allclose(out[0, 0], [1, np.nan, 0.5, 1.5])
    np.testing.assert_allclose(out[1, 1, 2:], [6.5, 7.5])
    assert np.isnan(out[0, 1, 1])


def test_parse_block_by_id_places_rows():
    # ids out of order: 2 first, then 1
    text = b"2 X 20.0\n1 X 10.0\n"
    out = native_parser.parse_table_block(text, 1, 0, 2, 3, id_col=0)
    np.testing.assert_allclose(out[0, :, 2], [10.0, 20.0])


def test_parse_block_by_id_fallback_non_contiguous():
    # ids 5 and 9 (not 1..N): must fall back to argsort path
    text = b"9 X 90.0\n5 X 50.0\n"
    out = native_parser.parse_table_block(text, 1, 0, 2, 3, id_col=0)
    np.testing.assert_allclose(out[0, :, 2], [50.0, 90.0])


def test_truncated_block_raises():
    text = b"1 X 1.0\n"
    with pytest.raises(ValueError, match="truncated"):
        native_parser.parse_table_block(text, 1, 0, 2, 3)


def test_newline_helpers():
    text = b"a\nbb\nccc\n"
    assert native_parser.count_newlines(text) == 3
    assert native_parser.offset_after_nth_newline(text, 1) == 2
    assert native_parser.offset_after_nth_newline(text, 3) == len(text)
    assert native_parser.offset_after_nth_newline(text, 4) == -1


def test_native_matches_pandas_reader(tmp_path, rng):
    n_frames, n_atoms = 11, 40
    pos = rng.uniform(0, 8, size=(n_frames, n_atoms, 3))
    vel = rng.normal(size=(n_frames, n_atoms, 3))
    species = ["Na"] * 25 + ["Cl"] * 15
    path = tmp_path / "t.lammpstraj"
    write_lammps_dump(path, pos, vel, species, [8.0] * 3, rng=rng)

    chunks_native = list(LAMMPSDumpFile(path).get_configurations_generator())

    native_parser._build_failed = True  # force pandas engine
    try:
        chunks_pandas = list(
            LAMMPSDumpFile(path).get_configurations_generator()
        )
    finally:
        native_parser._build_failed = False

    for cn, cp in zip(chunks_native, chunks_pandas):
        for sp in ("Na", "Cl"):
            for prop in ("Positions", "Velocities"):
                np.testing.assert_allclose(
                    cn.get_data(sp, prop), cp.get_data(sp, prop), atol=1e-12
                )


def test_fast_path_token_parity():
    """The fixed-decimal fast path must be bit-identical to from_chars /
    python float: boundary digit counts, exponents (fallback), signs,
    inf/nan, bare integers, leading-dot and trailing-dot forms."""
    from lammps_analysis_tpu.file_io.native_parser import (
        available,
        parse_table_block,
    )

    if not available():
        pytest.skip("native parser unavailable")
    tokens = [
        "1.25", "-0.000001", "123456789012345.5", "999999999999999",
        "1e3", "-2.5e-4", "3.14159265358979", "nan", "inf", "42",
        "-7", "0.1", ".5", "1.", "-0.0", "1234567890.12345",
    ]
    line = " ".join(tokens) + "\n"
    out = np.asarray(
        parse_table_block(line.encode(), 1, 0, 1, len(tokens))
    ).ravel()
    for got, tok in zip(out, tokens):
        want = float(tok)
        if np.isnan(want):
            assert np.isnan(got), tok
        else:
            assert got == want, (tok, got, want)


def test_fuzz_no_crash_on_malformed_input(rng):
    """Memory safety of the C++ parser on adversarial bytes: random
    substitutions/insertions/deletions/newline injections plus empty,
    truncated, duplicated and pure-binary inputs must either parse (bad
    tokens become NaN) or raise ValueError — never crash or read past
    the buffer."""
    import numpy as np

    from lammps_analysis_tpu.file_io import native_parser as npx

    if not npx.available():
        import pytest

        pytest.skip("native parser unavailable (no toolchain)")

    lines = []
    for c in range(2):
        lines += [f"HEADER {c}", "cols: id type x y z"]
        for i in range(8):
            lines.append(
                f"{i+1} 2 {rng.uniform():.6f} {rng.uniform():.6f} "
                f"{rng.uniform():.6f}"
            )
    good = ("\n".join(lines) + "\n").encode()

    parsed = errors = 0
    for _ in range(500):
        b = bytearray(good)
        for _ in range(int(rng.integers(1, 8))):
            op = int(rng.integers(0, 4))
            pos = int(rng.integers(0, len(b)))
            if op == 0:
                b[pos] = int(rng.integers(32, 127))
            elif op == 1:
                del b[pos]
            elif op == 2:
                b.insert(pos, int(rng.integers(32, 127)))
            else:
                b[pos] = 10
        try:
            out = npx.parse_table_block(bytes(b), 2, 2, 8, 5, id_col=0)
            assert out.shape == (2, 8, 5)
            parsed += 1
        except ValueError:
            errors += 1
    extremes = [
        b"", b"\n" * 100, good[:37], good * 3,
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),
    ]
    for extreme in extremes:
        try:
            npx.parse_table_block(extreme, 2, 2, 8, 5, id_col=0)
        except ValueError:
            pass
    assert parsed + errors == 500


def test_parse_block_by_id_duplicate_ids_fall_back():
    """Duplicate ids within a configuration must NOT take the by-id fast
    path (one slot would be overwritten and another left as the caller's
    uninitialised np.empty memory); the argsort fallback keeps both rows
    deterministically."""
    text = b"1 X 10.0\n1 X 20.0\n"  # id 1 twice, id 2 missing
    out = native_parser.parse_table_block(text, 1, 0, 2, 3, id_col=0)
    np.testing.assert_allclose(out[0, :, 2], [10.0, 20.0])
    # and a later configuration may legitimately reuse ids seen earlier
    ok = b"2 X 20.0\n1 X 10.0\n2 X 21.0\n1 X 11.0\n"
    out2 = native_parser.parse_table_block(ok, 2, 0, 2, 3, id_col=0)
    np.testing.assert_allclose(out2[:, :, 2], [[10.0, 20.0], [11.0, 21.0]])
