"""Native C++ GTrack parser: build + parity with the Python reader."""

import numpy as np
import pytest

from divergence_tpu.io.gtrack import read_gtrack_points
from divergence_tpu.native import native_available, parse_gtrack_native


@pytest.fixture(scope="module")
def gtrack_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(3)
    path = tmp / "pop.gtrack"
    rows = []
    with open(path, "w") as fh:
        fh.write("##gtrack version: 1.0\n##track type: valued points\n")
        fh.write("###seqid\tstart\tvalue\tgenomeid\n")
        for chrom in ("chrI", "chrII"):
            positions = np.sort(
                rng.choice(np.arange(1, 50_000), 200, replace=False)
            )
            for p in positions:
                for ind in range(5):
                    v = float(rng.choice([3, -3, 0, -10000]))
                    fh.write(f"{chrom}\t{p}\t{v:g}\tind{ind}\n")
                    rows.append((chrom, int(p), v))
    return path, rows


def test_native_builds():
    assert native_available(), "g++ build of the native parser failed"


def test_native_matches_rows(gtrack_file):
    path, rows = gtrack_file
    parsed = parse_gtrack_native(path)
    assert parsed is not None
    seq, pos, vals = parsed
    assert len(pos) == len(rows)
    # file row order preserved
    for i in (0, 1, len(rows) // 2, len(rows) - 1):
        assert (str(seq[i]), int(pos[i]), float(vals[i])) == rows[i]


def test_native_vs_python_reader(gtrack_file):
    path, _ = gtrack_file
    via_native = read_gtrack_points(path)          # auto-uses native
    import divergence_tpu.io.gtrack as g

    # force the pure-Python path
    import divergence_tpu.native as nat

    parsed = nat.parse_gtrack_native  # save
    try:
        nat.parse_gtrack_native = lambda p: None
        via_python = read_gtrack_points(path)
    finally:
        nat.parse_gtrack_native = parsed

    assert set(via_native) == set(via_python) == {"chrI", "chrII"}
    for k in via_native:
        a, b = via_native[k], via_python[k]
        assert a.size == b.size == 5
        np.testing.assert_array_equal(a.pos, b.pos)
        np.testing.assert_array_equal(a.vals, b.vals)


def test_native_missing_file():
    assert parse_gtrack_native("/nonexistent/file.gtrack") is None


def test_native_negative_and_float_values(tmp_path):
    path = tmp_path / "x.gtrack"
    path.write_text(
        "#h\nchr1\t100\t-10000\ta\nchr1\t100\t0.25\tb\n"
        "chr1\t200\t-3\ta\nchr1\t200\t1e-3\tb\n"
    )
    parsed = parse_gtrack_native(path)
    assert parsed is not None
    seq, pos, vals = parsed
    np.testing.assert_array_equal(pos, [100, 100, 200, 200])
    np.testing.assert_allclose(vals, [-10000.0, 0.25, -3.0, 1e-3])
