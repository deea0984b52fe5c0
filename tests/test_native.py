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

    # force the pure-Python path: read_gtrack_points imports
    # parse_gtrack_native_indexed (io/gtrack.py:74), so THAT is the
    # symbol to stub — patching parse_gtrack_native would compare the
    # native parser against itself
    import divergence_tpu.native as nat

    parsed = nat.parse_gtrack_native_indexed  # save
    try:
        nat.parse_gtrack_native_indexed = lambda p: None
        via_python = read_gtrack_points(path)
    finally:
        nat.parse_gtrack_native_indexed = parsed

    assert set(via_native) == set(via_python) == {"chrI", "chrII"}
    for k in via_native:
        a, b = via_native[k], via_python[k]
        assert a.size == b.size == 5
        np.testing.assert_array_equal(a.pos, b.pos)
        np.testing.assert_array_equal(a.vals, b.vals)


def test_native_missing_file():
    assert parse_gtrack_native("/nonexistent/file.gtrack") is None


def test_interleaved_chromosomes_group_identically(tmp_path):
    """The grouped/sorted fast path and the lexsort fallback must give
    the same tracks: an interleaved file (chromosome rows alternating,
    positions out of order) is grouped identically to its grouped,
    sorted rewrite."""
    rng = np.random.default_rng(8)
    rows = []
    for chrom in ("chrA", "chrB"):
        positions = rng.choice(np.arange(1, 9999), 60, replace=False)
        for p in positions:
            for ind in range(3):
                rows.append((chrom, int(p), float(rng.choice([3, -3, 0]))))
    inter = rows[::2] + rows[1::2]          # interleave + scramble order

    def write(path, rws):
        with open(path, "w") as fh:
            fh.write("#h\n")
            for c, p, v in rws:
                fh.write(f"{c}\t{p}\t{v:g}\tx\n")

    f_grouped = tmp_path / "grouped.gtrack"
    f_inter = tmp_path / "inter.gtrack"
    write(f_grouped, sorted(rows, key=lambda r: (r[0], r[1])))
    write(f_inter, inter)
    a = read_gtrack_points(f_grouped)
    b = read_gtrack_points(f_inter)
    assert set(a) == set(b) == {"chrA", "chrB"}
    for k in a:
        np.testing.assert_array_equal(a[k].pos, b[k].pos)
        # values per position form the same multiset; with stable
        # grouping and per-position file order preserved they are equal
        assert a[k].size == b[k].size == 3


def test_native_strictness_matches_python(tmp_path):
    """The native parser mirrors the Python reader's semantics exactly:
    blank/indented-comment lines are skipped, and any malformed row
    refuses the whole native parse (rc -5 -> None) so the strict Python
    fallback raises — the native path must never fabricate rows."""
    if not native_available():
        pytest.skip("no native toolchain")

    ok = tmp_path / "ok.gtrack"
    ok.write_text(
        "#h\n   \n\t\n  # indented comment\r\nchr1\t5\t3\ta\n\r\n"
    )
    parsed = parse_gtrack_native(ok)
    assert parsed is not None
    seq, pos, vals = parsed
    assert list(seq) == ["chr1"] and list(pos) == [5] and list(vals) == [3.0]
    tracks = read_gtrack_points(ok)
    assert set(tracks) == {"chr1"} and tracks["chr1"].size == 1

    for bad in (
        "chr1\tabc\t3\n",       # non-integer position
        "chr1\t12\n",           # missing value column
        "chr1\t12\t1.2.3\n",    # malformed float
        "chr1\t1.5\t3\n",       # fractional position
        "chr1\t12\t\t\n",       # empty value token
    ):
        f = tmp_path / "bad.gtrack"
        f.write_text("#h\n" + bad)
        assert parse_gtrack_native(f) is None, bad
        with pytest.raises((ValueError, IndexError)):
            read_gtrack_points(f)


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


def test_native_vcf_convert_matches_python(tmp_path):
    """The C++ VCF converter must produce byte-identical output to the
    Python semantics definition, including the edge cases: phased
    separators, half-missing, multi-allelic, missing names, and the
    once-computed GT index."""
    import io

    from divergence_tpu.io.gtrack import gtrack_points_header
    from divergence_tpu.io.vcf import _convert_stream
    from divergence_tpu.native import vcf_convert_native

    names = ["s1", "s2", "s3"]
    vcf_text = (
        "##fileformat=VCFv4.2\n"
        "##contig=<ID=chr1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        "s1\ts2\ts3\n"
        "chr1\t100\t.\tA\tT\t50\tPASS\t.\tGT:DP\t0/0:3\t0|1:9\t1/1:2\n"
        "chr1\t180\t.\tG\tC\t50\tPASS\t.\tGT:DP\t./.:0\t1|0:4\t0|0:7\n"
        "chr2\t40\t.\tC\tA\t50\tPASS\t.\tGT:DP\t./1:1\t2/1:5\t1/1:6\n"
        "chr2\t90\t.\tT\tG\t50\tPASS\t.\tGT:DP\t1/1:8\t.|.:0\t0/1:3\n"
    )
    vcf = tmp_path / "t.vcf"
    vcf.write_text(vcf_text)

    # python semantics definition
    py_out = io.StringIO()
    py_out.write(gtrack_points_header("g"))
    with open(vcf) as fh:
        found_py = _convert_stream(fh, ["s1", "ghost", "s3"], py_out)

    native_out = tmp_path / "native.gtrack"
    found_nat = vcf_convert_native(
        vcf, native_out, gtrack_points_header("g"), ["s1", "ghost", "s3"]
    )
    assert found_nat is not None, "native converter unavailable"
    assert found_nat == found_py == ["s1", "s3"]
    assert native_out.read_text() == py_out.getvalue()


def test_native_vcf_convert_via_public_api(tmp_path):
    """vcf_to_gtrack transparently uses the native converter for plain
    files and the Python path for .gz — identical outputs."""
    import gzip

    from divergence_tpu.io import vcf_to_gtrack

    vcf_text = (
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ta\tb\n"
        "chrX\t10\t.\tA\tT\t50\tPASS\t.\tGT\t0/0\t1/1\n"
        "chrX\t20\t.\tA\tT\t50\tPASS\t.\tGT\t0/1\t./.\n"
    )
    plain = tmp_path / "x.vcf"
    plain.write_text(vcf_text)
    gz = tmp_path / "x.vcf.gz"
    with gzip.open(gz, "wt") as f:
        f.write(vcf_text)
    o1, o2 = tmp_path / "p.gtrack", tmp_path / "z.gtrack"
    assert vcf_to_gtrack(plain, ["a", "b"], o1, "g") == ["a", "b"]
    assert vcf_to_gtrack(gz, ["a", "b"], o2, "g") == ["a", "b"]
    assert o1.read_text() == o2.read_text()


def test_native_vcf_malformed_line_strictness(tmp_path):
    """A truncated data line (missing sample column) must not be
    silently converted: the native path reports failure (None) and the
    Python fallback raises, matching the semantics definition."""
    from divergence_tpu.io import vcf_to_gtrack
    from divergence_tpu.io.gtrack import gtrack_points_header
    from divergence_tpu.native import vcf_convert_native

    vcf = tmp_path / "t.vcf"
    vcf.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ta\tb\n"
        "chr1\t10\t.\tA\tT\t50\tPASS\t.\tGT\t0/0\t1/1\n"
        "chr1\t20\t.\tA\tT\t50\tPASS\t.\tGT\t0/1\n"  # 'b' column missing
    )
    out = tmp_path / "o.gtrack"
    assert (
        vcf_convert_native(vcf, out, gtrack_points_header("g"), ["a", "b"])
        is None
    )
    with pytest.raises(IndexError):
        vcf_to_gtrack(vcf, ["a", "b"], out, "g")
