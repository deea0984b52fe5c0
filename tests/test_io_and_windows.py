"""IO round-trips and window-planning tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from divergence_tpu.core import plan_windows, bucketize
from divergence_tpu.engine.fet_engine import _gather_windows
from divergence_tpu.io import (
    read_gtrack_points,
    write_score_track,
    read_score_track,
    vcf_to_gtrack,
)
from divergence_tpu.io.gtrack import gtrack_points_header
from divergence_tpu.oracle import reference as orc


VCF_SAMPLE = """\
##fileformat=VCFv4.1
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tind1\tind2\tind3
chrI\t100\t.\tA\tT\t50\tPASS\t.\tGT:DP\t0/0:12\t1/1:9\t0/1:7
chrI\t250\t.\tG\tC\t50\tPASS\t.\tGT:DP\t./.:0\t0|0:11\t1|1:8
chrII\t40\t.\tC\tA\t50\tPASS\t.\tGT:DP\t1/0:5\t0/0:9\t0/0:10
"""


def test_vcf_roundtrip(tmp_path):
    vcf = tmp_path / "in.vcf"
    vcf.write_text(VCF_SAMPLE)
    out = tmp_path / "out.gtrack"
    found = vcf_to_gtrack(vcf, ["ind1", "ind2", "ind3", "ghost"], out, "test")
    assert found == ["ind1", "ind2", "ind3"]

    tracks = read_gtrack_points(out)
    assert set(tracks) == {"chrI", "chrII"}
    t = tracks["chrI"]
    assert t.size == 3
    assert t.npos == 2
    # genotype code map (reference tools/VCFConvert.py:8-17)
    np.testing.assert_array_equal(
        t.values_matrix(), [[3, -3, 0], [-10000, 3, -3]]
    )
    np.testing.assert_array_equal(t.positions_unique(), [100, 250])


def test_vcf_gzip_input(tmp_path):
    """.vcf.gz converts identically to the plain-text file."""
    import gzip

    plain = tmp_path / "in.vcf"
    plain.write_text(VCF_SAMPLE)
    gz = tmp_path / "in.vcf.gz"
    with gzip.open(gz, "wt") as f:
        f.write(VCF_SAMPLE)
    out1, out2 = tmp_path / "p.gtrack", tmp_path / "g.gtrack"
    vcf_to_gtrack(plain, ["ind1", "ind2"], out1, "t")
    vcf_to_gtrack(gz, ["ind1", "ind2"], out2, "t")
    assert out1.read_text() == out2.read_text()


def test_gtrack_population_size_inference(tmp_path):
    p = tmp_path / "t.gtrack"
    rows = ["chr1\t%d\t%d\tind%d" % (pos, v, i)
            for pos, v in [(10, 3), (20, -3), (30, 0)]
            for i, v in [(0, v), (1, -v if v else 0)]]
    p.write_text(gtrack_points_header("g") + "\n".join(rows) + "\n")
    t = read_gtrack_points(p)["chr1"]
    assert t.size == 2
    assert t.npos == 3


def test_chunked_fallback_reader_bounded_blocks(tmp_path):
    """The portable parser must stream in bounded blocks: a file much
    larger than block_bytes parses identically to one-shot reading."""
    from divergence_tpu.io.gtrack import _read_rows_chunked

    p = tmp_path / "big.gtrack"
    rng = np.random.default_rng(3)
    n = 5000
    pos = np.sort(rng.choice(np.arange(1, 100_000), n, replace=False))
    with open(p, "w") as f:
        f.write(gtrack_points_header("g"))
        for k in range(n):
            for i in range(3):
                f.write(f"chr1\t{pos[k]}\t{int(rng.choice([3,-3,0]))}\ti{i}\n")

    small = _read_rows_chunked(p, block_bytes=4096)   # many blocks
    big = _read_rows_chunked(p, block_bytes=1 << 30)  # one block
    assert small[0] == big[0]
    for a, b in zip(small[1:], big[1:]):
        np.testing.assert_array_equal(a, b)

    t = read_gtrack_points(p)["chr1"]
    assert t.size == 3 and t.npos == n


def test_snptable_missing_ids_raise(tmp_path):
    """Typo'd individual IDs must be a hard error, not a silently
    shrunken panel (a wrong population size changes every statistic)."""
    from divergence_tpu.io.snptable import snp_table_to_gtrack

    table = tmp_path / "snps.tsv"
    table.write_text(
        "#seqid\tpos\tallele1\tallele2\tfishA\tfishB\n"
        "chrI\t100\tA\tG\tAA\tAG\n"
        "chrI\t200\tC\tT\tCT\tTT\n"
    )
    out = tmp_path / "out.gtrack"
    with pytest.raises(ValueError, match="fishZ"):
        snp_table_to_gtrack(table, ["fishA", "fishZ"], out, "g")
    with pytest.raises(ValueError, match="no individual IDs"):
        snp_table_to_gtrack(table, [], out, "g")
    labels = snp_table_to_gtrack(table, ["fishA", "fishB"], out, "g")
    assert labels == ["fishA", "fishB"]
    t = read_gtrack_points(out)["chrI"]
    assert t.size == 2 and t.npos == 2


def test_snptable_headerless_offsets_bounds_checked(tmp_path):
    """Headerless column offsets past the table width must be a hard
    error — an out-of-range id would otherwise write a phantom
    all-missing individual (the same silent panel corruption the header
    branch raises on)."""
    from divergence_tpu.io.snptable import snp_table_to_gtrack

    table = tmp_path / "raw.tsv"
    table.write_text(
        "chrI\t100\tA\tG\tAA\tAG\nchrI\t200\tC\tT\tCT\tTT\n"
    )
    out = tmp_path / "out.gtrack"
    with pytest.raises(ValueError, match="out of range"):
        snp_table_to_gtrack(table, ["0", "7"], out, "g")
    with pytest.raises(ValueError, match="out of range"):
        snp_table_to_gtrack(table, ["-1"], out, "g")
    labels = snp_table_to_gtrack(table, ["0", "1"], out, "g")
    assert labels == ["0", "1"]
    assert read_gtrack_points(out)["chrI"].size == 2


def test_snptable_comment_preamble(tmp_path):
    """Prose '#' comments above the real header line are skipped (the
    published Jones-et-al tables carry a free-text preamble)."""
    from divergence_tpu.io.snptable import snp_table_to_gtrack

    table = tmp_path / "pre.tsv"
    table.write_text(
        "# Jones et al 2012 SNP table\n"
        "# build gasAcu1\n"
        "#seqid\tpos\tallele1\tallele2\tfishA\tfishB\n"
        "chrI\t100\tA\tG\tAA\tGG\n"
    )
    out = tmp_path / "out.gtrack"
    labels = snp_table_to_gtrack(table, ["fishB"], out, "g")
    assert labels == ["fishB"]
    t = read_gtrack_points(out)["chrI"]
    assert t.size == 1 and float(t.vals[0]) == -3.0


def test_vcf_without_chrom_header_raises(tmp_path):
    """A truncated/malformed VCF (no #CHROM line) must fail loudly —
    a header-only GTrack would yield silently empty downstream results
    (the reference converter crashes on such input)."""
    bad = tmp_path / "bad.vcf"
    bad.write_text("##fileformat=VCFv4.2\n##no column header here\n")
    with pytest.raises(ValueError, match="#CHROM"):
        vcf_to_gtrack(bad, ["x"], tmp_path / "o.gtrack", "g")


def test_score_track_roundtrip(tmp_path):
    scores = np.array([0.0, 1.5, 0.0, 2.5])
    stddev = np.array([0.0, 0.1, 0.0, 0.2])
    f = tmp_path / "scores.tsv"
    write_score_track(f, {"chrI": (scores, stddev)}, wstep=500)
    seqids, starts, s, d = read_score_track(f)
    # zero-score windows are skipped (FisherExactTestSNPTool.py:182-187)
    assert seqids == ["chrI", "chrI"]
    np.testing.assert_array_equal(starts, [500, 1500])
    np.testing.assert_allclose(s, [1.5, 2.5])
    np.testing.assert_allclose(d, [0.1, 0.2])


def test_plan_windows_matches_oracle():
    rng = np.random.default_rng(0)
    positions = np.sort(rng.choice(10_000, 300, replace=False))
    regend, wsize, wstep = 9_000, 2500, 500
    plan = plan_windows(positions, regend, wsize, wstep)
    starts = orc.window_starts(regend, wsize, wstep)
    np.testing.assert_array_equal(plan.starts, starts)
    for w, start in enumerate(starts):
        lo, hi = orc.window_bounds(positions, int(start), int(start) + wsize)
        assert plan.lo[w] == lo
        assert plan.npos[w] == hi - lo
        assert plan.slot[w] == start // wstep
    assert plan.nslots == regend // wstep


def test_bucketize_covers_all_valid_windows():
    lo = np.array([0, 5, 9, 40, 80, 120])
    npos = np.array([10, 0, 33, 64, 65, 3])
    slot = np.arange(6)
    buckets = bucketize(lo, npos, slot, min_pad=16, max_batch=2)
    seen = np.concatenate([b.window_ids for b in buckets])
    assert sorted(seen) == [0, 2, 3, 4, 5]
    for b in buckets:
        assert (npos[b.window_ids] <= b.padded_npos).all()
        assert b.padded_npos <= max(2 * npos[b.window_ids].max(), 16)
        # the PRODUCTION gather contract (engine-side _gather_windows):
        # row r of window w reads SNP lo[w]+r for r < npos[w], SNP 0 past
        # the window (masked in the kernels)
        N = int((b.lo + b.npos).max()) + 1
        snp = jnp.arange(N, dtype=jnp.float64)[:, None]
        av, _ = _gather_windows(
            snp, snp, jnp.asarray(b.lo), jnp.asarray(b.npos), b.padded_npos
        )
        got = np.asarray(av)[..., 0]
        assert got.shape == (len(b.window_ids), b.padded_npos)
        offs = np.arange(b.padded_npos)[None, :]
        expect = np.where(offs < b.npos[:, None], b.lo[:, None] + offs, 0)
        np.testing.assert_array_equal(got, expect)


def test_bucketize_element_budget_splits_dense_buckets():
    """batch x padded_npos stays under max_elems for dense windows, and
    the split still covers every window exactly once."""
    rng = np.random.default_rng(9)
    n = 600
    lo = rng.integers(0, 10_000, n)
    npos = rng.integers(1500, 2500, n)   # pad -> 2048: dense
    slot = np.arange(n)
    buckets = bucketize(lo, npos, slot, max_batch=4096, max_elems=1 << 18)
    assert len(buckets) > 1
    seen = np.concatenate([b.window_ids for b in buckets])
    assert sorted(seen) == list(range(n))
    for b in buckets:
        assert len(b.window_ids) * b.padded_npos <= (1 << 18)


def test_num_windows_threaded_quirk():
    # threadcss.c:60 computes regend/wstep - 3 for the default geometry;
    # our definition agrees whenever wstep divides regend
    from divergence_tpu.config import WindowConfig

    w = WindowConfig(wsize=2500, wstep=500)
    assert w.num_windows(10_000) == 10_000 // 500 - 3
    assert w.num_slots(10_000) == 20


def test_chrom_sizes_roundtrip(tmp_path):
    from divergence_tpu.io.genome import read_chrom_sizes, write_chrom_sizes

    sizes = {"chrI": 28_185_914, "chrXXI": 11_717_487}
    write_chrom_sizes(tmp_path / "g.sizes", sizes)
    assert read_chrom_sizes(tmp_path / "g.sizes") == sizes
    # comments and blank lines are skipped
    (tmp_path / "g2.sizes").write_text("# c\n\nchrM\t16569\n")
    assert read_chrom_sizes(tmp_path / "g2.sizes") == {"chrM": 16569}


def test_run_summary_json(tmp_path):
    import json
    import time

    from divergence_tpu.utils.summary import RunSummary, StageTimer

    s = RunSummary(name="x")
    with s.stage("a"):
        time.sleep(0.01)
    s.counters["n"] = 3
    s.write(tmp_path / "s.json")
    data = json.loads((tmp_path / "s.json").read_text())
    assert data["name"] == "x"
    assert data["counters"]["n"] == 3
    assert data["timings_s"]["a"] >= 0.01
    t = StageTimer()
    assert t.elapsed() >= 0
