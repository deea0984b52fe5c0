"""Region-calling tests (reference tools/FilterFisherScores.py and
tools/SignificantCSSRegions.py semantics)."""

import numpy as np
import pytest
from scipy import stats as sstats

from divergence_tpu.config import CssRegionConfig, FetFilterConfig
from divergence_tpu.stats import (
    bh_threshold,
    burke_limit,
    call_css_regions,
    filter_fet_regions,
    merge_windows,
    top_n_threshold,
)


def test_burke_limit_formula():
    scores = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    stddevs = np.array([0.1, 0.2, 0.3, 0.4, 0.5])
    limit = burke_limit(scores, stddevs, 0.999, 75.0)
    expected = 3.0 + sstats.norm.ppf(0.999) * np.percentile(stddevs, 75.0)
    assert limit == pytest.approx(expected)


def test_bh_threshold_textbook():
    # classic BH example: m=5, fdr=0.25
    p = np.array([0.01, 0.04, 0.03, 0.005, 0.2])
    # sorted: .005 .01 .03 .04 .2 ; k/n*q = .05 .10 .15 .20 .25
    # .2<=.25 passes immediately (descending scan) -> testp=.2
    assert bh_threshold(p, 0.25) == pytest.approx(0.2)
    # none passes
    assert bh_threshold(np.array([0.9, 0.95]), 0.01) is None
    assert bh_threshold(np.array([]), 0.05) is None


def test_bh_threshold_descending_scan_semantics():
    # p_(5)=0.5 fails 0.05*5/5; p_(4)=0.04 passes 0.05*4/5=0.04
    p = np.array([0.001, 0.01, 0.02, 0.04, 0.5])
    assert bh_threshold(p, 0.05) == pytest.approx(0.04)


def test_top_n_threshold_keeps_ties():
    scores = np.array([5.0, 3.0, 3.0, 1.0])
    t = top_n_threshold(scores, 2)
    assert t == 3.0
    assert (scores >= t).sum() == 3  # tie kept, like the reference


def test_merge_windows_gap_and_clamp():
    seqids = ["chr1"] * 4 + ["chr2"]
    starts = np.array([0, 500, 1000, 300_000, 100])
    segs = merge_windows(
        seqids, starts, extension=100_000, chrom_lengths={"chr1": 350_000}
    )
    # first three merge (gaps 500 <= 100000), end = 1000+100000
    # fourth opens a new segment, clamped to 349_999
    # chr2 opens a third, no clamp info -> 100+100000
    assert segs == [
        ("chr1", 0, 101_000),
        ("chr1", 300_000, 349_999),
        ("chr2", 100, 100_100),
    ]


def test_merge_windows_empty():
    assert merge_windows([], np.array([]), 1000) == []


def test_filter_fet_regions_end_to_end():
    n = 100
    rng = np.random.default_rng(0)
    seqids = ["chr1"] * n
    starts = np.arange(n) * 500
    scores = rng.normal(2.0, 0.01, n)
    scores[40:43] = 50.0  # one clear peak
    stddevs = np.full(n, 0.05)
    call = filter_fet_regions(
        seqids, starts, scores, stddevs, FetFilterConfig(max_distance=1000)
    )
    assert call.n_windows_passing == 3
    assert call.segments == [("chr1", 40 * 500, 42 * 500 + 1000)]
    assert call.threshold == pytest.approx(
        np.median(scores) + sstats.norm.ppf(0.999) * 0.05
    )


def test_call_css_regions_fdr_and_top():
    n = 50
    seqids = ["chr1"] * n
    starts = np.arange(n) * 500
    scores = np.linspace(1, 5, n)
    pvals = np.full(n, 0.8)
    pvals[10:13] = 1e-4

    call = call_css_regions(
        seqids, starts, scores, pvals, CssRegionConfig(mode="fdr", fdr=0.05)
    )
    assert call.n_windows_passing == 3
    assert call.segments == [("chr1", 5000, 6000 + 2500)]
    assert call.info["estimated_false_discoveries"] == pytest.approx(
        1e-4 * n
    )

    call = call_css_regions(
        seqids,
        starts,
        scores,
        pvals,
        CssRegionConfig(mode="top", num_top=5),
    )
    assert call.n_windows_passing == 5
    # top-5 scores are the last 5 windows, contiguous -> one segment
    assert call.segments == [("chr1", 45 * 500, 49 * 500 + 2500)]


def test_call_css_regions_none_found():
    call = call_css_regions(
        ["chr1"],
        np.array([0]),
        np.array([1.0]),
        np.array([0.9]),
        CssRegionConfig(mode="fdr", fdr=0.01),
    )
    assert call.segments == []
    assert call.info.get("none_found")
