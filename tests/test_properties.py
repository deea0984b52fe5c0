"""Property-based tests (hypothesis) for host-side exact semantics."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from divergence_tpu.core.windows import plan_windows
from divergence_tpu.oracle import reference as orc
from divergence_tpu.stats.regions import bh_threshold, merge_windows


@settings(max_examples=200, deadline=None)
@given(
    regend=st.integers(0, 100_000),
    wsize=st.integers(1, 5000),
    wstep=st.integers(1, 5000),
)
def test_window_plan_matches_reference_loop(regend, wsize, wstep):
    """plan_windows must emit exactly the starts of the reference's serial
    loop `while (start + wsize <= regend + wstep)` (reference
    statistics/css/css.c:117) — for ANY positive geometry, including
    sparse wstep > wsize."""
    want = []
    start = 0
    while start + wsize <= regend + wstep:
        want.append(start)
        start += wstep
    plan = plan_windows(np.array([1, 2, 3]), regend, wsize, wstep)
    assert plan.starts.tolist() == want
    assert plan.nslots == max(regend // wstep, 0)


@settings(max_examples=200, deadline=None)
@given(
    pos=st.lists(st.integers(0, 10_000), min_size=1, max_size=200),
    start=st.integers(0, 10_000),
    span=st.integers(0, 5000),
)
def test_window_bounds_two_pointer_equivalence(pos, start, span):
    """searchsorted window bounds == the reference's slide_right scan."""
    p = np.sort(np.asarray(pos, dtype=np.int64))
    stop = start + span
    lo = int(np.searchsorted(p, start, side="left"))
    hi = int(np.searchsorted(p, stop, side="right"))
    want = [x for x in p if start <= x <= stop]
    assert list(p[lo:hi]) == want
    olo, ohi = orc.window_bounds(p, start, stop)
    assert (olo, ohi) == (lo, hi)


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=100
    ),
    perc=st.floats(0.0, 1.0),
)
def test_percentile_interp_bounds(vals, perc):
    """Interpolated percentile always lies within [min, max] and is
    monotone at the extremes (cFisher.c:136-144)."""
    v = np.asarray(vals)
    r = orc.percentile_interp(v, perc)
    assert v.min() - 1e-9 <= r <= v.max() + 1e-9
    assert orc.percentile_interp(v, 0.0) == np.sort(v)[0]
    assert orc.percentile_interp(v, 1.0) == np.sort(v)[-1]


@settings(max_examples=200, deadline=None)
@given(
    p=st.lists(st.floats(0.0, 1.0, allow_nan=False), min_size=1, max_size=60),
    fdr=st.floats(0.001, 0.5),
)
def test_bh_threshold_properties(p, fdr):
    """BH step-up invariants: if a threshold exists it is one of the p
    values, satisfies p_(k) <= k/n * fdr at its own rank, and every
    smaller p is also selected."""
    arr = np.asarray(p)
    t = bh_threshold(arr, fdr)
    if t is None:
        # no p passes at its rank
        srt = np.sort(arr)
        n = len(arr)
        assert all(srt[k] > (k + 1) / n * fdr for k in range(n))
    else:
        assert t in arr
        srt = np.sort(arr)
        k = int(np.searchsorted(srt, t, side="right"))
        assert t <= k / len(arr) * fdr + 1e-12


@settings(max_examples=200, deadline=None)
@given(
    starts=st.lists(st.integers(0, 10_000), min_size=1, max_size=50),
    ext=st.integers(1, 2000),
)
def test_merge_windows_invariants(starts, ext):
    """Merged segments: ordered, non-overlapping, each window inside one
    segment, every segment ends extension past its last window."""
    s = np.sort(np.asarray(starts, dtype=np.int64))
    segs = merge_windows(["c"] * len(s), s, ext)
    assert segs
    prev_end = -1
    for _, a, b in segs:
        assert a > prev_end
        assert b == min([x for x in s if a <= x <= b][-1] + ext, np.inf)
        prev_end = b
    covered = [any(a <= x <= b for _, a, b in segs) for x in s]
    assert all(covered)