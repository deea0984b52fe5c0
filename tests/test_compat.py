"""analysisDef protocol round-trip tests (reference
tools/FisherExactTestSNPTool.py:169, tools/ClusterSeparationScore.py:187)."""

import pytest

from divergence_tpu.compat import (
    build_analysis_def,
    config_from_analysis_def,
    parse_analysis_def,
)
from divergence_tpu.config import CssConfig, FetConfig, MdsAlgorithm, WindowConfig


def test_parse_reference_fet_string():
    s = (
        "Dummy: dummy name ([wStep=500] [wSize=2500] [percentile=0.95])"
        "-> FisherExactScoreStat"
    )
    stat, kw = parse_analysis_def(s)
    assert stat == "FisherExactScoreStat"
    assert kw == {"wStep": "500", "wSize": "2500", "percentile": "0.95"}
    cfg = config_from_analysis_def(s)
    assert isinstance(cfg, FetConfig)
    assert cfg.window.wsize == 2500
    assert cfg.window.wstep == 500
    assert cfg.percentile == 0.95


def test_parse_reference_css_string():
    s = (
        "Dummy: dummy name ([wStep=500] [wSize=2500] [func=True] [mds=2] "
        "[mcT=10] [mcR=200000])-> CategoryClusterSeparationStat"
    )
    cfg = config_from_analysis_def(s)
    assert isinstance(cfg, CssConfig)
    assert cfg.drosophila is True
    assert cfg.mds == MdsAlgorithm.CMDS_SMACOF
    assert cfg.mc_threshold == 10
    assert cfg.mc_runs == 200_000


def test_percent_g_formatting():
    # %g can emit exponent notation for large windows
    s = "x ([wStep=1e+03] [wSize=1e+04] [percentile=0.9])-> FisherExactScoreStat"
    cfg = config_from_analysis_def(s)
    assert cfg.window.wsize == 10_000
    assert cfg.window.wstep == 1_000


def test_roundtrip():
    for cfg in (
        FetConfig(window=WindowConfig(5000, 1000), percentile=0.9),
        CssConfig(
            window=WindowConfig(2500, 500),
            drosophila=True,
            mds=MdsAlgorithm.SMACOF,
            mc_threshold=5,
            mc_runs=1000,
        ),
    ):
        s = build_analysis_def(cfg)
        back = config_from_analysis_def(s)
        assert back.window == cfg.window
        if isinstance(cfg, CssConfig):
            assert back.drosophila == cfg.drosophila
            assert back.mds == cfg.mds
            assert back.mc_threshold == cfg.mc_threshold
            assert back.mc_runs == cfg.mc_runs
        else:
            assert back.percentile == cfg.percentile


def test_errors():
    with pytest.raises(ValueError):
        parse_analysis_def("no stat name here")
    with pytest.raises(ValueError):
        config_from_analysis_def("x ([wSize=10])-> UnknownStat")


def test_missing_and_case_sensitive_kwargs_raise():
    """The reference adapters index kwargs directly (KeyError on a
    missing/typo'd key, reference statistics/FisherExactScoreStat.py:44-50);
    silently defaulting would run a wrong-geometry scan."""
    with pytest.raises(ValueError, match="percentile"):
        config_from_analysis_def(
            "x ([wStep=500] [wSize=2500])-> FisherExactScoreStat"
        )
    with pytest.raises(ValueError, match="wSize"):
        # lowercase key must NOT silently fall back to the default
        config_from_analysis_def(
            "x ([wsize=5000] [wStep=500] [percentile=0.95])"
            "-> FisherExactScoreStat"
        )
    with pytest.raises(ValueError, match="mcT"):
        config_from_analysis_def(
            "x ([wStep=500] [wSize=2500] [func=False] [mds=0] "
            "[mcR=200000])-> CategoryClusterSeparationStat"
        )


def test_build_large_geometry_roundtrips_exactly():
    """Integer fields are emitted as plain integers: the reference's %g
    flips to exponent notation above 6 significant digits, silently
    rounding wsize=1234567 to 1234570 on round-trip and producing a
    string its own adapter's int() cannot parse."""
    from divergence_tpu.compat.analysisdef import build_analysis_def
    from divergence_tpu.config import FetConfig, WindowConfig

    cfg = FetConfig(window=WindowConfig(wsize=1_234_567, wstep=500))
    s = build_analysis_def(cfg)
    assert "[wSize=1234567]" in s
    back = config_from_analysis_def(s)
    assert back.window.wsize == 1_234_567
