"""Quantization quality gate (reference capability: the WikiText-2 PPL /
KL-divergence ladder, tools/perplexity/README.md:51-65 + perplexity.cpp
--kl-divergence; zero-egress stand-in measured on a synthetic model)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def report(tmp_path_factory):
    import quality

    out = str(tmp_path_factory.mktemp("q") / "QUALITY.json")
    return quality.run(out, ladder=["Q8_0", "Q4_K_M", "Q2_K", "IQ1_S"],
                       imatrix_ftypes=["IQ1_S"])


def test_ladder_anchor_order(report):
    """More bits -> lower logit KL vs the f32 model."""
    f = report["ftypes"]
    assert f["Q8_0"]["kl_mean"] <= f["Q4_K_M"]["kl_mean"] \
        <= f["Q2_K"]["kl_mean"] <= f["IQ1_S"]["kl_mean"]
    assert report["gates"]["ladder_anchors_ok"]


def test_q8_near_lossless(report):
    assert report["ftypes"]["Q8_0"]["kl_mean"] < 1e-3


def test_imatrix_improves_kl(report):
    assert report["gates"]["imatrix_helps"]["IQ1_S"]


def test_rmse_recorded(report):
    assert report["ftypes"]["Q4_K_M"]["rmse_mean"] > 0
    assert report["ftypes"]["Q4_K_M"]["rmse_mean"] < report["ftypes"]["IQ1_S"]["rmse_mean"]
