"""sf10-campaign round-over-round self-defense (round-14 verdict #3).

The campaign's only rule used to be growth>30x, so join_star_revenue
could move 11.2 -> 43.9 s sf10 between rounds at matched calib with
zero flags.  These tests pin the new per-row prior machinery: committed
cross-round minima (.bench_sf10_priors.json), a 2x-at-matched-calib
flag rule, and min-merge semantics that a loaded reading can never
poison.  Pure-python: no Spark session.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SPEC = importlib.util.spec_from_file_location(
    "sf10_campaign",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "sf10_campaign.py"),
)
camp = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(camp)

ROWS = {
    "join_star_revenue": {"sf10": 11.2, "calib_s": 0.26},
    "udf_scalar": {"sf10": 4.6, "calib_s": 0.26},
    "tiny_row": {"sf10": 0.8, "calib_s": 0.26},
}


class TestPriorFlags:
    def test_regression_at_matched_calib_flags(self):
        # the r14 shape: 43.9 vs an 11.2 prior at comparable calib
        assert camp.prior_flags(
            {"join_star_revenue": 43.9}, ROWS, 0.28) == ["join_star_revenue"]

    def test_within_2x_never_flags(self):
        assert camp.prior_flags(
            {"join_star_revenue": 21.0, "udf_scalar": 8.9}, ROWS, 0.28) == []

    def test_calib_mismatch_suppresses(self):
        # host itself moved SLOWER >CALIB_MATCH_X: wall-clock comparison
        # is noise (a slow host plausibly explains a high wall)
        assert camp.prior_flags({"join_star_revenue": 43.9}, ROWS, 0.55) == []

    def test_faster_host_over_prior_still_flags(self):
        # round-16 regression shape: dedup_ngram_jaccard read 4.5x its
        # prior on a host whose CPU probe was FASTER than the prior's
        # (calib 0.255 vs 0.439) and the old symmetric rule suppressed
        # the retry - a faster probe makes an over-prior wall MORE
        # alarming, so the flag must fire in that direction
        rows = {"dedup_ngram_jaccard": {"sf10": 30.8, "calib_s": 0.44}}
        assert camp.prior_flags(
            {"dedup_ngram_jaccard": 138.9}, rows, 0.255
        ) == ["dedup_ngram_jaccard"]

    def test_under_absolute_floor_never_flags(self):
        # sub-2s sf10 rows are overhead-noisy even at 10x their prior
        assert camp.prior_flags({"tiny_row": 1.9}, ROWS, 0.26) == []

    def test_unknown_row_or_failed_reading_skipped(self):
        assert camp.prior_flags({"new_row": 99.0, "udf_scalar": None},
                                ROWS, 0.26) == []


class TestMergePriors:
    def test_seed_min_merge_and_loaded_reading_cannot_poison(self, tmp_path):
        d = str(tmp_path)
        camp.merge_priors(d, {"a": 10.0, "b": 3.0}, 0.25)
        # a improves (min-merge takes it, with the new calib); b's loaded
        # 99.0 reading must NOT displace the 3.0 floor
        camp.merge_priors(d, {"a": 8.0, "b": 99.0, "c": 5.0}, 0.31)
        got = json.load(open(tmp_path / camp.PRIORS_FILE))["rows"]
        assert got["a"] == {"sf10": 8.0, "calib_s": 0.31}
        assert got["b"] == {"sf10": 3.0, "calib_s": 0.25}
        assert got["c"]["sf10"] == 5.0

    def test_sections_are_independent(self, tmp_path):
        d = str(tmp_path)
        camp.merge_priors(d, {"x": 1.0}, 0.2, section="rows")
        camp.merge_priors(d, {"x": 7.0}, 0.2, section="extras")
        data = json.load(open(tmp_path / camp.PRIORS_FILE))
        assert data["rows"]["x"]["sf10"] == 1.0
        assert data["extras"]["x"]["sf10"] == 7.0

    def test_none_readings_ignored(self, tmp_path):
        d = str(tmp_path)
        camp.merge_priors(d, {"a": None}, 0.2)
        assert json.load(open(tmp_path / camp.PRIORS_FILE))["rows"] == {}

    def test_unreadable_priors_file_resets_cleanly(self, tmp_path):
        (tmp_path / camp.PRIORS_FILE).write_text("{broken")
        assert camp.load_priors(str(tmp_path)) == {}


class TestCommittedPriors:
    def test_repo_priors_cover_the_declared_set(self):
        """The committed priors file must exist and carry the two
        investigated rows at their honest floors, plus a verdict string
        for each in the campaign constants."""
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        p = camp.load_priors(repo)
        rows = p.get("rows", {})
        assert len(rows) >= 50 and len(p.get("extras", {})) >= 7
        assert rows["join_star_revenue"]["sf10"] < 20.0  # not the 43.9 artifact
        assert rows["udf_scalar"]["sf10"] < 10.0         # not the 28.8 artifact
        for name in ("join_star_revenue", "udf_scalar"):
            assert name in camp.ROW_VERDICTS
            assert "co-tenant" in camp.ROW_VERDICTS[name]
