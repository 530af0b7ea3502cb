"""D26 winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, MOSS).

Gates: selection exactly matches an independent pure-Python winnowing
reimplementation (hash values included - the D23 evidence standard);
the paper's density guarantee (consecutive selected positions <= w
apart); rightmost tie-break on repeated grams; short-doc global-min
edge; MOSS overlap scores (identical docs 1.0, planted partial copies
found, disjoint docs absent, max_fp_docs boilerplate governor); plan
shapes (ONE Exchange for selection, no Python eval, no cartesian);
DuckDB oracle at sf0.01 for BOTH the selection and the pair scores.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark import plans as P
from kafka_cassandra_plugin_spark.operators.fingerprint import (
    fingerprint_near_dups,
    fingerprint_overlap,
    winnow_fingerprints,
)


def _h52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _ref_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Independent reference: the paper's robust winnowing (window min,
    ties -> rightmost), consecutive-dedup == distinct by the interval
    property."""
    toks = [t for t in text.split() if t]
    if len(toks) < k:
        return set()
    hs = [_h52(" ".join(toks[i:i + k]))
          for i in range(len(toks) - k + 1)]
    m = len(hs)
    out = set()
    for i in range(0, max(m - w, 0) + 1):
        window = hs[i:i + w]
        mn = min(window)
        p = max(j for j in range(i, min(i + w, m)) if hs[j] == mn)
        out.add((p, mn))
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa"]


def _synth(doc_id: int, n: int) -> tuple[int, str]:
    """Deterministic pseudo-random token sequence (no RNG: md5-derived
    indices, reproducible across runs and engines)."""
    toks = [VOCAB[int(hashlib.md5(f"{doc_id}:{i}".encode())
                      .hexdigest()[:4], 16) % len(VOCAB)]
            for i in range(n)]
    return doc_id, " ".join(toks)


class TestSelection:
    @pytest.mark.parametrize("k,w", [(3, 4), (1, 1), (2, 5), (5, 2)])
    def test_matches_independent_reference(self, spark, k, w):
        rows = [_synth(d, 3 + (d * 7) % 28) for d in range(30)]
        rows += [(100, "alpha beta alpha beta alpha beta alpha beta"),
                 (101, "solo"), (102, "   ")]
        df = _docs(spark, rows)
        got: dict[int, set] = {}
        for r in winnow_fingerprints(df, k=k, w=w, hash_fn="md5").collect():
            got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
        exp = {d: _ref_winnow(t, k, w) for d, t in rows}
        exp = {d: s for d, s in exp.items() if s}
        assert got == exp

    def test_density_guarantee(self, spark):
        """The paper's property: consecutive selected positions are at
        most w apart, so every w-window contributes a fingerprint."""
        w = 4
        rows = [_synth(d, 40) for d in range(10)]
        fps = winnow_fingerprints(_docs(spark, rows), k=3, w=w)
        by_doc: dict[int, list[int]] = {}
        for r in fps.collect():
            by_doc.setdefault(r.doc_id, []).append(r.pos)
        assert len(by_doc) == 10
        for poss in by_doc.values():
            poss.sort()
            assert poss[0] < w  # first window covered
            gaps = [b - a for a, b in zip(poss, poss[1:])]
            assert all(g <= w for g in gaps)

    def test_ties_break_rightmost(self, spark):
        """All-equal hashes (one repeated gram): each window selects
        its RIGHTMOST position, so the selected set is exactly the
        anchor-window right edges."""
        df = _docs(spark, [(1, "a b a b a b a b")])
        # k=2 -> grams at pos 0..6; "a b"/"b a" alternate but every
        # window of w=3 holds both values; reference decides exactly
        got = {(r.pos, r.fp)
               for r in winnow_fingerprints(df, k=2, w=3,
                                            hash_fn="md5").collect()}
        assert got == _ref_winnow("a b a b a b a b", 2, 3)

    def test_short_doc_fingerprints_global_min(self, spark):
        """k <= tokens < k+w-1: fewer than w grams, exactly one
        fingerprint - the global (rightmost) minimum."""
        text = "alpha beta gamma delta"
        df = _docs(spark, [(1, text)])  # k=3 -> 2 grams < w=4
        got = [(r.pos, r.fp) for r in
               winnow_fingerprints(df, k=3, w=4, hash_fn="md5").collect()]
        assert len(got) == 1
        assert set(got) == _ref_winnow(text, 3, 4)

    def test_sub_k_doc_contributes_nothing(self, spark):
        df = _docs(spark, [(1, "one two"), (2, "")])
        assert winnow_fingerprints(df, k=3, w=4).count() == 0

    def test_guards(self, spark):
        df = _docs(spark, [(1, "a b c")])
        with pytest.raises(ValueError, match=">= 1"):
            winnow_fingerprints(df, k=0)
        with pytest.raises(ValueError, match=">= 1"):
            winnow_fingerprints(df, w=0)
        with pytest.raises(ValueError, match="hash_fn"):
            winnow_fingerprints(df, hash_fn="sha1")


class TestOverlap:
    def test_identical_docs_score_one(self, spark):
        _, text = _synth(7, 40)
        fps = winnow_fingerprints(
            _docs(spark, [(1, text), (2, text)]), k=3, w=4)
        got = fingerprint_overlap(fps).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.id_a, r.id_b) == (1, 2)
        assert r.n_a == r.n_b == r.shared
        assert r.overlap == 1.0

    def test_planted_partial_copy_found_disjoint_absent(self, spark):
        a = _synth(1, 60)
        prefix = " ".join(a[1].split()[:30])
        rows = [a, (2, prefix + " zulu1 zulu2"),
                _synth(3, 60)]  # doc 3 shares no 30-token run
        fps = winnow_fingerprints(_docs(spark, rows), k=3, w=4)
        pairs = {(r.id_a, r.id_b): r.overlap
                 for r in fingerprint_overlap(fps).collect()}
        assert (1, 2) in pairs
        # winnowing locality: a verbatim 30-token prefix shares all
        # interior selections; only window-boundary picks can differ
        assert pairs[(1, 2)] >= 0.7
        # the small synthetic vocabulary makes coincidental shared
        # 3-grams possible, but never at copy-level overlap
        assert all(ov < 0.5 for p, ov in pairs.items() if p != (1, 2))

    def test_max_fp_docs_governs_boilerplate(self, spark):
        """A license-header line shared by MANY docs pairs everyone
        with everyone; the MOSS too-common rule drops it."""
        header = "standard license header all rights reserved forever"
        rows = [(d, header + " " + _synth(d, 20)[1]) for d in range(12)]
        fps = winnow_fingerprints(_docs(spark, rows), k=3, w=4)
        ungoverned = fingerprint_overlap(fps)
        governed = fingerprint_overlap(fps, max_fp_docs=5)
        # header fingerprints pair all 12 docs without the governor
        assert ungoverned.count() == 12 * 11 // 2
        # with it, the header fps (present in 12 > 5 docs) are dropped
        # and only coincidental unique-tail collisions can remain
        assert governed.count() < 12 * 11 // 2
        assert governed.filter(F.col("overlap") >= 0.5).count() == 0

    def test_near_dups_threshold(self, spark):
        a = _synth(1, 60)
        prefix = " ".join(a[1].split()[:40])
        rows = [a, (2, prefix + " q1 q2"), _synth(3, 60)]
        got = fingerprint_near_dups(_docs(spark, rows), threshold=0.5,
                                    k=3, w=4)
        assert {(r.id_a, r.id_b) for r in got.collect()} == {(1, 2)}


class TestPlans:
    def test_winnow_one_exchange_no_python(self, spark):
        df = _docs(spark, [_synth(d, 30) for d in range(5)])
        plan_df = winnow_fingerprints(df, k=3, w=4)
        assert P.count_exchanges(plan_df) == 1
        plan = P.formatted_plan(plan_df)
        assert "EvalPython" not in plan
        assert "CartesianProduct" not in plan

    def test_overlap_no_cartesian_no_python(self, spark):
        df = _docs(spark, [_synth(d, 30) for d in range(5)])
        plan = P.formatted_plan(
            fingerprint_overlap(winnow_fingerprints(df, k=3, w=4),
                                max_fp_docs=10)
        )
        assert "EvalPython" not in plan
        assert "CartesianProduct" not in plan


class TestOracle:
    def test_winnow_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            FINGERPRINT_WINNOW_SQL,
            fingerprint_winnow,
        )

        df = fingerprint_winnow(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, FINGERPRINT_WINNOW_SQL,
                           "fingerprint_winnow")
        assert n > 0

    def test_overlap_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            FINGERPRINT_OVERLAP_SQL,
            fingerprint_overlap_pairs,
        )

        df = fingerprint_overlap_pairs(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, FINGERPRINT_OVERLAP_SQL,
                           "fingerprint_overlap")
        # every planted 30-token prefix copy must surface
        n_planted = duck.execute(
            "SELECT count(*) FROM documents WHERE doc_id % 7 = 0 AND "
            "len(list_filter(regexp_split_to_array(trim(text), '\\s+'),"
            " x -> x <> '')) >= 30"
        ).fetchone()[0]
        assert n >= n_planted > 0
