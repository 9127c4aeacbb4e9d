"""Spell suggestion (query/suggest.py): (dist ASC, df DESC, term ASC)
ranking, length-band pruning never loses a candidate, no-match words
yield nothing."""

from __future__ import annotations

from angle_spark.query.suggest import suggest_terms


def test_suggest_ranking_and_edges(spark):
    tstats = spark.createDataFrame(
        [("join", 50), ("joins", 40), ("joint", 60), ("merge", 30), ("x", 1)],
        "term string, df long",
    )
    out = suggest_terms(spark, tstats, ["joinn", "qqqqqq"], max_dist=2, k=3)
    rows = [
        (r["word"], r["rank"], r["term"], r["dist"])
        for r in out.orderBy("word", "rank").collect()
    ]
    # dist 1: join/joins/joint -> df DESC: joint(60), join(50), joins(40)
    assert rows == [
        ("joinn", 1, "joint", 1),
        ("joinn", 2, "join", 1),
        ("joinn", 3, "joins", 1),
    ]
    # empty input -> empty typed frame
    assert suggest_terms(spark, tstats, []).count() == 0


def test_suggest_exact_hit_ranks_first(spark):
    tstats = spark.createDataFrame(
        [("scan", 10), ("scans", 99)], "term string, df long"
    )
    out = suggest_terms(spark, tstats, ["scan"], max_dist=1, k=2).collect()
    assert [(r["rank"], r["term"], r["dist"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (1, "scan", 0),
        (2, "scans", 1),
    ]


def test_suggest_modes(spark):
    """ES term-suggester suggest_mode: missing silences indexed words,
    popular keeps only strictly-more-frequent candidates (identity
    dist-0 rows vanish by construction), always is the unfiltered
    default; invalid mode rejected."""
    import pytest

    tstats = spark.createDataFrame(
        [("scan", 10), ("scans", 99), ("scant", 3), ("join", 50)],
        "term string, df long",
    )
    words = ["scan", "scann", "qqqq"]

    def got(mode):
        out = suggest_terms(
            spark, tstats, words, max_dist=2, k=5, suggest_mode=mode
        ).collect()
        return {
            (r["word"], r["term"]): (r["rank"], r["dist"], r["df"]) for r in out
        }

    alw = got("always")
    # always: indexed 'scan' suggests itself first, then neighbors
    assert alw[("scan", "scan")][0] == 1 and alw[("scan", "scan")][1] == 0
    assert ("scan", "scans") in alw and ("scann", "scan") in alw

    mis = got("missing")
    # indexed word -> silenced entirely; OOV words keep suggestions
    assert not any(w == "scan" for w, _ in mis)
    assert ("scann", "scans") in mis
    assert not any(w == "qqqq" for w, _ in mis)  # nothing near it

    pop = got("popular")
    # word_df('scan') = 10: only scans(99) survives; identity vanishes
    scan_terms = {t for w, t in pop if w == "scan"}
    assert scan_terms == {"scans"}
    # OOV word_df = 0: every candidate qualifies, identical to always
    assert {t for w, t in pop if w == "scann"} == {
        t for w, t in alw if w == "scann"
    }

    with pytest.raises(ValueError, match="suggest_mode"):
        suggest_terms(spark, tstats, words, suggest_mode="bogus")


def test_completion_ranking_and_edges(spark):
    from angle_spark.query.suggest import complete_terms

    tstats = spark.createDataFrame(
        [("scan", 50), ("scatter", 50), ("scale", 30), ("join", 90),
         ("joint", 10), ("sc", 5)],
        "term string, df long",
    )
    out = complete_terms(spark, tstats, ["sc", "joi", "zz"], k=2).collect()
    by_p = {}
    for r in out:
        by_p.setdefault(r["prefix"], []).append((r["rank"], r["term"], r["df"]))
    # df DESC, term ASC ties; k cuts; exact term is its own completion
    assert by_p["sc"] == [(1, "scan", 50), (2, "scatter", 50)]
    assert by_p["joi"] == [(1, "join", 90), (2, "joint", 10)]
    assert "zz" not in by_p  # nothing completes
    # exact vocabulary term appears as its own completion at full k
    full = complete_terms(spark, tstats, ["sc"], k=10).collect()
    assert "sc" in {r["term"] for r in full}


def test_completion_validation(spark):
    import pytest

    from angle_spark.query.suggest import complete_terms

    tstats = spark.createDataFrame([("a", 1)], "term string, df long")
    assert complete_terms(spark, tstats, []).count() == 0
    with pytest.raises(ValueError, match="k"):
        complete_terms(spark, tstats, ["a"], k=0)
    with pytest.raises(ValueError, match="prefix"):
        complete_terms(spark, tstats, ["a", ""])
