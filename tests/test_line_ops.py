"""Line-granularity corpus ops: C4/RefinedWeb exact line dedup
(text/dedup.py line_dedup) and the C4 heuristic cleaning pass
(text/pipeline.py c4_line_filter) — handcrafted cases + a pure-Python
replay oracle."""

import pytest

from linkgraph.text.dedup import line_dedup
from linkgraph.text.pipeline import c4_line_filter


def _py_line_dedup(docs, min_chars=1):
    """dict[id] -> (text, n_lines, n_removed); mirrors the operator."""
    lines = {d: t.split("\n") for d, t in docs}
    by_line = {}
    for d in sorted(lines):
        for i, ln in enumerate(lines[d]):
            if len(ln.strip()) >= min_chars:
                by_line.setdefault(ln, []).append((d, i))
    cut = {d: set() for d, _ in docs}
    for ln, places in by_line.items():
        for d, i in sorted(places)[1:]:
            cut[d].add(i)
    out = {}
    for d, t in docs:
        keep = [ln for i, ln in enumerate(lines[d]) if i not in cut[d]]
        out[d] = ("\n".join(keep), len(lines[d]), len(cut[d]))
    return out


def test_line_dedup_handcrafted(spark):
    docs = [
        (1, "alpha beta\nshared line here\ntail"),
        (2, "shared line here\nunique two"),  # non-canonical -> cut
        (3, "x\nshared line here\nx"),  # dup short line 'x': 2nd cut too
    ]
    got = {
        r.doc_id: (r.text_dedup, r.n_lines, r.n_removed)
        for r in line_dedup(spark.createDataFrame(docs, ["doc_id", "text"])).collect()
    }
    assert got == _py_line_dedup(docs)
    # canonical (doc 1) keeps the shared line; later docs lose it
    assert got[1][2] == 0
    assert got[2] == ("unique two", 2, 1)
    # within-doc duplicate: first 'x' canonical, second cut; shared line cut
    assert got[3] == ("x", 3, 2)


def test_line_dedup_within_doc_and_min_chars(spark):
    docs = [(1, "x\nlong unique line\nx"), (2, "\nlong unique line\n")]
    got = {
        r.doc_id: (r.text_dedup, r.n_lines, r.n_removed)
        for r in line_dedup(
            spark.createDataFrame(docs, ["doc_id", "text"]), min_chars=1
        ).collect()
    }
    assert got == _py_line_dedup(docs)
    # second 'x' in doc 1 is a within-doc duplicate -> cut
    assert got[1] == ("x\nlong unique line", 3, 1)
    # blank lines are exempt (below min_chars) -> both kept; only the
    # duplicated long line is lost, leaving two empties joined by one sep
    assert got[2] == ("\n", 3, 1)

    # min_chars=2 exempts the 1-char 'x' lines entirely
    got2 = {
        r.doc_id: (r.text_dedup, r.n_removed)
        for r in line_dedup(
            spark.createDataFrame(docs, ["doc_id", "text"]), min_chars=2
        ).collect()
    }
    assert got2[1] == ("x\nlong unique line\nx", 0)


def test_line_dedup_validates(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        line_dedup(df, min_chars=-1)


def test_c4_filter_rules(spark):
    docs = [
        # 3 good lines -> kept
        (1, "one two three four five ok.\nsix seven eight nine ten go!\na b c d e f?"),
        # good lines but page has lorem ipsum -> kept=0
        (2, "one two three four five ok.\nlorem ipsum dolor sit amet x.\na b c d e f?"),
        # line failures: no punct / too short / javascript
        (3, "one two three four five six\nshort line.\nuse JavaScript here now ok."),
        # curly brace page rule
        (4, "one two three four five ok.\nfunction() { return 1; }\na b c d e f?"),
    ]
    out = {
        r.doc_id: r
        for r in c4_line_filter(
            spark.createDataFrame(docs, ["doc_id", "text"]), min_lines=2
        ).collect()
    }
    r1 = out[1]
    assert (r1.n_kept, r1.n_dropped, r1.kept) == (3, 0, 1)
    assert r1.text_clean == docs[0][1]
    # page blocklist: lines survive but page dropped
    r2 = out[2]
    assert (r2.n_kept, r2.kept) == (3, 0)
    # all three line rules fire
    r3 = out[3]
    assert (r3.n_kept, r3.n_dropped, r3.kept) == (0, 3, 0)
    assert r3.text_clean == ""
    # '{' page rule (the brace line itself also fails the line rules)
    r4 = out[4]
    assert (r4.n_kept, r4.kept) == (2, 0)


def test_c4_filter_validates(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        c4_line_filter(df, min_words=0)
    with pytest.raises(ValueError):
        c4_line_filter(df, terminal_punct="")


def test_c4_filter_map_only_plan(spark):
    """100-TB contract: the pass is one map stage — no Exchange anywhere."""
    df = spark.createDataFrame([(1, "a b c d e ok.")], ["doc_id", "text"])
    plan = c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
