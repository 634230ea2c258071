"""Substring-grain dedup hand-checks (VERDICT r10 directive #7):
pure-Python recompute of the maximal repeated spans and the planted
cross-doc duplicate property."""

from collections import Counter

import pytest

from ecom_churn_lakehouse_spark.queries.dedup_queries import (
    _RSS_L,
    derived_corpus,
    q_repeated_substring_spans,
)

SF_DIR = "/root/testdata/sf0.001"


def _python_spans(texts, L):
    grams = Counter()
    toks = {d: t.split() for d, t in texts.items()}
    pos_grams = {}
    for d, t in toks.items():
        pg = []
        for i in range(1, len(t) - L + 2):  # 1-based positions
            g = " ".join(t[i - 1 : i - 1 + L])
            pg.append((i, g))
            grams[g] += 1
        pos_grams[d] = pg
    spans = set()
    for d, pg in pos_grams.items():
        hit = [i for i, g in pg if grams[g] >= 2]
        sid = 0
        start = prev = None
        n = 0
        for i in hit:
            if prev is None or i - prev > L:
                if prev is not None:
                    spans.add(
                        (d, sid, start, prev + L - 1, n, prev + L - start)
                    )
                sid += 1
                start = i
                n = 0
            n += 1
            prev = i
        if prev is not None:
            spans.add((d, sid, start, prev + L - 1, n, prev + L - start))
    return spans


@pytest.fixture(scope="module")
def rss(spark):
    rows = [
        (
            r["doc_id"],
            r["span_id"],
            r["span_start"],
            r["span_end"],
            r["n_dup_grams"],
            r["span_tokens"],
        )
        for r in q_repeated_substring_spans(spark, SF_DIR).collect()
    ]
    texts = {
        r["doc_id"]: r["text"]
        for r in derived_corpus(spark, SF_DIR).collect()
    }
    return set(rows), texts


def test_python_recompute_matches_exactly(rss):
    got, texts = rss
    want = _python_spans(texts, _RSS_L)
    assert got == want and got


def test_planted_exact_copies_yield_full_document_spans(rss):
    """Every exact copy (doc_id + 100000) duplicates its source whole,
    so both sides must carry ONE span covering the entire document."""
    got, texts = rss
    by_doc: dict[int, list] = {}
    for d, sid, s, e, n, st in got:
        by_doc.setdefault(d, []).append((sid, s, e, n, st))
    copies = [d for d in texts if 100000 <= d < 200000]
    assert copies
    for c in copies:
        src = c - 100000
        n_tok = len(texts[c].split())
        for d in (c, src):
            spans = by_doc.get(d)
            assert spans, f"doc {d} lost its planted duplicate span"
            assert len(spans) == 1
            sid, s, e, n, st = spans[0]
            assert (s, e) == (1, n_tok)
            assert st == n_tok
            assert n == n_tok - _RSS_L + 1  # every gram duplicated


def test_spans_are_maximal_and_disjoint(rss):
    """No two spans of a doc overlap or sit within L tokens of each
    other (else they would have merged), and arithmetic invariants
    hold on every row."""
    got, _ = rss
    by_doc: dict[int, list] = {}
    for d, sid, s, e, n, st in got:
        assert st == e - s + 1
        assert st >= _RSS_L
        assert 1 <= n <= e - s - _RSS_L + 2
        by_doc.setdefault(d, []).append((s, e))
    for d, spans in by_doc.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            # next span's first gram starts > L after the previous
            # span's last gram start (the island-merge cut)
            assert s2 - (e1 - _RSS_L + 1) > _RSS_L
