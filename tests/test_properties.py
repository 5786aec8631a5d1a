"""Property-based tests (hypothesis) for algebraic invariants — the
industrialized form of the reference's randomized SetDifference check
(a1p1_ahuja.py:266-267, unseeded random sets; SURVEY §5.2)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_analytics_cse545_spark.functions.skew import (
    salted_collect_list,
    skew_resistant_count_distinct,
)

ints = st.lists(st.integers(min_value=-1000, max_value=1000), max_size=30)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(r=ints, s=ints)
def test_set_difference_invariants(spark, r, s):
    """R−S semantics for arbitrary comparable inputs (A1 PDF p.2
    genericity requirement): result == set(R)−set(S); (R−S) ∩ S = ∅."""
    r_df = spark.createDataFrame([(x,) for x in r] or [(0,)], ["elem"]).limit(len(r))
    s_df = spark.createDataFrame([(x,) for x in s] or [(0,)], ["elem"]).limit(len(s))
    got = {
        row["elem"]
        for row in r_df.distinct().join(s_df, "elem", "left_anti").collect()
    }
    assert got == set(r) - set(s)
    assert not (got & set(s))


def test_skew_resistant_count_distinct_matches_builtin(spark, sf_correctness):
    from big_data_analytics_cse545_spark.sources import load_table

    e = load_table(spark, sf_correctness, "events")
    got = {
        (r["event_type"], r["n_distinct"])
        for r in skew_resistant_count_distinct(e, "event_type", "user_id").collect()
    }
    exp = {
        (r["event_type"], r["n"])
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exp


def test_salted_collect_list_matches_plain(spark, sf_correctness):
    from big_data_analytics_cse545_spark.sources import load_table

    d = load_table(spark, sf_correctness, "documents")
    got = {
        r["lang"]: r["values"]
        for r in salted_collect_list(d, "lang", "doc_id", n_salts=8).collect()
    }
    exp = {
        r["lang"]: sorted(r["v"])
        for r in d.groupBy("lang").agg(F.collect_list("doc_id").alias("v")).collect()
    }
    assert got == exp


# URL-ish generator: scheme/host/port/path/query/fragment fragments that
# exercise every canonicalization rule, composed randomly.
_url_strategy = st.builds(
    lambda scheme, www, host, port, path, slash, params, frag: (
        scheme
        + "://"
        + www
        + host
        + port
        + path
        + slash
        + ("?" + "&".join(params) if params else "")
        + frag
    ),
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    www=st.sampled_from(["", "www.", "WWW."]),
    host=st.sampled_from(["ex.com", "Ex.COM", "a.b.ex.com"]),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.sampled_from(["", "/", "/A/b", "/x"]),
    slash=st.sampled_from(["", "/", "//"]),
    params=st.lists(
        st.sampled_from(
            ["a=1", "b=2", "z=9", "utm_source=t", "utm_campaign=c",
             "gclid=g", "fbclid=f", "ref=nav", "referrer=x"]
        ),
        max_size=4,
        unique=True,
    ),
    frag=st.sampled_from(["", "#f", "#frag/with?stuff"]),
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(urls=st.lists(_url_strategy, min_size=1, max_size=8, unique=True))
def test_canonical_url_idempotent_and_sql_equal(spark, urls):
    """canonical_url must be IDEMPOTENT (canonicalizing a canonical URL
    changes nothing — the property that makes re-running a crawl
    pipeline safe) and must agree with its DuckDB twin on arbitrary
    rule-exercising inputs, not just the hand-picked test cases."""
    import duckdb

    from big_data_analytics_cse545_spark.functions.url import (
        canonical_url,
        sql_canonical_url,
    )

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url(F.col("url")).alias("url"))
    got_once = [r["url"] for r in once.collect()]
    got_twice = [
        r["url"] for r in once.select(canonical_url(F.col("url")).alias("url")).collect()
    ]
    assert got_once == got_twice, "canonicalization must be idempotent"
    con = duckdb.connect()
    duck = [
        con.execute(
            "WITH u AS (SELECT ?::VARCHAR AS url) "
            f"SELECT {sql_canonical_url('url')} FROM u",
            [u],
        ).fetchone()[0]
        for u in urls
    ]
    assert got_once == duck


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("abc é́ü̈中ﬁ")
            ),
            max_size=24,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_nfc_normalize_idempotent_and_matches_python(spark, texts):
    """api.nfc_normalize is idempotent and equals unicodedata NFC for
    arbitrary strings mixing combining marks, precomposed chars, CJK,
    and ligatures."""
    import unicodedata

    from big_data_analytics_cse545_spark import api

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    once = {
        r["id"]: r["text"] for r in api.nfc_normalize(df, "text").collect()
    }
    assert once == {i: unicodedata.normalize("NFC", t) for i, t in enumerate(texts)}
    df2 = spark.createDataFrame(list(once.items()), "id long, text string")
    twice = {
        r["id"]: r["text"] for r in api.nfc_normalize(df2, "text").collect()
    }
    assert twice == once


def test_freq_items_superset_guarantee(spark, sf_correctness):
    """DataFrame.freqItems (Karp/Misra-Gries heavy hitters) must return
    a SUPERSET of the items whose true frequency exceeds the support —
    the one guarantee the sketch makes (false positives allowed, false
    negatives never), verified against exact counts."""
    from pyspark.sql import functions as F

    from big_data_analytics_cse545_spark.sources import load_table

    e = load_table(spark, sf_correctness, "events")
    support = 0.1
    got = set(e.freqItems(["event_type"], support).collect()[0][0])
    n = e.count()
    exact = {
        r["event_type"]
        for r in e.groupBy("event_type").count().collect()
        if r["count"] > support * n
    }
    assert exact <= got, f"missing heavy hitters: {exact - got}"


# ---------------------------------------------------------------------------
# Batched-BPE theory pins (round 9): the two claims train_bpe's batching
# rests on, checked against hypothesis-generated corpora in pure Python
# (fast — no Spark round-trip per example; the Spark kernel is pinned
# equal to the pure-Python model by the goldens in tests/test_text.py).
# ---------------------------------------------------------------------------


def _py_apply_one(s: list[str], left: str, right: str) -> list[str]:
    """Sennrich greedy left-to-right single-merge scan."""
    out: list[str] = []
    for x in s:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _py_apply_batch(s: list[str], batch: list[tuple[str, str]]) -> list[str]:
    """train_bpe's single-pass when-chain: at each position, the first
    batch member whose (tail, incoming) matches applies."""
    rules = {(l, r): l + r for l, r in batch}
    out: list[str] = []
    for x in s:
        if out and (out[-1], x) in rules:
            out[-1] = rules[(out[-1], x)]
        else:
            out.append(x)
    return out


@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8), min_size=0, max_size=12
    )
)
@settings(max_examples=300, deadline=None)
def test_batched_bpe_selection_is_exact_at_m1(words):
    """Claim 1 (the contract): batch_m=1 IS sequential Sennrich BPE —
    the batched reference with batch size 1 reproduces the sequential
    reference merge-for-merge on arbitrary corpora (tiny alphabet so
    pair collisions, ties, and self-overlapping runs like 'aaaa' are
    common, not rare)."""
    from collections import Counter

    from tests.test_text import _pure_python_bpe, _pure_python_bpe_batched

    wf = Counter(words)
    assert _pure_python_bpe_batched(wf, 10, 1) == _pure_python_bpe(wf, 10)


@given(
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=10),
        min_size=0,
        max_size=10,
    ),
    st.integers(min_value=2, max_value=6),
)
@settings(max_examples=300, deadline=None)
def test_disjoint_batch_single_pass_equals_sequential_passes(words, m):
    """Claim 2 (why one fold pass is sound): for a SYMBOL-DISJOINT
    batch — selected exactly as train_bpe selects it from the true
    pair counts — applying all members in ONE left-to-right pass
    equals applying them one-per-pass in selection order, on every
    word. (Disjointness is what makes the when-chain order-free: no
    member can create, consume, or retype another member's match
    sites.)"""
    from collections import Counter

    wf = Counter(words)
    pc: dict[tuple[str, str], int] = {}
    for w, f in wf.items():
        for i in range(len(w) - 1):
            pc[(w[i], w[i + 1])] = pc.get((w[i], w[i + 1]), 0) + f
    ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    used: set[str] = set()
    batch: list[tuple[str, str]] = []
    for (left, right), _ in ranked:
        if {left, right, left + right} & used:
            continue
        batch.append((left, right))
        used |= {left, right, left + right}
        if len(batch) == m:
            break
    for w in wf:
        s = list(w)
        one_pass = _py_apply_batch(s, batch)
        multi = s
        for left, right in batch:
            multi = _py_apply_one(multi, left, right)
        assert one_pass == multi, (w, batch)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    run_len=st.integers(min_value=8, max_value=24),   # ≥ SPAN_MIN_TOKENS
    lead1=st.integers(min_value=0, max_value=12),
    lead2=st.integers(min_value=0, max_value=12),
    tail1=st.integers(min_value=0, max_value=12),
    tail2=st.integers(min_value=0, max_value=12),
)
def test_d13_planted_run_found_exactly(spark, run_len, lead1, lead2, tail1, tail2):
    """d13 boundary property: for ANY planted shared run of length
    L ≥ SPAN_MIN_TOKENS at ANY offsets — including runs starting at
    position 0 or ending at the document's last token — exactly one
    span is reported, with exact inclusive bounds and span_len == L.
    Filler vocabularies are disjoint per side (and from the run), so
    no accidental k-gram can collide."""
    from big_data_analytics_cse545_spark.operators import dedup

    run = " ".join(f"run{i}" for i in range(run_len))
    d1 = " ".join(
        [f"aa{i}" for i in range(lead1)] + [run] + [f"bb{i}" for i in range(tail1)]
    )
    d2 = " ".join(
        [f"cc{i}" for i in range(lead2)] + [run] + [f"dd{i}" for i in range(tail2)]
    )
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id bigint, text string")
    spans = dedup.shared_spans(df).collect()
    assert len(spans) == 1, spans
    s = spans[0]
    assert (s["s1"], s["e1"]) == (lead1, lead1 + run_len - 1)
    assert (s["s2"], s["e2"]) == (lead2, lead2 + run_len - 1)
    assert s["span_len"] == run_len


def test_x09_scores_are_partition_invariant(spark, sf_correctness):
    """x09's exact-BIGINT claim, tested the x07 way: scores and keep
    verdicts must be identical under a hostile repartitioning of the
    input (float-sum operators drift here; integer micro-nat sums
    cannot)."""
    from big_data_analytics_cse545_spark.operators import sampling
    from big_data_analytics_cse545_spark.sources import load_table

    d = load_table(spark, sf_correctness, "documents")
    labeled = d.withColumn("_pos", F.col("lang") == "en").withColumn(
        "_tr",
        sampling.hash_bucket(F.col("doc_id"), "split|", 100) < sampling.TRAIN_PCT,
    )
    a = {
        r["doc_id"]: (r["qc_sum_micro"], r["qc_gate_micro"], r["keep"])
        for r in sampling.classify_quality(labeled, train_col="_tr").collect()
    }
    b = {
        r["doc_id"]: (r["qc_sum_micro"], r["qc_gate_micro"], r["keep"])
        for r in sampling.classify_quality(
            labeled.repartition(37, "lang"), train_col="_tr"
        ).collect()
    }
    assert a == b
