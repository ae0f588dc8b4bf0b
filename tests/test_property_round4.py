"""Property-based parity for the round-4 operators: brute-force
pure-Python simulators over hypothesis-generated inputs, exact
equality (every float in these operators is either an exact integer
division or a pinned sequential recurrence)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

words = st.text(alphabet="ab", min_size=1, max_size=3)
texts = st.lists(
    st.lists(words, min_size=0, max_size=8).map(" ".join), min_size=1, max_size=10
)


# ---------------------------------------------------- memorization_scan


def _ref_memorization(gen_docs, corpus_docs, n):
    def grams(text):
        toks = " ".join((text or "").lower().split()).split(" ")
        k = max(len(toks) - n + 1, 1)
        return [" ".join(toks[i : i + n]) for i in range(k)]

    corpus = set()
    for t in corpus_docs.values():
        corpus.update(grams(t))
    out = {}
    for did, t in gen_docs.items():
        gs = grams(t)
        hit = [g in corpus for g in gs]
        longest = run = 0
        for h in hit:
            run = run + 1 if h else 0
            longest = max(longest, run)
        out[did] = (
            len(gs),
            sum(hit),
            longest,
            longest + n - 1 if longest else 0,
        )
    return out


@given(gen=texts, corp=texts, n=st.integers(2, 3))
@SET
def test_memorization_scan_matches_bruteforce(spark, gen, corp, n):
    from feature_engineering_tk_spark.operators.dedup import memorization_scan

    gen_docs = {i: t for i, t in enumerate(gen)}
    corp_docs = {1000 + i: t for i, t in enumerate(corp)}
    g = spark.createDataFrame(list(gen_docs.items()), "doc_id bigint, text string")
    c = spark.createDataFrame(list(corp_docs.items()), "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_grams, r.n_matched, r.longest_run, r.longest_overlap_tokens)
        for r in memorization_scan(g, c, shingle_n=n).collect()
    }
    assert got == _ref_memorization(gen_docs, corp_docs, n)


# ---------------------------------------------------- discounted_return


@given(
    rewards=st.lists(
        st.lists(st.integers(-5, 9), min_size=1, max_size=10),
        min_size=1,
        max_size=6,
    ),
    gamma=st.sampled_from([0.0, 0.5, 0.9, 1.0]),
)
@SET
def test_discounted_return_matches_recurrence(spark, rewards, gamma):
    from feature_engineering_tk_spark.operators.transcripts import discounted_return

    rows = [
        (f"c{ci}", ti, float(r))
        for ci, rs in enumerate(rewards)
        for ti, r in enumerate(rs)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, reward double")
    got = {
        (r.conv_id, r.turn_idx): r.discounted_return
        for r in discounted_return(df, gamma=gamma).collect()
    }
    for ci, rs in enumerate(rewards):
        g = 0.0
        for ti, r in enumerate(rs):
            g = g * gamma + float(r)
            assert got[(f"c{ci}", ti)] == g  # identical float op sequence


# ------------------------------------------------------- branch_points


def _ref_branches(convs, min_convs=2):
    from hashlib import md5

    marked = {}
    for cid, turns in convs.items():
        prefix = []
        for depth, t in enumerate(turns):
            key = md5("\x1f".join(prefix).encode()).hexdigest()
            marked.setdefault(key, []).append((depth, cid, t))
            if t is not None:
                prefix.append(t)
    out = set()
    for key, rows in marked.items():
        n_convs = len({c for _, c, _ in rows})
        nxt = {t for _, _, t in rows if t is not None}
        depth = min(d for d, _, _ in rows)
        if n_convs >= min_convs and len(nxt) >= 2:
            out.add((depth, key, n_convs, len(nxt)))
    return out


@given(
    convs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=5),
        min_size=1,
        max_size=8,
    )
)
@SET
def test_branch_points_matches_bruteforce(spark, convs):
    from feature_engineering_tk_spark.operators.transcripts import branch_points

    conv_map = {f"c{i}": ts for i, ts in enumerate(convs)}
    rows = [
        (cid, ti, t) for cid, ts in conv_map.items() for ti, t in enumerate(ts)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        (r.depth, r.prefix_hash, r.n_convs, r.n_branches)
        for r in branch_points(df).collect()
    }
    assert got == _ref_branches(conv_map)


# ------------------------------------------------------ tool_transitions


@given(
    seqs=st.lists(
        st.lists(st.sampled_from(["s", "f", "g"]), min_size=0, max_size=6),
        min_size=1,
        max_size=6,
    )
)
@SET
def test_tool_transitions_matches_bruteforce(spark, seqs):
    from fractions import Fraction

    from feature_engineering_tk_spark.operators.transcripts import tool_transitions

    rows = [
        (f"c{ci}", ti, "tool", t)
        for ci, ts in enumerate(seqs)
        for ti, t in enumerate(ts)
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )
    counts: dict = {}
    for ts in seqs:
        prev = "<start>"
        for t in ts:
            counts[(prev, t)] = counts.get((prev, t), 0) + 1
            prev = t
    totals: dict = {}
    for (s, _), n in counts.items():
        totals[s] = totals.get(s, 0) + n
    got = {
        (r.src_tool, r.dst_tool): (r.n_transitions, r.p_transition)
        for r in tool_transitions(df).collect()
    }
    assert set(got) == set(counts)
    for k, n in counts.items():
        assert got[k][0] == n
        assert got[k][1] == n / totals[k[0]]  # one exact division


# ---------------------------------------------------- krippendorff_alpha


def _ref_krippendorff(ratings):
    """Brute-force coincidence-matrix alpha over {(item, rater): label}."""
    from collections import Counter, defaultdict

    per_item = defaultdict(Counter)
    for (item, _rater), lab in ratings.items():
        per_item[item][lab] += 1
    kept = {i: c for i, c in per_item.items() if sum(c.values()) >= 2}
    if not kept:
        return None
    n_l = Counter()
    for c in kept.values():
        n_l.update(c)
    n = sum(n_l.values())
    do_sum = 0.0
    for c in kept.values():
        m = sum(c.values())
        do_sum += (m * m - sum(v * v for v in c.values())) / (m - 1)
    de_num = n * n - sum(v * v for v in n_l.values())
    alpha = 0.0 if de_num == 0 else 1.0 - (n - 1) * do_sum / de_num
    return n, len(kept), alpha


@given(
    st.dictionaries(
        st.tuples(st.integers(0, 6), st.integers(0, 3)),  # (item, rater)
        st.sampled_from(["x", "y", "z"]),
        min_size=1,
        max_size=24,
    )
)
@SET
def test_krippendorff_matches_bruteforce(spark, ratings):
    from feature_engineering_tk_spark.analysis.agreement import krippendorff_alpha
    from feature_engineering_tk_spark.exceptions import InsufficientDataError

    df = spark.createDataFrame(
        [(i, r, l) for (i, r), l in ratings.items()],
        "item_id int, rater_id int, label string",
    )
    ref = _ref_krippendorff(ratings)
    if ref is None:
        with pytest.raises(InsufficientDataError):
            krippendorff_alpha(df)
        return
    row = krippendorff_alpha(df).first()
    assert (row["n_pairable"], row["n_items"]) == (ref[0], ref[1])
    assert row["alpha"] == pytest.approx(ref[2], abs=1e-12)


# ---------------------------------------------------- regression_metrics


@given(
    st.lists(
        st.tuples(
            st.integers(-50, 50).map(lambda v: v / 4.0),
            st.integers(-50, 50).map(lambda v: v / 4.0),
        ),
        min_size=1,
        max_size=20,
    )
)
@SET
def test_regression_metrics_matches_bruteforce(spark, pairs):
    import math

    from feature_engineering_tk_spark.analysis.regression import regression_metrics

    df = spark.createDataFrame(pairs, "pred double, y double")
    r = regression_metrics(df, "pred", "y").first()
    n = len(pairs)
    errs = [p - y for p, y in pairs]
    assert r["n"] == n
    assert r["mae"] == pytest.approx(sum(abs(e) for e in errs) / n, abs=1e-9)
    assert r["rmse"] == pytest.approx(math.sqrt(sum(e * e for e in errs) / n), abs=1e-9)
    assert r["mean_error"] == pytest.approx(sum(errs) / n, abs=1e-9)
    ys = [y for _, y in pairs]
    sst = sum(y * y for y in ys) - sum(ys) ** 2 / n
    if sst > 1e-12:
        sse = sum(e * e for e in errs)
        assert r["r2"] == pytest.approx(1 - sse / sst, abs=1e-6)
    mape_terms = [abs(p - y) / abs(y) for p, y in pairs if y != 0]
    assert r["n_mape"] == len(mape_terms)
    if mape_terms:
        assert r["mape"] == pytest.approx(sum(mape_terms) / len(mape_terms), abs=1e-9)


# ---------------------------------------------------- ranking metrics


@SET
@given(
    st.lists(
        st.lists(st.sampled_from([0.0, 0.0, 1.0, 2.0]), min_size=1, max_size=12),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=8),
)
def test_ranking_metrics_property(spark, rel_lists, k):
    import math

    from feature_engineering_tk_spark.analysis.ranking import ranking_metrics

    rows = [
        (q, i + 1, rel)
        for q, rels in enumerate(rel_lists)
        for i, rel in enumerate(rels)
    ]
    df = spark.createDataFrame(rows, "query_id int, rank int, relevance double")
    got = {r.query_id: r for r in ranking_metrics(df, k=k).collect()}
    for q, rels in enumerate(rel_lists):
        hits = [r > 0 for r in rels]
        n_rel = sum(hits)
        row = got[q]
        assert row.n_relevant == n_rel
        rr = next((1.0 / (i + 1) for i, h in enumerate(hits) if h), 0.0)
        assert row.rr == pytest.approx(rr, abs=1e-12)
        dcg = sum((2.0 ** r - 1.0) / math.log2(i + 2) for i, r in enumerate(rels[:k]))
        ideal = sorted(rels, reverse=True)
        idcg = sum((2.0 ** r - 1.0) / math.log2(i + 2) for i, r in enumerate(ideal[:k]))
        want_ndcg = dcg / idcg if idcg > 0 else 0.0
        assert row.ndcg_at_k == pytest.approx(want_ndcg, abs=1e-12)
        assert 0.0 <= row.ndcg_at_k <= 1.0 + 1e-12


# ---------------------------------------------------- strip_markup


tag_soup = st.lists(
    st.one_of(
        st.sampled_from(["<b>", "</b>", "<p class='x'>", "<!-- c -->", "<br/>"]),
        st.text(alphabet="ab \n", min_size=0, max_size=6),
    ),
    min_size=0,
    max_size=10,
).map("".join)


@SET
@given(tag_soup)
def test_strip_markup_removes_all_tags_property(spark, soup):
    import re as _re

    from feature_engineering_tk_spark.functions.cleaning import strip_markup

    df = spark.createDataFrame([(1, soup)], "id int, text string")
    out = strip_markup(df, "text", decode_entities=False).collect()[0]["text"]
    # input had no entities, so no '<' can survive tag stripping
    assert "<" not in out and ">" not in out
    # whitespace is squeezed: no double spaces, no 3+ newline runs
    assert "  " not in out and "\n\n\n" not in out
    assert out == out.strip(" ")
