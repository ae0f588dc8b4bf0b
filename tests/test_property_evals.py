"""Property-based parity for the eval family: each operator checked
against an independent pure-Python brute-force simulator on arbitrary
generated tables (the repo's hypothesis convention — few examples,
edge discovery over volume)."""

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

words = st.text(alphabet="abcx ", min_size=0, max_size=24)


@given(pairs=st.lists(st.tuples(words, words), min_size=1, max_size=12))
@SET
def test_qa_metrics_matches_bruteforce(spark, pairs):
    from feature_engineering_tk_spark.functions.text import qa_metrics

    df = spark.createDataFrame(
        [(i, p, r) for i, (p, r) in enumerate(pairs)], "id int, pred string, ref string"
    )
    got = {r.id: r for r in qa_metrics(df).collect()}
    for i, (p, r) in enumerate(pairs):
        pt, rt = p.lower().split(), r.lower().split()
        inter = sum((Counter(pt) & Counter(rt)).values())
        assert got[i].n_overlap == inter
        assert got[i].n_pred == len(pt) and got[i].n_ref == len(rt)
        exp_f1 = (2 * inter) / (len(pt) + len(rt)) if pt or rt else 0.0
        assert got[i].f1 == exp_f1
        assert got[i].exact_match == int(pt == rt)


@given(
    samples=st.lists(
        st.tuples(st.integers(0, 3), st.booleans()), min_size=1, max_size=40
    ),
    k=st.integers(1, 4),
)
@SET
def test_pass_at_k_matches_comb_formula(spark, samples, k):
    from feature_engineering_tk_spark.operators.evals import pass_at_k

    df = spark.createDataFrame(samples, "problem_id int, correct boolean")
    got = {r.problem_id: r.pass_at_k for r in pass_at_k(df, k=k).collect()}
    by_p: dict = {}
    for p, c in samples:
        n, cc = by_p.get(p, (0, 0))
        by_p[p] = (n + 1, cc + int(c))
    for p, (n, c) in by_p.items():
        if n < k:
            assert p not in got
            continue
        exact = 1.0 - math.comb(n - c, k) / math.comb(n, k) if n - c >= k else 1.0
        # engine uses the telescoped float product; agree to float slack
        assert abs(got[p] - exact) < 1e-12


@given(
    votes=st.lists(
        st.tuples(st.integers(0, 2), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_majority_vote_matches_counter(spark, votes):
    from feature_engineering_tk_spark.operators.evals import majority_vote

    df = spark.createDataFrame(
        [(p, a, "b") for p, a in votes], "problem_id int, answer string, reference string"
    )
    got = {r.problem_id: r for r in majority_vote(df).collect()}
    by_p: dict = {}
    for p, a in votes:
        by_p.setdefault(p, []).append(a)
    for p, ans in by_p.items():
        c = Counter(ans)
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got[p].modal_answer == best[0]
        assert got[p].modal_count == best[1]
        assert got[p].n_samples == len(ans)
        assert got[p].is_correct == int(best[0] == "b")


@given(
    ratings=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 1), st.sampled_from(["x", "y", "z"])),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_cohen_kappa_matches_bruteforce(spark, ratings):
    from feature_engineering_tk_spark.analysis.agreement import cohen_kappa
    from feature_engineering_tk_spark.exceptions import InsufficientDataError

    df = spark.createDataFrame(ratings, "item_id int, rater_id int, label string")
    # brute force: min label per (item, rater), paired items only
    per: dict = {}
    for i, r, l in ratings:
        key = (i, r)
        per[key] = min(per[key], l) if key in per else l
    items = sorted({i for i, _ in per})
    paired = [
        (per[(i, 0)], per[(i, 1)])
        for i in items
        if (i, 0) in per and (i, 1) in per
    ]
    if not paired:
        import pytest as _pt

        with _pt.raises(InsufficientDataError):
            cohen_kappa(df)
        return
    n = len(paired)
    agree = sum(a == b for a, b in paired)
    ca, cb = Counter(a for a, _ in paired), Counter(b for _, b in paired)
    pe_num = sum(ca[l] * cb.get(l, 0) for l in ca)
    row = cohen_kappa(df).collect()[0]
    assert row.n_items == n and row.po == agree / n
    den = n * n - pe_num
    assert row.kappa == (0.0 if den == 0 else (agree * n - pe_num) / den)


@given(pairs=st.lists(st.tuples(words, words), min_size=1, max_size=10))
@SET
def test_bleu_matches_bruteforce(spark, pairs):
    from feature_engineering_tk_spark.functions.text import bleu_score

    max_n = 3
    df = spark.createDataFrame(
        [(i, p, r) for i, (p, r) in enumerate(pairs)], "id int, pred string, ref string"
    )
    got = {r.id: r for r in bleu_score(df, max_n=max_n).collect()}

    def grams(toks, n):
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    for i, (p, r) in enumerate(pairs):
        pt, rt = p.lower().split(), r.lower().split()
        row = got[i]
        logs, zero = [], False
        for n in range(1, max_n + 1):
            pg, rg = grams(pt, n), grams(rt, n)
            clip = sum((Counter(pg) & Counter(rg)).values())
            assert row[f"match_{n}"] == clip
            assert row[f"total_{n}"] == len(pg)
            if clip == 0 or not pg:
                zero = True
            else:
                logs.append(math.log(clip / len(pg)))
        if not pt:
            exp_bp = 0.0
        elif len(pt) > len(rt):
            exp_bp = 1.0
        else:
            exp_bp = math.exp(1.0 - len(rt) / len(pt))
        assert row.brevity_penalty == round(exp_bp, 9)
        exp = 0.0 if zero else exp_bp * math.exp(sum(logs) / max_n)
        assert abs(row.bleu - round(exp, 9)) <= 1e-9


@given(
    gen=st.lists(words, min_size=1, max_size=8),
    corpus=st.lists(words, min_size=0, max_size=8),
)
@SET
def test_ngram_novelty_matches_bruteforce(spark, gen, corpus):
    from feature_engineering_tk_spark.functions.text import ngram_novelty

    n = 2
    gdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(gen)], "doc_id int, text string"
    )
    cdf = spark.createDataFrame([(t,) for t in corpus], "text string")

    def grams(text):
        toks = text.lower().split()
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    seen = {g for t in corpus for g in grams(t)}
    got = {r.doc_id: r for r in ngram_novelty(gdf, cdf, n=n).collect()}
    assert set(got) == set(range(len(gen)))  # short docs preserved
    for i, t in enumerate(gen):
        gs = grams(t)
        novel = sum(1 for g in gs if g not in seen)
        assert got[i].total_grams == len(gs)
        assert got[i].novel_grams == novel
        if gs:
            assert got[i].novelty == novel / len(gs)
        else:
            assert got[i].novelty is None


@given(pairs=st.lists(st.tuples(words, words), min_size=1, max_size=10))
@SET
def test_rouge_matches_bruteforce(spark, pairs):
    from feature_engineering_tk_spark.functions.text import rouge_n

    df = spark.createDataFrame(
        [(i, p, r) for i, (p, r) in enumerate(pairs)], "id int, pred string, ref string"
    )
    got = {r.id: r for r in rouge_n(df, max_n=2).collect()}
    for i, (p, r) in enumerate(pairs):
        pt, rt = p.lower().split(), r.lower().split()
        for n in (1, 2):
            pg = [" ".join(pt[j : j + n]) for j in range(len(pt) - n + 1)]
            rg = [" ".join(rt[j : j + n]) for j in range(len(rt) - n + 1)]
            match = sum((Counter(pg) & Counter(rg)).values())
            row = got[i]
            assert row[f"r{n}_match"] == match
            assert row[f"r{n}_pred_total"] == len(pg)
            assert row[f"r{n}_ref_total"] == len(rg)
            prec = match / len(pg) if pg else 0.0
            rec = match / len(rg) if rg else 0.0
            f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
            assert abs(row[f"rouge{n}_p"] - round(prec, 9)) <= 1e-9
            assert abs(row[f"rouge{n}_r"] - round(rec, 9)) <= 1e-9
            assert abs(row[f"rouge{n}_f"] - round(f1, 9)) <= 1e-9


@given(
    ref_vals=st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=30),
    cur_vals=st.lists(st.sampled_from(["b", "c", "d", "e"]), min_size=1, max_size=30),
)
@SET
def test_js_divergence_matches_bruteforce(spark, ref_vals, cur_vals):
    from feature_engineering_tk_spark.analysis.drift import js_divergence_table

    ra = spark.createDataFrame([(v,) for v in ref_vals], "v string")
    cb = spark.createDataFrame([(v,) for v in cur_vals], "v string")
    rows = js_divergence_table(ra, cb, "v").collect()
    rc, cc = Counter(ref_vals), Counter(cur_vals)
    tr, tc = len(ref_vals), len(cur_vals)
    exp_terms = {}
    for v in sorted(set(rc) | set(cc)):
        pr, pc = rc.get(v, 0) / tr, cc.get(v, 0) / tc
        m = (pr + pc) / 2.0
        half = (
            (pr * math.log(pr / m) if pr > 0 else 0.0)
            + (pc * math.log(pc / m) if pc > 0 else 0.0)
        ) / 2.0
        exp_terms[v] = round(half, 12)
    exp_total = round(sum(exp_terms.values()), 9)
    assert len(rows) == len(exp_terms)
    for row in rows:
        assert abs(row.js_term - round(exp_terms[row.value], 9)) <= 1e-9
        assert row.n_ref == rc.get(row.value, 0)
        assert row.n_cur == cc.get(row.value, 0)
        assert abs(row.js_total - exp_total) <= 1e-9
    # symmetry + identity: JSD(p, p) = 0
    same = js_divergence_table(ra, ra, "v").select("js_total").first()[0]
    assert same == 0.0


def test_js_divergence_empty_side_raises(spark):
    from feature_engineering_tk_spark.analysis.drift import js_divergence_table
    from feature_engineering_tk_spark.exceptions import InsufficientDataError

    import pytest

    a = spark.createDataFrame([("x",)], "v string")
    empty = spark.createDataFrame([], "v string")
    with pytest.raises(InsufficientDataError):
        js_divergence_table(a, empty, "v").collect()


@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["g1", "g2", "g3"]), words),
        min_size=1,
        max_size=15,
    ),
    top_k=st.integers(1, 3),
)
@SET
def test_cluster_keywords_matches_bruteforce(spark, docs, top_k):
    from feature_engineering_tk_spark.functions.text import cluster_keywords

    df = spark.createDataFrame(docs, "label string, text string")
    got = cluster_keywords(df, "label", "text", top_k=top_k).collect()
    tf: Counter = Counter()
    for lab, text in docs:
        for tok in text.lower().split():
            tf[(lab, tok)] += 1
    if not tf:
        assert got == []
        return
    ft: Counter = Counter()
    class_n: Counter = Counter()
    for (lab, tok), c in tf.items():
        ft[tok] += c
        class_n[lab] += c
    a = sum(class_n.values()) / len(class_n)
    exp = {}
    for (lab, tok), c in tf.items():
        exp[(lab, tok)] = round(c * math.log(1.0 + a / ft[tok]), 9)
    by_label: dict = {}
    for (lab, tok), s in exp.items():
        by_label.setdefault(lab, []).append((-s, tok))
    for lab, items in by_label.items():
        items.sort()
        want = items[:top_k]
        got_lab = sorted(
            [(-r.ctfidf, r.token) for r in got if r.label == lab]
        )
        # scores within float tolerance (JVM vs libm log can differ 1
        # ulp around a round-9 boundary); token sets exact unless the
        # top-k boundary itself is a near-tie
        assert len(got_lab) == len(want)
        boundary_tied = (
            len(items) > top_k and abs(items[top_k][0] - items[top_k - 1][0]) <= 2e-9
        )
        for (gs, gt), (ws, wt) in zip(got_lab, want):
            assert abs(-gs - -ws) <= 1e-9
            if not boundary_tied:
                assert gt == wt
    # ranks are 1..k dense per label
    for lab in by_label:
        ranks = sorted(r.rank for r in got if r.label == lab)
        assert ranks == list(range(1, len(ranks) + 1))


@given(pairs=st.lists(st.tuples(words, words), min_size=1, max_size=8))
@SET
def test_rouge_l_matches_bruteforce(spark, pairs):
    from feature_engineering_tk_spark.functions.text import rouge_l

    df = spark.createDataFrame(
        [(i, p, r) for i, (p, r) in enumerate(pairs)], "id int, pred string, ref string"
    )
    got = {r.id: r for r in rouge_l(df).collect()}
    for i, (p, r) in enumerate(pairs):
        pt, rt = p.lower().split(), r.lower().split()
        # classic O(n*m) DP
        row = [0] * (len(rt) + 1)
        for a in pt:
            new = [0]
            for j in range(1, len(rt) + 1):
                new.append(row[j - 1] + 1 if rt[j - 1] == a else max(row[j], new[-1]))
            row = new
        lcs = row[-1]
        g = got[i]
        assert g.lcs_len == lcs
        assert g.l_pred_total == len(pt) and g.l_ref_total == len(rt)
        prec = lcs / len(pt) if pt else 0.0
        rec = lcs / len(rt) if rt else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
        assert abs(g.rougeL_f - round(f1, 9)) <= 1e-9


def test_rouge_l_truncates_at_max_tokens(spark):
    from feature_engineering_tk_spark.functions.text import rouge_l

    long = " ".join(["w"] * 40)
    df = spark.createDataFrame([(long, long)], "pred string, ref string")
    g = rouge_l(df, max_tokens=10).first()
    assert g.l_pred_total == 10 and g.lcs_len == 10 and g.rougeL_f == 1.0
