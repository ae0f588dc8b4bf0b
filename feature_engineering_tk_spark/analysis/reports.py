"""Report generation (reference §2.17 / §3 entry points).

- quick_analysis          data_analysis.py:559-706  — one-shot EDA
- generate_full_report    target_analyzer/reporting.py:28-115
- export_report           target_analyzer/reporting.py:117-142
  (markdown + JSON + HTML writers — `report_to_html` below; the plot
  layer itself lives in analysis/viz.py, SURVEY.md §2.18)

All heavy passes are distributed aggregations; the report assembles
collected scalars on the driver, mirroring the reference's flow where
`generate_full_report` runs every analysis once and reuses results.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame


def quick_analysis(df: DataFrame, max_corr_cols: int = 12) -> dict[str, Any]:
    """One-shot EDA over a DataFrame (data_analysis.py:559-706):
    shape/dtypes, missing, numeric + categorical summaries,
    cardinality, data-quality issues, high correlations."""
    from feature_engineering_tk_spark.analysis.eda import (
        get_basic_info,
        get_categorical_summary,
        get_high_correlations,
        get_missing_summary,
        get_numeric_summary,
        numeric_columns,
        validate_data_quality,
    )

    info = get_basic_info(df)
    num_cols = numeric_columns(df)[:max_corr_cols]
    return {
        "basic_info": info,
        "missing": get_missing_summary(df, total=info["rows"]),
        "numeric_summary": get_numeric_summary(df),
        "categorical_summary": get_categorical_summary(df),
        "quality": validate_data_quality(df),
        "high_correlations": get_high_correlations(df, columns=num_cols)
        if len(num_cols) >= 2
        else [],
    }


def generate_full_report(df: DataFrame, target: str) -> dict[str, Any]:
    """TargetAnalyzer full report (reporting.py:28-115): every analysis
    once, results reused — distribution, relationships, correlations,
    quality, suggestions, model recommendations."""
    from feature_engineering_tk_spark.analysis.eda import numeric_columns
    from feature_engineering_tk_spark.analysis.suggest import (
        recommend_models,
        suggest_feature_engineering,
    )
    from feature_engineering_tk_spark.analysis.target import TargetAnalyzer

    ta = TargetAnalyzer(df, target)
    features = [c for c in numeric_columns(df) if c != target]
    report: dict[str, Any] = {"target": target, "task": ta.task}
    if ta.task == "classification":
        report["class_distribution"] = ta.analyze_class_distribution()
        report["imbalance"] = ta.get_class_imbalance_info()
    else:
        report["target_distribution"] = ta.analyze_target_distribution()
    report["feature_relationships"] = ta.analyze_feature_target_relationship(features)
    report["feature_correlations"] = (
        ta.analyze_feature_correlations(features) if ta.task == "regression" else []
    )
    report["data_quality"] = ta.analyze_data_quality()
    report["suggestions"] = suggest_feature_engineering(df, features)
    n_rows = df.count()
    report["model_recommendations"] = recommend_models(
        n_rows,
        len(features),
        ta.task,
        imbalance_ratio=report.get("imbalance", {}).get("ratio"),
    )
    return report


def _md_section(title: str, body: str) -> str:
    return f"## {title}\n\n{body}\n"


def report_to_markdown(report: dict[str, Any]) -> str:
    """Markdown writer (reporting.py `_export_markdown`)."""
    parts = [f"# Target analysis: `{report.get('target', '?')}` ({report.get('task', '?')})\n"]
    if "class_distribution" in report:
        rows = "\n".join(
            f"| {d['class']} | {d['count']} | {d['pct']:.2f}% |"
            for d in report["class_distribution"]
        )
        parts.append(_md_section("Class distribution", "| class | count | % |\n|---|---|---|\n" + rows))
    if "target_distribution" in report:
        td = report["target_distribution"]
        body = "\n".join(f"- **{k}**: {v}" for k, v in td.items() if not isinstance(v, dict))
        parts.append(_md_section("Target distribution", body))
    if report.get("feature_relationships"):
        rows = "\n".join(
            f"| {r['feature']} | {r['test']} | {r['statistic']:.4g} | {r['pvalue']:.3g} |"
            for r in report["feature_relationships"]
        )
        parts.append(
            _md_section(
                "Feature–target relationships",
                "| feature | test | statistic | p |\n|---|---|---|---|\n" + rows,
            )
        )
    if report.get("suggestions"):
        body = "\n".join(
            f"- `{s['column']}`: {', '.join(s['suggestions'])}" for s in report["suggestions"]
        )
        parts.append(_md_section("Feature-engineering suggestions", body))
    if report.get("model_recommendations"):
        body = "\n".join(
            f"- [{m['priority']}] **{m['model']}** — {m['reason']}"
            for m in report["model_recommendations"]
        )
        parts.append(_md_section("Model recommendations", body))
    return "\n".join(parts)


def _esc(v: Any) -> str:
    return (
        str(v)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _html_table(headers: list[str], rows: list[list[Any]]) -> str:
    head = "".join(f"<th>{_esc(h)}</th>" for h in headers)
    body = "\n".join(
        "<tr>" + "".join(f"<td>{_esc(c)}</td>" for c in r) + "</tr>" for r in rows
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>\n{body}\n</tbody></table>"


_HTML_CSS = """
body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 64rem;
       color: #1a1a2e; line-height: 1.45; }
h1 { border-bottom: 2px solid #4a6fa5; padding-bottom: .3rem; }
h2 { color: #2d4a6f; margin-top: 1.6rem; }
table { border-collapse: collapse; margin: .6rem 0; }
th, td { border: 1px solid #c9d4e3; padding: .3rem .7rem; text-align: left; }
th { background: #eef2f8; }
.callout { border-left: 4px solid #d98324; background: #fdf6ec;
           padding: .5rem .9rem; margin: .6rem 0; }
.ok { border-left-color: #3a7d44; background: #eef7f0; }
""".strip()


def report_to_html(report: dict[str, Any]) -> str:
    """Self-contained HTML writer (reporting.py:144-727 surface:
    header, distribution, relationships, quality, suggestions,
    recommendations — no external assets, inline CSS)."""
    target = report.get("target", "?")
    task = report.get("task", "?")
    parts = [
        "<!DOCTYPE html>",
        f'<html><head><meta charset="utf-8"><title>Target analysis: {_esc(target)}</title>',
        f"<style>{_HTML_CSS}</style></head><body>",
        f"<h1>Target analysis: <code>{_esc(target)}</code> ({_esc(task)})</h1>",
    ]
    if "class_distribution" in report:
        parts.append("<h2>Class distribution</h2>")
        parts.append(
            _html_table(
                ["class", "count", "%", "imbalance ratio"],
                [
                    [d["class"], d["count"], f"{d['pct']:.2f}", f"{d.get('imbalance_ratio', 1):.2f}"]
                    for d in report["class_distribution"]
                ],
            )
        )
        imb = report.get("imbalance") or {}
        if imb:
            sev = str(imb.get("severity", "none"))
            cls = "callout" if sev in ("severe", "moderate") else "callout ok"
            parts.append(
                f'<div class="{cls}"><strong>Imbalance: {_esc(sev)}</strong>'
                f" — {_esc(imb.get('recommendation', 'classes are balanced'))}</div>"
            )
    if "target_distribution" in report:
        td = report["target_distribution"]
        parts.append("<h2>Target distribution</h2>")
        parts.append(
            _html_table(
                ["statistic", "value"],
                [[k, v] for k, v in td.items() if not isinstance(v, dict)],
            )
        )
    if report.get("feature_relationships"):
        parts.append("<h2>Feature–target relationships</h2>")
        parts.append(
            _html_table(
                ["feature", "test", "statistic", "p-value"],
                [
                    [r["feature"], r["test"], f"{r['statistic']:.4g}", f"{r['pvalue']:.3g}"]
                    for r in report["feature_relationships"]
                ],
            )
        )
    quality = report.get("data_quality") or {}
    if quality:
        parts.append("<h2>Data quality</h2>")
        items = []
        for key in ("leakage_suspects", "constant_features"):
            vals = quality.get(key) or []
            if vals:
                items.append(
                    f'<div class="callout"><strong>{_esc(key)}</strong>: '
                    + ", ".join(f"<code>{_esc(v)}</code>" for v in vals)
                    + "</div>"
                )
        parts.append("\n".join(items) or '<div class="callout ok">No issues detected.</div>')
    if report.get("suggestions"):
        parts.append("<h2>Feature-engineering suggestions</h2><ul>")
        for s in report["suggestions"]:
            parts.append(
                f"<li><code>{_esc(s['column'])}</code>: {_esc(', '.join(s['suggestions']))}</li>"
            )
        parts.append("</ul>")
    if report.get("model_recommendations"):
        parts.append("<h2>Model recommendations</h2><ul>")
        for m in report["model_recommendations"]:
            parts.append(
                f"<li>[{_esc(m['priority'])}] <strong>{_esc(m['model'])}</strong>"
                f" — {_esc(m['reason'])}</li>"
            )
        parts.append("</ul>")
    parts.append("</body></html>")
    return "\n".join(parts)


def export_report(report: dict[str, Any], path: str, fmt: str = "markdown") -> str:
    """Write the report (reporting.py:117-142). fmt ∈ {markdown, json,
    html}."""
    if fmt == "json":
        content = json.dumps(report, indent=2, default=str)
    elif fmt == "markdown":
        content = report_to_markdown(report)
    elif fmt == "html":
        content = report_to_html(report)
    else:
        raise ValueError(f"unsupported format: {fmt}")
    with open(path, "w") as fh:
        fh.write(content)
    return path


def generate_summary_report(df: DataFrame, target: str, width: int = 40) -> str:
    """ASCII summary report with text bar charts
    (target_analyzer/core.py:260-369): class distribution or target
    histogram, top feature relationships, quality flags — driver-side
    string building over the same collected aggregates as
    :func:`generate_full_report`."""
    rep = generate_full_report(df, target)
    lines = [
        "=" * (width + 24),
        f"TARGET ANALYSIS: {target}  (task: {rep['task']})",
        "=" * (width + 24),
    ]
    if "class_distribution" in rep:
        lines.append("\nClass distribution:")
        mx = max(d["count"] for d in rep["class_distribution"]) or 1
        for d in rep["class_distribution"]:
            bar = "#" * max(1, round(width * d["count"] / mx))
            lines.append(f"  {str(d['class'])[:12]:>12} | {bar} {d['count']} ({d['pct']:.1f}%)")
        imb = rep.get("imbalance", {})
        if imb:
            lines.append(
                f"  imbalance ratio {imb['ratio']:.2f} -> {imb['severity']}"
            )
    else:
        td = rep["target_distribution"]
        lines.append("\nTarget distribution:")
        for k in ("count", "mean", "median", "std", "min", "max", "skew", "kurtosis"):
            if k in td:
                v = td[k]
                lines.append(f"  {k:>10}: {v:.4g}" if isinstance(v, float) else f"  {k:>10}: {v}")
    rels = rep.get("feature_relationships", [])
    if rels:
        lines.append("\nTop feature relationships (by p-value):")
        import math as _m

        for r in sorted(rels, key=lambda r: r["pvalue"] if not _m.isnan(r["pvalue"]) else 1.0)[:10]:
            sig = "***" if r["pvalue"] < 0.001 else "**" if r["pvalue"] < 0.01 else "*" if r["pvalue"] < 0.05 else ""
            lines.append(
                f"  {r['feature'][:20]:>20} {r['test']:>10} stat={r['statistic']:.4g} p={r['pvalue']:.3g} {sig}"
            )
    sugg = rep.get("suggestions", [])
    todo = [s for s in sugg if s["suggestions"] != ["none"]]
    if todo:
        lines.append("\nSuggested transforms:")
        for s in todo[:10]:
            lines.append(f"  {s['column'][:20]:>20}: {', '.join(s['suggestions'])}")
    recs = rep.get("model_recommendations", [])
    if recs:
        lines.append("\nModel recommendations:")
        for m in recs:
            lines.append(f"  [{m['priority']}] {m['model']} — {m['reason']}")
    lines.append("=" * (width + 24))
    return "\n".join(lines)


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
    lang_col: str | None = None,
    source_col: str | None = None,
    short_doc_tokens: int = 5,
    top_k: int = 10,
) -> dict[str, Any]:
    """Dataset-card summary for a document corpus: size, token/char
    distribution, short/empty rates, exact-duplicate rate, and top
    language/source shares — the numbers a training-data release doc
    leads with.

    Cost: one full-corpus aggregation job for every scalar (token
    counts, char counts, rates, distinct text hashes — all partial-
    aggregatable, computed in a single ``agg``), plus one tiny
    ``groupBy`` per requested categorical facet. No collect beyond
    aggregate-sized rows.
    """
    from pyspark.sql import functions as F

    toks = F.size(
        F.filter(F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                 lambda x: x != "")
    ).cast("bigint")
    chars = F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("bigint")
    base = df.select(
        toks.alias("_t"),
        chars.alias("_c"),
        F.xxhash64(F.coalesce(F.col(text_col), F.lit(""))).alias("_h"),
    )
    row = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_t").alias("total_tokens"),
        F.sum("_c").alias("total_chars"),
        F.avg("_t").alias("mean_tokens"),
        F.max("_t").alias("max_tokens"),
        F.sum((F.col("_t") == 0).cast("bigint")).alias("n_empty"),
        F.sum((F.col("_t") < short_doc_tokens).cast("bigint")).alias("n_short"),
        F.countDistinct("_h").alias("n_distinct_texts"),
    ).first()
    n = row["n_docs"]
    out: dict[str, Any] = {
        "n_docs": int(n),
        "total_tokens": int(row["total_tokens"] or 0),
        "total_chars": int(row["total_chars"] or 0),
        "mean_tokens": float(row["mean_tokens"]) if n else None,
        "max_tokens": int(row["max_tokens"] or 0),
        "empty_rate": (row["n_empty"] / n) if n else None,
        "short_rate": (row["n_short"] / n) if n else None,
        "exact_dup_rate": (1.0 - row["n_distinct_texts"] / n) if n else None,
    }
    for key, col in (("languages", lang_col), ("sources", source_col)):
        if col:
            rows = (
                df.groupBy(col)
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), F.col(col).asc())
                .limit(top_k)
                .collect()
            )
            out[key] = [
                {"value": r[col], "n": int(r["n"]), "share": r["n"] / n}
                for r in rows
            ]
    return out


def corpus_report_facet_table(
    df: DataFrame,
    text_col: str = "text",
    facet_col: str = "source",
    short_doc_tokens: int = 5,
    top_k: int = 10,
) -> DataFrame:
    """The distributed core of :func:`corpus_report` as ONE oracled
    table: the top-k facet rows (by count, facet-value tiebreak) joined
    with the corpus scalars — (facet, n_facet, share, n_docs,
    total_tokens, mean_tokens, empty_rate, short_rate, exact_dup_rate).

    Scale shape: one partial-aggregatable full-corpus ``agg`` for the
    scalars, one tiny ``groupBy(facet)``, then a broadcast of the
    1-row scalar table onto ≤ top_k rows. Ratios are computed as
    explicit sum/count divisions rounded to 9 dp so any engine replays
    them bit-for-bit. Duplicate detection counts distinct text values
    (not hashes) so the oracle needs no hash-function parity.
    """
    from pyspark.sql import functions as F

    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.size(
        F.filter(F.split(F.trim(txt), r"\s+"), lambda x: x != "")
    ).cast("bigint")
    base = df.select(F.col(facet_col).alias("facet"), toks.alias("_t"), txt.alias("_x"))
    scalars = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_t").alias("total_tokens"),
        F.sum((F.col("_t") == 0).cast("bigint")).alias("_n_empty"),
        F.sum((F.col("_t") < short_doc_tokens).cast("bigint")).alias("_n_short"),
        F.countDistinct("_x").alias("_n_distinct"),
    ).select(
        "n_docs",
        "total_tokens",
        F.round(F.col("total_tokens") / F.col("n_docs"), 9).alias("mean_tokens"),
        F.round(F.col("_n_empty") / F.col("n_docs"), 9).alias("empty_rate"),
        F.round(F.col("_n_short") / F.col("n_docs"), 9).alias("short_rate"),
        F.round(1.0 - F.col("_n_distinct") / F.col("n_docs"), 9).alias("exact_dup_rate"),
    )
    facets = (
        base.groupBy("facet")
        .agg(F.count(F.lit(1)).alias("n_facet"))
        .orderBy(F.col("n_facet").desc(), F.col("facet").asc())
        .limit(top_k)
    )
    return facets.crossJoin(F.broadcast(scalars)).select(
        "facet",
        "n_facet",
        F.round(F.col("n_facet") / F.col("n_docs"), 9).alias("share"),
        "n_docs",
        "total_tokens",
        "mean_tokens",
        "empty_rate",
        "short_rate",
        "exact_dup_rate",
    )


def corpus_report_markdown(report: dict[str, Any]) -> str:
    """Render a corpus_report dict as the markdown dataset-card
    skeleton."""
    lines = ["# Corpus report", ""]
    for k in ("n_docs", "total_tokens", "total_chars", "mean_tokens",
              "max_tokens", "empty_rate", "short_rate", "exact_dup_rate"):
        v = report.get(k)
        if isinstance(v, float):
            v = round(v, 6)
        lines.append(f"- **{k}**: {v}")
    for facet in ("languages", "sources"):
        if facet in report:
            lines += ["", f"## Top {facet}", ""]
            for e in report[facet]:
                lines.append(
                    f"- {e['value']}: {e['n']} ({round(e['share'] * 100, 2)}%)"
                )
    return "\n".join(lines) + "\n"
