"""feature_engineering_tk_spark — a from-scratch PySpark-native
point-in-time feature-engineering engine.

Re-imagines the transform semantics of the reference toolkit
(``bluelion1999/feature_engineering_tk``, a single-process pandas
library) as a distributed, leakage-free, checkpoint-resumable feature
pipeline over partitioned transcript tables:

- ``operators``  — as-of join, window features (lag/lead/rolling/
  backfill), sessionization, dedup (exact/MinHash-LSH/SimHash), row ops
- ``transforms`` — fit/transform pairs with persistable state
  (impute, encode, scale, bin, outliers)
- ``functions``  — column expression libraries (strings, datetime,
  numeric constructors, text analysis, similarity search)
- ``analysis``   — distributed sufficient-statistics EDA + driver-side
  statistical formulas (effect sizes, CIs, FDR)
- ``plans``      — pipeline builder with per-stage lineage + metrics,
  checkpoint manifest and resume, leakage guard

Everything is expressed as DataFrame operations plus vectorized
pandas/Arrow UDFs — never per-row Python ``udf``.
"""

__version__ = "0.2.0"

_EXCEPTION_NAMES = (
    "MLToolkitError",
    "ValidationError",
    "ColumnNotFoundError",
    "InvalidStrategyError",
    "InvalidMethodError",
    "DataTypeError",
    "EmptyDataFrameError",
    "InsufficientDataError",
    "TransformerNotFittedError",
    "ConstantColumnError",
    "ConvergenceError",
)

from feature_engineering_tk_spark.session import get_spark  # noqa: F401


def __getattr__(name):
    """Reference-shaped facade classes, lazily imported so ``import
    feature_engineering_tk_spark`` stays dependency-light:
    DataPreprocessor / FeatureEngineer / DataAnalyzer (api.py),
    TargetAnalyzer (analysis.target), FeatureSelector
    (analysis.selection)."""
    if name in (
        "DataPreprocessor",
        "FeatureEngineer",
        "DataAnalyzer",
        "TranscriptAnalyzer",
        "EvalSuite",
    ):
        from feature_engineering_tk_spark import api

        return getattr(api, name)
    if name == "TargetAnalyzer":
        from feature_engineering_tk_spark.analysis.target import TargetAnalyzer

        return TargetAnalyzer
    if name == "FeatureSelector":
        from feature_engineering_tk_spark.analysis.selection import FeatureSelector

        return FeatureSelector
    if name in _EXCEPTION_NAMES:
        from feature_engineering_tk_spark import exceptions

        return getattr(exceptions, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
