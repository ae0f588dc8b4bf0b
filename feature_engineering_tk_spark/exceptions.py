"""Typed exception hierarchy — reference ``exceptions.py:8-97`` parity.

Same class names and attributes as the reference so callers that catch
``InvalidStrategyError`` / ``EmptyDataFrameError`` etc. port over
unchanged. One deliberate deviation: ``ValidationError`` additionally
inherits ``ValueError`` (and ``TransformerNotFittedError`` inherits
``RuntimeError``) so pre-existing callers that caught the builtin
types keep working — the typed classes narrow, never break, the old
contract.
"""

from __future__ import annotations


class MLToolkitError(Exception):
    """Base class for every engine-raised error."""


class ValidationError(MLToolkitError, ValueError):
    """Input validation failed."""


class ColumnNotFoundError(ValidationError):
    """A requested column is absent from the DataFrame schema. Raised
    at the facade boundary (api._require_columns) BEFORE any job runs,
    so a typo fails in milliseconds instead of after a cluster scan."""

    def __init__(self, column_name: str, available_columns: list | None = None):
        self.column_name = column_name
        self.available_columns = available_columns
        msg = f"Column '{column_name}' not found in dataframe"
        if available_columns:
            shown = list(available_columns)[:10]
            msg += f". Available columns: {shown}"
            if len(available_columns) > 10:
                msg += f"... ({len(available_columns)} total)"
        super().__init__(msg)


class InvalidStrategyError(ValidationError):
    """An imputation/outlier strategy name is not one the engine
    implements; carries the offending name and the valid set."""

    def __init__(self, strategy: str, valid_strategies: list):
        self.strategy = strategy
        self.valid_strategies = list(valid_strategies)
        super().__init__(
            f"Invalid strategy '{strategy}'. Valid strategies: {self.valid_strategies}"
        )


class InvalidMethodError(ValidationError):
    """A scaler/detector method name is unknown (e.g. scale method not
    in standard/minmax/robust)."""

    def __init__(self, method: str, valid_methods: list):
        self.method = method
        self.valid_methods = list(valid_methods)
        super().__init__(f"Invalid method '{method}'. Valid methods: {self.valid_methods}")


class DataTypeError(ValidationError):
    """A column's Spark type doesn't match what the operator needs."""

    def __init__(self, column_name: str, expected_type: str, actual_type: str):
        self.column_name = column_name
        self.expected_type = expected_type
        self.actual_type = actual_type
        super().__init__(
            f"Column '{column_name}' has type '{actual_type}', expected '{expected_type}'"
        )


class EmptyDataFrameError(ValidationError):
    """Operation requires a non-empty DataFrame."""


class InsufficientDataError(ValidationError):
    """Too few rows for a statistical routine's minimum n."""

    def __init__(self, operation: str, required: int, actual: int):
        self.operation = operation
        self.required = required
        self.actual = actual
        super().__init__(
            f"Insufficient data for {operation}: requires {required} rows, got {actual}"
        )


class TransformerNotFittedError(MLToolkitError, RuntimeError):
    """transform()/save before fit(): the transformer has no state_
    (transforms/state.py FittedStateMixin guards every transform)."""

    def __init__(self, transformer_type: str):
        self.transformer_type = transformer_type
        super().__init__(
            f"No {transformer_type} transformers have been fitted. Call a fit method first."
        )


class ConstantColumnError(ValidationError):
    """Zero-variance column where distinct values are required, e.g.
    quantile binning would produce a single collapsed edge."""

    def __init__(self, column_name: str, operation: str):
        self.column_name = column_name
        self.operation = operation
        super().__init__(
            f"Cannot perform {operation} on constant column '{column_name}' (zero variance)"
        )


class ConvergenceError(MLToolkitError, RuntimeError):
    """An iterative algorithm hit its iteration cap while still making
    progress — the partial result would be silently wrong (e.g.
    connected-components labels not yet merged), so the engine raises
    instead of returning it."""

    def __init__(self, algorithm: str, max_iter: int, detail: str = ""):
        self.algorithm = algorithm
        self.max_iter = max_iter
        msg = f"{algorithm} did not converge within max_iter={max_iter}"
        if detail:
            msg += f" ({detail})"
        super().__init__(msg)
