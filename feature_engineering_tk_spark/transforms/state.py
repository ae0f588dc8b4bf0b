"""Fitted-state persistence — the distributed analog of the
reference's ``save_transformers``/``load_transformers``
(``feature_engineering.py:705-747``).

Every fit/transform pair in this package keeps its fitted statistics
as a plain JSON-serializable dict so checkpoints can persist state and
resume derives transforms FROM ARTIFACTS, never refitting mid-run
(determinism requirement of checkpoint resume)."""

from __future__ import annotations

import json
import math
import os
from typing import Any


def _sanitize(o: Any) -> Any:
    if isinstance(o, float):
        if math.isnan(o):
            return {"__float__": "nan"}
        if math.isinf(o):
            return {"__float__": "inf" if o > 0 else "-inf"}
        return o
    if isinstance(o, dict):
        return {k: _sanitize(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_sanitize(v) for v in o]
    return o


def _restore(o: Any) -> Any:
    if isinstance(o, dict):
        if set(o) == {"__float__"}:
            return {"nan": float("nan"), "inf": float("inf"), "-inf": float("-inf")}[o["__float__"]]
        return {k: _restore(v) for k, v in o.items()}
    if isinstance(o, list):
        return [_restore(v) for v in o]
    return o


class FittedStateMixin:
    """Mixin giving every transformer JSON round-trip of its ``state_``."""

    state_: dict | None = None

    def _require_fitted(self):
        if self.state_ is None:
            from feature_engineering_tk_spark.exceptions import TransformerNotFittedError

            raise TransformerNotFittedError(type(self).__name__)

    def to_json(self) -> str:
        self._require_fitted()
        return json.dumps(
            {"class": type(self).__name__, "params": self.get_params(), "state": _sanitize(self.state_)}
        )

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def from_json(cls, s: str):
        payload = json.loads(s)
        obj = cls(**payload.get("params", {}))
        obj.state_ = _restore(payload["state"])
        return obj

    @classmethod
    def load(cls, path: str):
        with open(path) as f:
            return cls.from_json(f.read())

    def get_params(self) -> dict:
        return {}


def _registry() -> dict[str, type]:
    from feature_engineering_tk_spark.transforms.binning import (
        EdgeBinner,
        QuantileBinner,
        UniformBinner,
    )
    from feature_engineering_tk_spark.transforms.encode import (
        CountEncoder,
        LabelEncoder,
        OneHotEncoder,
        OrdinalEncoder,
        RareCategoryGrouper,
        TargetEncoder,
        WoEEncoder,
    )
    from feature_engineering_tk_spark.transforms.impute import Imputer
    from feature_engineering_tk_spark.transforms.outliers import OutlierDetector
    from feature_engineering_tk_spark.transforms.scale import Scaler, YeoJohnsonTransformer

    return {
        c.__name__: c
        for c in (
            EdgeBinner,
            QuantileBinner,
            UniformBinner,
            LabelEncoder,
            OneHotEncoder,
            OrdinalEncoder,
            Imputer,
            OutlierDetector,
            Scaler,
            CountEncoder,
            TargetEncoder,
            RareCategoryGrouper,
            WoEEncoder,
            YeoJohnsonTransformer,
        )
    }


def save_transformers(transformers: dict[str, "FittedStateMixin"], path: str) -> None:
    """Bundle every fitted transformer into ONE JSON artifact — the
    distributed analog of the reference's joblib-pickled
    ``save_transformers`` (feature_engineering.py:705-747), except the
    artifact is plain JSON: readable, diffable, and loadable on any
    executor without pickle-version coupling."""
    payload = {name: json.loads(t.to_json()) for name, t in transformers.items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


def load_transformers(path: str, registry: dict[str, type] | None = None) -> dict[str, "FittedStateMixin"]:
    """Rebuild fitted transformers from a ``save_transformers`` bundle
    (feature_engineering.py:726-747): resume derives transforms FROM
    ARTIFACTS — never refits — so a resumed run is bit-identical."""
    reg = registry or _registry()
    with open(path) as f:
        payload = json.load(f)
    out: dict[str, FittedStateMixin] = {}
    for name, blob in payload.items():
        cls = reg[blob["class"]]
        out[name] = cls.from_json(json.dumps(blob))
    return out
