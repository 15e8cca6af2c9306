"""Custom pipeline stages (SURVEY.md §7 M4).

``RareLevelCollapser`` is the F7 rare-level→'Other' operator
(02_DataCleaning.R:243-261, addFactorOther) packaged as an MLlib
Estimator/Model pair so it LIVES INSIDE a persisted Pipeline: the
fitted rare-level lists save/load with the model (S5), exactly like
the reference's factor levels travel with its saved objects. The
standalone function form is ``operators.cleaning.collapse_rare_levels``
(same single-job frequency pass).

Persistence uses DefaultParams read/write — the fitted state is stored
in a JSON string Param, so no custom readers are needed.
"""

from __future__ import annotations

import json

from pyspark import keyword_only
from pyspark.ml import Estimator, Model
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _RareLevelParams(Params):
    inputCols = Param(
        Params._dummy(), "inputCols", "categorical columns to collapse",
        typeConverter=TypeConverters.toListString,
    )
    threshold = Param(
        Params._dummy(), "threshold", "frequency share below which a level is rare",
        typeConverter=TypeConverters.toFloat,
    )
    otherLabel = Param(
        Params._dummy(), "otherLabel", "replacement label for rare levels",
        typeConverter=TypeConverters.toString,
    )

    def getInputCols(self) -> list[str]:
        return self.getOrDefault(self.inputCols)

    def getThreshold(self) -> float:
        return self.getOrDefault(self.threshold)

    def getOtherLabel(self) -> str:
        return self.getOrDefault(self.otherLabel)


class RareLevelCollapser(
    Estimator, _RareLevelParams, DefaultParamsReadable, DefaultParamsWritable
):
    """Estimator: one melted groupBy job profiles ALL target columns,
    rare levels (share < threshold) become the fitted state."""

    @keyword_only
    def __init__(self, inputCols=None, threshold=0.01, otherLabel="Other"):
        super().__init__()
        self._setDefault(threshold=0.01, otherLabel="Other")
        self._set(**{k: v for k, v in self._input_kwargs.items() if v is not None})

    def _fit(self, dataset: DataFrame) -> "RareLevelCollapserModel":
        cols = self.getInputCols()
        melted = dataset.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col"),
                            F.col(c).cast("string").alias("level"),
                        )
                        for c in cols
                    ]
                )
            ).alias("cl")
        ).select("cl.col", "cl.level")
        counts = melted.groupBy("col", "level").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
        total = sum(r["n"] for r in counts) // len(cols) if counts else 0
        rare: dict[str, list[str]] = {c: [] for c in cols}
        for r in counts:
            if r["level"] is not None and total and r["n"] / total < self.getThreshold():
                rare[r["col"]].append(r["level"])
        model = RareLevelCollapserModel(
            inputCols=cols,
            otherLabel=self.getOtherLabel(),
            rareLevelsJson=json.dumps({c: sorted(v) for c, v in rare.items()}),
        )
        return self._copyValues(model, extra={})


class RareLevelCollapserModel(
    Model, _RareLevelParams, DefaultParamsReadable, DefaultParamsWritable
):
    """Fitted collapse: rare-level lists are a JSON Param, so the model
    round-trips through Pipeline save/load with no custom reader."""

    rareLevelsJson = Param(
        Params._dummy(), "rareLevelsJson", "fitted rare levels per column (JSON)",
        typeConverter=TypeConverters.toString,
    )

    @keyword_only
    def __init__(self, inputCols=None, otherLabel="Other", rareLevelsJson="{}"):
        super().__init__()
        self._setDefault(otherLabel="Other", rareLevelsJson="{}")
        self._set(**{k: v for k, v in self._input_kwargs.items() if v is not None})

    def getRareLevels(self) -> dict[str, list[str]]:
        return json.loads(self.getOrDefault(self.rareLevelsJson))

    def _transform(self, dataset: DataFrame) -> DataFrame:
        other = self.getOtherLabel()
        out = dataset
        for c, rare in self.getRareLevels().items():
            if rare:
                out = out.withColumn(
                    c,
                    F.when(
                        F.col(c).cast("string").isin(rare), F.lit(other)
                    ).otherwise(F.col(c)),
                )
        return out
