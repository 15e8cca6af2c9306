"""Feature pipeline (SURVEY.md §2.11 L1, §2.9 M1/M2).

The reference one-hot encodes via ``model.matrix`` — which silently
drops NA rows and empty levels (04_1_XGB_traintest.R:101-102,
04_2_XGB_forecast.R:437-438). The engine makes both explicit:
``df.na.drop`` before the pipeline, ``StringIndexer(handleInvalid=
'keep')`` so unseen levels at scoring time go to a reserved bucket
instead of crashing (R would error on new levels).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler


def build_feature_pipeline(
    categorical: list[str],
    numeric: list[str],
    *,
    features_col: str = "features",
    one_hot: bool = True,
    scale: bool = False,
) -> Pipeline:
    """Indexers → (optional) one-hot → assembler → (optional) scaler.

    ``one_hot=False`` is the tree-model path: MLlib trees consume index
    features directly and treat them as categorical via metadata, which
    beats exploding to dummies (smaller vectors, better splits).
    ``scale=True`` is the linear path (F9; StandardScaler withMean
    replicates R's ``scale()``, 03_LinearRegression.R:29-34).
    """
    stages = []
    cat_out = []
    if categorical:
        # ONE multi-column StringIndexer: all level dictionaries are
        # fitted in a single pass over the data instead of one
        # countByValue job per column
        stages.append(
            StringIndexer(
                inputCols=categorical,
                outputCols=[f"{c}_idx" for c in categorical],
                handleInvalid="keep",
            )
        )
    if one_hot and categorical:
        stages.append(
            OneHotEncoder(
                inputCols=[f"{c}_idx" for c in categorical],
                outputCols=[f"{c}_oh" for c in categorical],
                dropLast=False,
            )
        )
        cat_out = [f"{c}_oh" for c in categorical]
    elif categorical:
        cat_out = [f"{c}_idx" for c in categorical]

    assembled = "features_raw" if scale else features_col
    stages.append(
        VectorAssembler(
            inputCols=numeric + cat_out,
            outputCol=assembled,
            handleInvalid="skip",
        )
    )
    if scale:
        stages.append(
            StandardScaler(
                inputCol="features_raw",
                outputCol=features_col,
                withMean=True,
                withStd=True,
            )
        )
    return Pipeline(stages=stages)
