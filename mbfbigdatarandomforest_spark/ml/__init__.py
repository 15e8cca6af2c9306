from .features import build_feature_pipeline
from .metrics import adjusted_r2, regression_metrics
from .regressors import make_regressor, train_and_evaluate

__all__ = [
    "build_feature_pipeline",
    "adjusted_r2",
    "regression_metrics",
    "make_regressor",
    "train_and_evaluate",
]
