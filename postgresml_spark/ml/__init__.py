"""ML lifecycle: registry + train/predict/deploy (reference §2.I)."""

from postgresml_spark.ml.registry import Registry  # noqa: F401
from postgresml_spark.ml.train import train  # noqa: F401
from postgresml_spark.ml.predict import predict, predict_proba, decompose  # noqa: F401
from postgresml_spark.ml.deploy import deploy  # noqa: F401
from postgresml_spark.ml.tune import tune, build_text_dataset, UnigramTrainer  # noqa: F401
