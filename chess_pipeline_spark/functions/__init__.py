from chess_pipeline_spark.functions.winprob import (  # noqa: F401
    WINPROB_COEF,
    lr_probabilities,
    lr_probabilities_pandas_udf,
)
