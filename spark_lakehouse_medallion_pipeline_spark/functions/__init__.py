from spark_lakehouse_medallion_pipeline_spark.functions.scalars import (  # noqa: F401
    clean_email,
    clean_phone,
    count_if,
    standardize_city,
    standardize_state,
    uniform,
)
