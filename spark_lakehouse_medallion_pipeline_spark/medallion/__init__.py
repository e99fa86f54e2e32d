from spark_lakehouse_medallion_pipeline_spark.medallion.generate import generate_bronze  # noqa: F401
from spark_lakehouse_medallion_pipeline_spark.medallion.silver import build_silver  # noqa: F401
from spark_lakehouse_medallion_pipeline_spark.medallion.gold import build_gold  # noqa: F401
from spark_lakehouse_medallion_pipeline_spark.medallion.pipeline import run_pipeline  # noqa: F401
