"""Gold: daily executive-KPI aggregation (gold_finalize.py, CM:382-403).

One groupBy over the partition key with 19 aggregates. Intended-semantics
fixes (SURVEY.md §1.4):
  - Q2: the reference calls Python builtins sum/max (shadowed imports,
    CM:347 vs CM:386-402) — implemented as F.sum / F.max.
  - Q3: ``count(col(x) > pred)`` counts non-nulls, not matches — implemented
    as count_if (sum-of-indicator, partial-aggregable).

Scale: single hash aggregate keyed on the (partitioned) date column; all 19
aggregates partial-combine map-side, so the shuffle carries one row per
(date, mapper). countDistinct triggers Spark's two-phase distinct expansion;
approx variants are provided in operators.relational for the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_lakehouse_medallion_pipeline_spark.functions.scalars import count_if


def build_gold(silver: DataFrame) -> DataFrame:
    """Silver -> Gold daily executive dashboard (one row per interaction_date)."""
    return silver.groupBy("interaction_date").agg(
        F.countDistinct("customer_id").alias("daily_active_customers"),
        F.countDistinct("email_clean").alias("unique_email_addresses"),
        F.sum("transaction_amount").alias("total_daily_revenue"),
        F.avg("transaction_amount").alias("avg_transaction_value"),
        F.max("transaction_amount").alias("largest_transaction"),
        count_if(F.col("transaction_amount") > 0).alias("total_transactions"),
        F.sum(
            F.when(F.col("channel") == "web", F.col("transaction_amount")).otherwise(0)
        ).alias("web_revenue"),
        F.sum(
            F.when(F.col("channel") == "mobile_app", F.col("transaction_amount")).otherwise(0)
        ).alias("mobile_revenue"),
        F.sum(
            F.when(F.col("channel") == "store", F.col("transaction_amount")).otherwise(0)
        ).alias("store_revenue"),
        F.avg("engagement_score").alias("avg_engagement_score"),
        F.avg("time_on_site_seconds").alias("avg_time_on_site"),
        count_if(F.col("customer_journey_stage") == "conversion").alias("daily_conversions"),
        count_if(F.col("loyalty_member")).alias("loyalty_member_interactions"),
        F.sum("points_earned").alias("total_points_earned"),
        F.sum("points_redeemed").alias("total_points_redeemed"),
        F.countDistinct("support_ticket_id").alias("support_tickets_created"),
        F.avg("satisfaction_score").alias("avg_satisfaction_score"),
        count_if(F.col("churn_risk_indicator") == "high_risk").alias("high_churn_risk_customers"),
        F.sum("lifetime_value_estimate").alias("total_estimated_ltv"),
    )
