from lets_talk_cdc_change_feed_playground_spark.plans.relational import ORACLE as RELATIONAL_ORACLE
from lets_talk_cdc_change_feed_playground_spark.plans.relational import QUERIES as RELATIONAL_QUERIES

__all__ = ["RELATIONAL_QUERIES", "RELATIONAL_ORACLE"]
