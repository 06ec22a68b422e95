"""Query plans: the declared-query registry consumed by __spark_entry__."""
