"""PySpark-native analytics engine with the query and data-processing
capabilities of riptano/kafka-cassandra-plugin (KIP-30 Cassandra-backed
leader election + change-notification), generalized to the relational /
streaming closure and extended with LLM-training-data operators.

See SURVEY.md for the full blueprint and operator inventory.
"""

from .engine import Engine
from .session import get_spark

__all__ = ["Engine", "get_spark"]
