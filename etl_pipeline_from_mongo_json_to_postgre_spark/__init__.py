"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL pipeline (Mongo-JSON -> Postgres).

Brand-new, Spark-first design: declarative DataFrame/SQL plans compiled
from mapping configs, Catalyst does the optimization, JDBC for the
Postgres boundary, Structured Streaming for incremental loads, plus
large-scale training-data operators (dedup, similarity, text analysis,
multimodal plumbing) that the reference lacks but a 100 TB pipeline needs.
"""

__version__ = "0.1.0"
