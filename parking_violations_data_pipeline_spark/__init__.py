"""PySpark-native analytics engine with the query/data-processing
capabilities of CityOfPhiladelphia/parking-violations-data-pipeline.

NOTE on reference citations: the reference mount /root/reference/ is
EMPTY in this sandbox (verified in SURVEY.md §0), so no file:line
citations into it are possible. Reference behavior is reconstructed
from public knowledge of the CityOfPhiladelphia parking-violations
dataset/pipeline and recorded per-claim in SURVEY.md with calibrated
confidence. The normative spec is the driver contract
(__spark_entry__.py + BASELINE.md + TESTDATA.md).

Architecture: DataFrame/SQL-first. Every operator is declared through
the public PySpark API so Catalyst handles pushdown, pruning, join
strategy, and AQE; Python touches data only in the explicitly-marked
Pandas-UDF paths (vector math fallback, multimodal decode plumbing).
"""

from parking_violations_data_pipeline_spark.session import get_spark
from parking_violations_data_pipeline_spark.catalog import load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]
__version__ = "0.1.0"
