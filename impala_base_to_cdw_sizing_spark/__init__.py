"""PySpark-native analytics engine with the query and data-processing
capabilities of kevinbtalbert/Impala-Base-to-CDW-Sizing.

This is NOT a port of the reference script (a single-threaded Python 2
row-at-a-time analyzer, ``/root/reference/impala_query_sizing.py``). It is a
brand-new engine built Spark-first: every operator is a pure
``DataFrame -> DataFrame`` transform declared with the DataFrame / Spark SQL
API so Catalyst + Tungsten pick the physical strategy. Designed for 100 TB
inputs: no driver-side row loops on data paths, segmented fallbacks for
global-ordered windows, broadcast joins for small dimensions.

Layout
------
- ``config``      sizing parameters (the reference's ``sizing.conf`` contract)
- ``schemas``     explicit StructType schemas + the size-bucket dimension
- ``sources/``    file readers, the CM REST paginated source, synthetic adapters
- ``operators/``  derive / classify / route / sweep / aggregate / dedup /
                  similarity / text / multimodal
- ``plans/``      end-to-end pipelines (EP2 replay) and report assembly
- ``sinks/``      CSV / text sinks mirroring the reference's three outputs
- ``streaming/``  Structured Streaming variant of the concurrency sweep
"""

__version__ = "0.1.0"
