"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``rafrafavi/mwa-uvdata-pipeline``
(surveyed in SURVEY.md).

The reference is a single-process Python package (mwa_utils) wrapping
pyuvdata/SSINS; this engine re-expresses every operator Spark-first:
DataFrame/SQL plans optimized by Catalyst, Structured Streaming for
event streams, Pandas UDFs only where built-ins cannot express the
semantics.

Layout
------
- ``session``     SparkSession factory (local AQE defaults)
- ``catalog``     file-set catalog: grouping, obsid/channel extraction
                  (reference: configurators.py:39-276, utils.py:49-130)
- ``validation``  V1-V8 multi-error validation report
                  (reference: configurators.py:136-185, processors.py:131-148)
- ``functions``   scalar function library: complex math, time reprs, text
- ``operators``   select surface, time differencing, INS, match filter,
                  multimodal plumbing, skew tooling
- ``sources``     format dispatch + reader registry (S2, §2.11)
- ``mwab``        binary visibility container + mwa_vis Python DataSource
- ``pipeline``    ReadOptions/PipelineConfig facade (SS.read → SSINS)
- ``sinks``       TSV sink, partitioned hypercube + bucketed writers
- ``plans``       query library (driver oracle surface, incl. dedup /
                  similarity / text / multimodal north-star entries)
- ``streaming``   Structured Streaming over the events table
"""

__version__ = "0.1.0"
