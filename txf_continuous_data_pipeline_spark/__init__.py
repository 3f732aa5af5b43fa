"""PySpark-native analytics engine with the query/data-processing
capabilities of ychuangab/TXF-Continuous-Data-Pipeline.

The reference (/root/reference/main.py, 597 lines of pandas) builds
back-adjusted continuous futures bars: 1-min OHLCV -> 5/60-min tumbling
windows -> day/night session split -> settlement-interval back-adjust ->
quality gates -> idempotent append. This package re-expresses every one of
those operators Spark-first (DataFrame/SQL, Catalyst-optimizable, no Python
UDFs on the hot path) and adds the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis) the testdata's
documents/embeddings tables exercise.

Layout (see SURVEY.md section 7):
    session.py            SparkSession factory
    sources/              parquet readers, incremental append sink
    functions/            pure column-expression helpers (session labels,
                          calendar math, time-of-day)
    operators/            resample, sessions, adjust, calendar, quality,
                          relational, dedup, similarity, textstats,
                          multimodal
    plans/                end-to-end pipeline composition
    streaming/            Structured Streaming variant (watermark +
                          foreachBatch idempotent sink)
"""

__version__ = "0.1.0"
