"""pliers_spark — a from-scratch, PySpark-native feature-engineering engine.

Re-expresses the capabilities of the pliers feature-extraction framework
(reference: PsychoinformaticsLab/pliers, surveyed in SURVEY.md) as an
idiomatic Spark engine:

- one canonical fact table ``pages(url, warc_ts, html, text, lang)``
  (BASELINE.json input_hint) instead of object-at-a-time ``Stim`` objects;
- extractors/filters/converters (pliers ``Transformer`` algebra,
  reference ``pliers/transformers/base.py:64-134``) become lazy DataFrame
  stages built from ``pyspark.sql.functions`` (JVM-side, whole-stage
  codegen) with Arrow-vectorized pandas UDFs only where built-ins cannot
  express the semantics;
- the north-rule operators pliers lacks — point-in-time as-of join,
  lag/lead, backfill/forward-fill, gap sessionization — are Window- and
  cogroup-based (``operators/asof.py``, ``operators/temporal.py``);
- result shaping (``ExtractorResult.to_df`` / ``merge_results``,
  reference ``pliers/extractors/base.py:76-362``) becomes melt/pivot/join
  (``operators/results.py``);
- the Graph JSON spec (reference ``pliers/graph.py:71-314``) becomes a
  declarative pipeline spec over a stage registry (``plans/pipeline.py``);
- memoization + TransformationLog lineage (reference
  ``pliers/transformers/base.py:19-62``, ``pliers/stimuli/base.py:181-238``)
  become per-partition checkpoint manifests with lineage + metrics
  (``plans/checkpoint.py``).

Nothing in this package is copied from the reference; all citations are
behavioral parity anchors.
"""

__version__ = "0.1.0"

# Install DataFrame.stableCheckpoint (local/reliable/disk durability
# switch, plans/reliable.py) for every consumer of the package.
from pliers_spark.plans import reliable as _reliable  # noqa: E402,F401
