"""cordon_spark — a PySpark-native semantic log/transcript anomaly pipeline.

A from-scratch reimplementation of the query semantics of cordon
(reference: /root/reference, Apache-2.0) as an idiomatic Spark
parse -> window -> embed -> score -> enrich -> route -> aggregate pipeline
over tables of multi-turn transcripts:

    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Semantics parity targets (reference file:line cited per module):
  - tumbling count windows   src/cordon/segmentation/windower.py:16-66
  - L2-normalized embeddings src/cordon/embedding/transformer.py:99-147
  - k-NN density scoring     src/cordon/analysis/scorer.py:129-321
  - percentile threshold     src/cordon/analysis/thresholder.py:17-81
  - interval merge           src/cordon/postprocess/merger.py:14-77
  - block formatting         src/cordon/postprocess/formatter.py:15-68

The engine is DataFrame-first: every stage is a declarative Spark plan;
Python appears only in Arrow-batched pandas UDFs (embedding, scoring,
template matching) that share one numpy kernel with the test oracle.
"""

__version__ = "0.2.0"

from cordon_spark.analyzer import AnalysisResult, SemanticLogAnalyzer
from cordon_spark.config import AnalysisConfig

# the reference's public names (src/cordon/__init__.py): the row-level
# dataclasses (TextWindow/ScoredWindow/MergedBlock) have no object
# analog here — their data lives in DataFrame rows (SURVEY.md §1.4)
__all__ = [
    "SemanticLogAnalyzer",
    "AnalysisConfig",
    "AnalysisResult",
    "__version__",
]
