"""rnadam_spark — a PySpark-native analytics engine.

A from-scratch DataFrame/SQL-first re-expression of the capabilities of
bigdatagenomics/RNAdam ("rice"), an alignment-free RNA isoform
quantification pipeline (Sailfish algorithm; see reference
rice-core/src/main/scala/org/bdgenomics/rice/algorithms/Quantify.scala:32-40),
extended with large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing, streaming).

Design stance (SURVEY.md §7): every operator is a declarative DataFrame /
SQL plan so Catalyst + Tungsten pick the physical strategy; Pandas UDFs
only where built-ins genuinely cannot express the semantics; no RDDs.
"""

__version__ = "0.1.0"

from rnadam_spark.session import get_spark  # noqa: F401
