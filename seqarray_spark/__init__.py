"""seqarray_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the SeqArray reference (genomic variant-call
storage + query engine), re-expressed Spark-first.

Data model (SURVEY.md §1.5):
    variants: variant_id, chromosome, position, id, ref, alt ARRAY<STRING>,
              qual, filter, info STRUCT<...>
    calls:    variant_id, sample_id, alleles ARRAY<SMALLINT>,
              phased ARRAY<BOOLEAN>, <FORMAT fields>
    samples:  sample_id, <annotation cols>

Everything is declarative DataFrame composition so Catalyst handles pushdown,
pruning, and join selection; Python UDFs appear only where semantics demand
(Arrow-batched, never row-at-a-time).
"""

from seqarray_spark.session import get_spark
from seqarray_spark.dataset import SeqDataset

__version__ = "0.1.0"

__all__ = ["get_spark", "SeqDataset", "__version__"]
