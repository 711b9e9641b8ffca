"""Streaming count-min sketch: the q33 sketch accumulated over a
document stream.

The count-min sketch is the sketch family's NATURALLY streaming member
— cells merge by cell-wise addition, so a continuously-ingesting lake
maintains the sketch as ONE streaming aggregation whose keyed state is
the fixed d × w cell table (bounded by construction, no watermark
needed: the state cannot grow with the corpus, which is the whole
point of the sketch). Each micro-batch's token counts fold into the
running cells; in complete output mode the sink always holds the
sketch of everything ingested so far — bit-identical, at every
trigger, to the batch q33 sketch over the same prefix of the corpus
(asserted in tests/test_stream_countmin.py, including across multiple
micro-batches).

Structured Streaming allows one aggregation per query, so the stream
uses the raw-token cell builder (queries.datapipe.cm_cells_from_tokens)
rather than batch q33's vocab-first derivation — the two are the same
cells by additivity, and both hash through the shared cm_bucket so
they can never hash apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.datapipe import cm_cells_from_tokens
from .curation import stream_documents


def stream_countmin_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The running CM cell table over the document stream: (j, bucket,
    cnt), at most d × w rows. Write with outputMode("complete") — the
    result set IS the model and is fixed-size, the one case where
    complete mode is the scalable choice."""
    return stream_countmin_cells_from(stream_documents(spark, sf_dir))


def stream_countmin_cells_from(docs: DataFrame) -> DataFrame:
    """Same, over an already-constructed (streaming or batch) documents
    frame — the multi-micro-batch parity test drives this with a
    file-per-trigger source."""
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    return cm_cells_from_tokens(toks)
