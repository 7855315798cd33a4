"""gorilla_stream_spark — a PySpark-native per-column lightweight-compression
engine for token-array tables.

Reimagines the dataflow of the reference library ``awksedgreep/gorilla_stream``
(an Elixir+C++ Gorilla/Chimp time-series codec, see ``/root/reference``) as a
Spark-first engine: Spark DataFrames + Arrow-vectorized ``mapInPandas`` carry
the distribution story (partitioning, skew, lineage, resume), while pure-numpy
kernels carry the bit-level story (delta-of-delta, XOR-mantissa, RLE, dict,
FSST-style symbol tables, frame-of-reference bit-packing) with per-block codec
auto-selection.

Public API (analog of ``GorillaStream.compress/decompress``,
``/root/reference/lib/gorilla_stream.ex:74-119``):

    encode(df, ...)   -> encoded blocks DataFrame (buffer + inline manifest)
    decode(enc_df)    -> original rows DataFrame (bit-identical tokens)
    estimate(df, ...) -> per-block codec-selector feature/cost DataFrame
    validate(df) / clean(df)
"""

from gorilla_stream_spark.analyze import analyze_and_recommend
from gorilla_stream_spark.engine import (
    decode,
    decode_docs,
    decode_timeseries,
    encode,
    encode_timeseries,
    estimate,
    manifest,
    read_timerange,
)
from gorilla_stream_spark.validate import clean, validate

__version__ = "0.1.0"

__all__ = [
    "encode",
    "decode",
    "encode_timeseries",
    "decode_timeseries",
    "estimate",
    "manifest",
    "decode_docs",
    "read_timerange",
    "analyze_and_recommend",
    "validate",
    "clean",
    "__version__",
]
