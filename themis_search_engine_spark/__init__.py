"""themis_search_engine_spark — a PySpark-native inverted-index build +
BM25 query engine with the query/data-processing capabilities of the
reference engine (WoArtK/Themis-Search-Engine), re-expressed Spark-first.

Not a port: the reference is a single-threaded file-backed Java engine; this
package declares the same semantics as DataFrame plans (Catalyst handles
pushdown/pruning/AQE) with vectorized Arrow UDFs only where built-ins can't
express the op (tokenize+stem, varbyte compression, WAND top-k).
"""

__version__ = "0.1.0"
