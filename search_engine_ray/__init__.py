"""search_engine_ray — a Ray-Data-native full-text index build + query engine.

A brand-new engine with the query/data-processing capabilities of the
reference C++ search engine (sazhas/Search-Engine, read-only copy at
/root/reference), re-expressed idiomatically on ray.data.Dataset:

- ``kernels``   : pure-Python exact-semantics ports (HTML parser, stemmer,
                  varint codec, scoring math) — no Ray dependencies.
- ``stages``    : Ray Data batch transforms (parse, tokenize, postings emit).
- ``sources``   : dataset readers / synthetic page generation.
- ``pipelines`` : end-to-end build/search pipelines.
- ``state``     : segment + manifest formats (resumable layout).
- ``query``     : query compiler, ISR algebra, compat ranker, BM25/WAND.
- ``functions`` : large-scale training-data ops (dedup, lang-id, ANN, ...).

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned
by bench.py / tests / the driver.
"""

__version__ = "0.1.0"
