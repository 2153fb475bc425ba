"""PySpark-native entity-resolution / record-linkage engine.

A from-scratch reimplementation of the match semantics of the reference
repo JakubGorgon/AML-entity-resolution-assignment (pandas + SQLite +
networkx PoC), re-expressed as an idiomatic Spark DataFrame pipeline over
web-page records at Common-Crawl scale:

    pages (url, warc_ts, html, text, lang)
      -> normalize (hostname / title / text)           functions.normalize
      -> blocking keys (host, title, minhash/simhash)  operators.blocking
      -> candidate pairs (salted self-joins + LSH)     operators.candidates
      -> pairwise features (Arrow-batched kernels)     operators.features
      -> classify (rule cascade + logistic model)      operators.classify
      -> entity clusters (iterative connected comp.)   operators.cluster
      -> pairwise P/R/F1 evaluation                    operators.evaluate

Everything is DataFrame-in / DataFrame-out; the only Python execution is
inside Arrow-batched pandas UDFs (no per-row Python, no RDDs).
"""

__version__ = "0.1.0"
