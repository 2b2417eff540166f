"""breg_dcat_harvester_spark — a PySpark-native knowledge-graph construction engine.

A brand-new engine with the query and data-processing capabilities of
``SEMICeu/breg-dcat-harvester`` (reference at /root/reference, read-only),
re-expressed Spark-first: the reference's rdflib/Virtuoso triple workflow
becomes a distributed DataFrame pipeline over partitioned columnar tables of
multi-turn conversation transcripts:

    transcripts (conv_id, turn_idx, role, text, tool, ts)
        -> validate (SHACL-style cardinality checks, harvest.py:41-47 analog)
        -> extract  (vectorized pandas-UDF mention detection -> triples)
        -> merge    (set-semantics union, harvest.py:51-53 analog)
        -> link     (MinHash-LSH blocking + similarity scoring)
        -> canonicalize (connected-components union-find)
        -> materialize (partitioned node/edge tables + snapshot manifest)
        -> browse/search (facets + faceted search, browser.py analogs)

See SURVEY.md for the full operator inventory and reference citations.
"""

__version__ = "0.1.0"
