"""Canonical schemas for every table the engine reads or writes.

Data model (SURVEY.md §1): the reference's unit of data is the RDF triple in
one named graph (``harvest.py:38-39``); terms are URIRef/BNode/Literal with
language tags (``browser.py:126-130``) and BNodes are skolemized to URIs
before persistence (``store.py:19-25``).  Our columnar equivalents:

* ``TRANSCRIPTS`` — authoritative input shape (BASELINE.json ``input_hint``).
* ``EDGES``       — the triple table (one named graph == one table), with
                    per-triple lineage columns (conv_id, turn_idx) replacing
                    the reference's per-source provenance (harvest.py:59).
* ``NODES``       — term/entity table incl. canonical_id after linking.
* ``RUNS`` / ``METRICS`` — control-plane tables mirroring the job JSON shape
                    (utils.py:32-48) and per-partition stage metrics.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- input -----------------------------------------------------------------

TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# --- graph -----------------------------------------------------------------

# One triple per row.  obj_kind in {'uri','literal'}; lang/dtype only for
# literals (browser.py:126-142 language-tag semantics).
EDGE_FIELDS = [
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("obj_kind", StringType(), False),
    StructField("lang", StringType(), True),
    StructField("dtype", StringType(), True),
]

LINEAGE_FIELDS = [
    StructField("conv_id", StringType(), True),
    StructField("turn_idx", IntegerType(), True),
]

EDGES = StructType(EDGE_FIELDS + LINEAGE_FIELDS)

# Bare (subj,pred,obj) triple struct emitted by the extraction UDF before
# lineage columns are attached.
TRIPLE_STRUCT = StructType(EDGE_FIELDS)

NODES = StructType(
    [
        StructField("node_id", StringType(), False),
        StructField("canonical_id", StringType(), False),
        StructField("node_kind", StringType(), False),  # uri | literal
        StructField("entity_type", StringType(), True),  # class local name
        StructField("label", StringType(), True),
    ]
)

# --- control plane ----------------------------------------------------------

# Mirrors the reference job dict {job_id,status,enqueued_at,started_at,
# ended_at,description,result,exc_info} (utils.py:32-48) plus snapshot ids
# for checkpoint/resume.
RUNS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("status", StringType(), False),  # finished|failed|scheduled|started
        StructField("enqueued_at", TimestampType(), True),
        StructField("started_at", TimestampType(), True),
        StructField("ended_at", TimestampType(), True),
        StructField("description", StringType(), True),
        StructField("num_triples", LongType(), True),
        StructField("snapshot_id", StringType(), True),
        StructField("exc_info", StringType(), True),
    ]
)

METRICS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), True),
        StructField("rows_in", LongType(), True),
        StructField("rows_out", LongType(), True),
    ]
)

# --- vocabulary -------------------------------------------------------------

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
DCT = "http://purl.org/dc/terms/"
DCAT = "http://www.w3.org/ns/dcat#"
FOAF = "http://xmlns.com/foaf/0.1/"
SKOS = "http://www.w3.org/2004/02/skos/core#"
PROV = "http://www.w3.org/ns/prov#"
XSD = "http://www.w3.org/2001/XMLSchema#"

# Base namespace of the reference's sample data
# (ontology/sample-01.xml:51, sample-02.ttl:6).
BREG_NS = "http://www.fundacionctic.org/breg-data#"
SKOLEM_NS = "urn:skolem:"
ROLE_NS = "urn:breg:role:"
TOOL_NS = "urn:breg:tool:"

RDF_TYPE = RDF + "type"

# Entity classes (BRegDCAT-AP target classes the reference's SHACL shapes
# declare; SURVEY.md §1.3).  Block tag -> class URI.
CLASS_URIS = {
    "Catalog": DCAT + "Catalog",
    "Dataset": DCAT + "Dataset",
    "Distribution": DCAT + "Distribution",
    "DataService": DCAT + "DataService",
    "CatalogRecord": DCAT + "CatalogRecord",
    "Agent": FOAF + "Agent",
    "ConceptScheme": SKOS + "ConceptScheme",
    "Concept": SKOS + "Concept",
    "Location": DCT + "Location",
}

# Property key (mention-grammar field name) -> predicate URI.  NOTE the
# verbatim reference quirk: the language facet predicate is the non-standard
# capital-L ``dct:LinguisticSystem`` (browser.py:207,363) — preserved for
# triple parity.
PRED_URIS = {
    "title": DCT + "title",
    "description": DCT + "description",
    "identifier": DCT + "identifier",
    "publisher": DCT + "publisher",
    "themeTaxonomy": DCAT + "themeTaxonomy",
    "theme": DCAT + "theme",
    "spatial": DCT + "spatial",
    "language": DCT + "LinguisticSystem",
    "name": FOAF + "name",
    "inScheme": SKOS + "inScheme",
    "dataset": DCAT + "dataset",
    "distribution": DCAT + "distribution",
    "accessURL": DCAT + "accessURL",
    "mediaType": DCAT + "mediaType",
    "dcttype": DCT + "type",
    "license": DCT + "license",
    "format": DCT + "format",
}

PROV_ROLE = PROV + "wasAttributedTo"
PROV_TOOL = PROV + "wasGeneratedBy"
