"""HAND-DERIVED golden triples for the RDF-document harvest oracle.

The 33 triples below were transcribed BY HAND from reading the reference's
sample documents (api/breg_harvester/ontology/sample-01.xml, sample-02.ttl
— the two sources of the README.md:104-122 ``num_triples: 33`` harvest
anecdote; its third source, a JSON-LD gist, is not in the reference repo, so
data/rdf_samples/sample-03.jsonld is our structurally-equivalent stand-in)
— NOT computed by the parsers under test, so the fixture is a genuinely
independent oracle.

Quirk preserved on purpose: sample-01.xml writes ``rdf:resource=
"dcat:Catalog"`` (no entity reference), which resolves as an absolute URI
with scheme ``dcat`` — rdflib emits it verbatim, and so do we; sample-02.ttl
uses real prefixes, so ITS types are full URIs.

Run:  python scripts/make_rdf_golden.py
"""

from __future__ import annotations

import os

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "data", "oracles", "rdf_docs_golden.parquet")

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
DCT = "http://purl.org/dc/terms/"
DCAT = "http://www.w3.org/ns/dcat#"
FOAF = "http://xmlns.com/foaf/0.1/"
SKOS = "http://www.w3.org/2004/02/skos/core#"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
DATA = "http://www.fundacionctic.org/breg-data#"
CORP = "http://publications.europa.eu/resource/authority/corporate-body"


def uri(s, p, o):
    return (s, p, o, "uri", None, None)


def lit(s, p, o):
    return (s, p, o, "literal", None, XSD_STRING)


TRIPLES = [
    # --- sample-01.xml (note the verbatim prefixed type URIs) -------------
    uri(DATA + "sample-catalog", RDF_TYPE, "dcat:Catalog"),
    lit(DATA + "sample-catalog", DCT + "description", "Catalog description"),
    lit(DATA + "sample-catalog", DCT + "identifier", "Catalog unique ID"),
    lit(DATA + "sample-catalog", DCT + "title", "Catalog title"),
    uri(DATA + "sample-catalog", DCT + "publisher", DATA + "sample-agent"),
    uri(DATA + "sample-catalog", DCAT + "themeTaxonomy", DATA + "sample-scheme"),
    uri(DATA + "sample-agent", RDF_TYPE, "foaf:Agent"),
    lit(DATA + "sample-agent", FOAF + "name", "Agent name"),
    uri(DATA + "sample-agent", SKOS + "inScheme", CORP),
    uri(DATA + "sample-scheme", RDF_TYPE, "skos:ConceptScheme"),
    lit(DATA + "sample-scheme", DCT + "title", "Scheme title"),
    # --- sample-02.ttl (full URIs via @prefix) ----------------------------
    uri(DATA + "another-catalog", RDF_TYPE, DCAT + "Catalog"),
    lit(DATA + "another-catalog", DCT + "description", "Another catalog description"),
    lit(DATA + "another-catalog", DCT + "identifier", "Another catalog unique ID"),
    lit(DATA + "another-catalog", DCT + "title", "Another catalog title"),
    uri(DATA + "another-catalog", DCT + "publisher", DATA + "another-agent"),
    uri(DATA + "another-catalog", DCAT + "themeTaxonomy", DATA + "another-scheme"),
    uri(DATA + "another-agent", RDF_TYPE, FOAF + "Agent"),
    lit(DATA + "another-agent", FOAF + "name", "Another agent name"),
    uri(DATA + "another-agent", SKOS + "inScheme", CORP),
    uri(DATA + "another-scheme", RDF_TYPE, SKOS + "ConceptScheme"),
    lit(DATA + "another-scheme", DCT + "title", "Another scheme title"),
    # --- sample-03.jsonld (ours; context-expanded full URIs) --------------
    uri(DATA + "third-catalog", RDF_TYPE, DCAT + "Catalog"),
    lit(DATA + "third-catalog", DCT + "description", "Third catalog description"),
    lit(DATA + "third-catalog", DCT + "identifier", "Third catalog unique ID"),
    lit(DATA + "third-catalog", DCT + "title", "Third catalog title"),
    uri(DATA + "third-catalog", DCT + "publisher", DATA + "third-agent"),
    uri(DATA + "third-catalog", DCAT + "themeTaxonomy", DATA + "third-scheme"),
    uri(DATA + "third-agent", RDF_TYPE, FOAF + "Agent"),
    lit(DATA + "third-agent", FOAF + "name", "Third agent name"),
    uri(DATA + "third-agent", SKOS + "inScheme", CORP),
    uri(DATA + "third-scheme", RDF_TYPE, SKOS + "ConceptScheme"),
    lit(DATA + "third-scheme", DCT + "title", "Third scheme title"),
]

if __name__ == "__main__":
    assert len(TRIPLES) == 33, len(TRIPLES)
    assert len(set(t[:3] for t in TRIPLES)) == 33
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g (subj VARCHAR, pred VARCHAR, obj VARCHAR,"
        " obj_kind VARCHAR, lang VARCHAR, dtype VARCHAR)"
    )
    con.executemany("INSERT INTO g VALUES (?, ?, ?, ?, ?, ?)", TRIPLES)
    con.execute(f"COPY g TO '{OUT}' (FORMAT PARQUET)")
    print(f"wrote {len(TRIPLES)} golden triples -> {OUT}")
