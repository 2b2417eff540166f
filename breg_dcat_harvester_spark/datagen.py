"""Deterministic synthetic transcript corpus (the engine's primary input).

Shape is authoritative from BASELINE.json ``input_hint``::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Everything is a pure function of ``(seed, n_turns)`` (FIXTURES.md §1) and is
generated with vectorized numpy/pandas only, so the bench corpus (~10^5-10^6
turns) builds in seconds and two runs always produce byte-identical parquet.

Turn texts embed **entity mention blocks** in a strict grammar that both the
Spark extractor (operators/extract.py) and the DuckDB oracle SQL
(functions/oracle_sql.py) parse identically::

    [[Tag|id=<local>|key=value|key=value...]]

* ``Tag`` is a BRegDCAT-AP class local name (schema.CLASS_URIS), mirroring
  the reference's sample documents (ontology/sample-01.xml:51-69,
  sample-02.ttl:6-21).
* ``id`` locals starting with ``_:`` are blank nodes and get deterministic
  skolem URIs (store.py:19-25 analog).
* values never contain ``|``, ``]``, ``=`` or newlines (grammar invariant).

The population contains: valid + (rare) SHACL-invalid catalogs, near-duplicate
agent pairs for MinHash-LSH linking, a hot agent + zipf conversation lengths
for skew, and catalog→dataset→distribution stars for the faceted search join.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_TS = np.datetime64("2026-01-01T00:00:00", "us")

_ADJ = [
    "amber", "basalt", "cobalt", "dune", "ember", "fjord", "garnet", "harbor",
    "indigo", "juniper", "krypton", "lagoon", "marble", "nickel", "onyx",
    "pewter", "quartz", "russet", "saffron", "topaz", "umber", "velvet",
    "willow", "xenon", "yarrow", "zephyr",
]
_NOUN = [
    "anchor", "beacon", "cairn", "delta", "estuary", "foundry", "glacier",
    "hollow", "isthmus", "jetty", "knoll", "ledger", "meadow", "nexus",
    "orchard", "plateau", "quarry", "ridge", "summit", "terrace", "upland",
    "vault", "wharf", "yard", "zenith",
]
_W3 = [
    "arc", "bay", "cove", "dell", "edge", "ford", "gate", "hill", "isle",
    "keep", "loch", "mill", "nook", "oast", "pier", "quay", "reef", "shoal",
    "tarn", "vale", "weir", "yurt", "zone",
]
_NOISE = [
    "please", "register", "the", "following", "record", "we", "found", "a",
    "new", "entry", "for", "review", "this", "was", "fetched", "from", "the",
    "portal", "and", "needs", "validation", "before", "merge", "thanks",
    "note", "that", "it", "may", "update", "an", "existing", "item",
]

LOCATIONS = [
    f"http://publications.europa.eu/resource/authority/country/{c}"
    for c in ["ESP", "FRA", "DEU", "ITA", "PRT", "NLD", "BEL", "AUT", "IRL", "GRC"]
]
THEMES = [
    f"http://publications.europa.eu/resource/authority/data-theme/{t}"
    for t in ["ENVI", "GOVE", "TECH", "ECON", "SOCI", "HEAL", "EDUC", "TRAN"]
]
LANGUAGES = [
    f"http://publications.europa.eu/resource/authority/language/{l}"
    for l in ["ENG", "SPA", "FRA", "DEU", "POR"]
]
PUBLISHER_TYPES = [
    f"http://purl.org/adms/publishertype/{t}"
    for t in ["NationalAuthority", "LocalAuthority", "Academia-ScientificOrganisation", "Company"]
]
CORPORATE_BODY = "http://publications.europa.eu/resource/authority/corporate-body"


def _entity_title(kind: str, i: int, width: int = 5) -> str:
    """Distinctive 3-word titles: the word-triple period is
    lcm(26,25,23)=14950 > any population size, so distinct entities keep
    3-gram jaccard <= ~0.72 while near-duplicates (suffix edit) stay >= ~0.86
    — clean margins around the 0.8 linking threshold (tested)."""
    adj = _ADJ[(i * 7 + 3) % len(_ADJ)]
    noun = _NOUN[(i * 11 + 5) % len(_NOUN)]
    w3 = _W3[(i * 13 + 2) % len(_W3)]
    return f"{adj} {noun} {w3} {kind} {i:0{width}d}"


def _agent_name(rng_idx: int, i: int) -> str:
    return _entity_title("data agency", i, width=4)


def build_entities(n_turns: int) -> dict[str, pd.DataFrame]:
    """Entity population scaled to corpus size. Pure function of n_turns."""
    n_catalogs = max(4, n_turns // 400)
    n_datasets = max(8, n_turns // 100)
    n_agents = max(6, n_turns // 200)
    n_schemes = max(3, n_turns // 1000)
    n_alt = max(2, n_agents // 5)  # near-duplicate agents (linking targets)

    cat = pd.DataFrame({"i": np.arange(n_catalogs)})
    cat["local"] = "catalog-" + cat["i"].astype(str).str.zfill(5)
    cat["title"] = [_entity_title("catalog", i) for i in range(n_catalogs)]
    cat["identifier"] = "CAT-" + cat["i"].astype(str).str.zfill(5)
    cat["description"] = "Description of catalog " + cat["i"].astype(str)
    cat["publisher"] = "#agent-" + (cat["i"] % n_agents).astype(str).str.zfill(4)
    cat["themeTaxonomy"] = "#scheme-" + (cat["i"] % n_schemes).astype(str).str.zfill(3)
    cat["spatial"] = np.array(LOCATIONS)[cat["i"] % len(LOCATIONS)]
    cat["language"] = np.array(LANGUAGES)[cat["i"] % len(LANGUAGES)]
    ds_a = (cat["i"] * 2) % n_datasets
    ds_b = (cat["i"] * 2 + 1) % n_datasets
    cat["ds_a"] = "#dataset-" + ds_a.astype(str).str.zfill(5)
    cat["ds_b"] = "#dataset-" + ds_b.astype(str).str.zfill(5)
    # SHACL-invalid catalogs (every 37th): missing the exactly-1 dct:identifier
    # (shape BRegDCAT-AP_shacl_shapes_2.00.ttl:726-736 analog).
    invalid = (cat["i"] % 37 == 17)
    ident_part = np.where(invalid, "", "|identifier=" + cat["identifier"])
    cat["block"] = (
        "[[Catalog|id=" + cat["local"]
        + "|title=" + cat["title"]
        + ident_part
        + "|description=" + cat["description"]
        + "|publisher=" + cat["publisher"]
        + "|themeTaxonomy=" + cat["themeTaxonomy"]
        + "|spatial=" + cat["spatial"]
        + "|language=" + cat["language"]
        + "|dataset=" + cat["ds_a"]
        + "|dataset=" + cat["ds_b"]
        + "]]"
    )
    cat["short"] = "[[Catalog|id=" + cat["local"] + "|title=" + cat["title"] + "]]"

    ds = pd.DataFrame({"i": np.arange(n_datasets)})
    ds["local"] = "dataset-" + ds["i"].astype(str).str.zfill(5)
    ds["title"] = [_entity_title("dataset", i) for i in range(n_datasets)]
    ds["identifier"] = "DS-" + ds["i"].astype(str).str.zfill(5)
    ds["description"] = "Description of dataset " + ds["i"].astype(str)
    ds["spatial"] = np.array(LOCATIONS)[(ds["i"] * 3) % len(LOCATIONS)]
    ds["theme"] = np.array(THEMES)[ds["i"] % len(THEMES)]
    # every 3rd dataset carries a SECOND theme: (5i+2)%8 == i%8 would need
    # 4i ≡ 6 (mod 8), impossible — the pair is always distinct, so the
    # var-to-var FILTER(?t1 != ?t2) SPARQL contract query (theme pairs) and
    # multi-valued GROUP_CONCAT have real rows to verify against.
    theme2 = pd.Series(np.array(THEMES)[(ds["i"] * 5 + 2) % len(THEMES)])
    theme2_part = np.where(ds["i"] % 3 == 0, "|theme=" + theme2, "")
    ds["dist"] = "#dist-" + ds["i"].astype(str).str.zfill(5)
    ds["block"] = (
        "[[Dataset|id=" + ds["local"]
        + "|title=" + ds["title"]
        + "|identifier=" + ds["identifier"]
        + "|description=" + ds["description"]
        + "|spatial=" + ds["spatial"]
        + "|theme=" + ds["theme"]
        + theme2_part
        + "|distribution=" + ds["dist"]
        + "]]"
    )
    ds["short"] = "[[Dataset|id=" + ds["local"] + "|title=" + ds["title"] + "]]"

    dist = pd.DataFrame({"i": np.arange(n_datasets)})
    dist["local"] = "dist-" + dist["i"].astype(str).str.zfill(5)
    url = "https://data.example.org/dist/" + dist["i"].astype(str)
    descr_part = np.where(
        dist["i"] % 2 == 0,
        "|description=Distribution of dataset " + dist["i"].astype(str),
        "",  # odd distributions lack dct:description -> OPTIONAL/left-outer path
    )
    dist["block"] = (
        "[[Distribution|id=" + dist["local"]
        + "|accessURL=" + url
        + "|mediaType=text/csv"
        + descr_part
        + "]]"
    )
    # anonymous (blank-node) re-mention of the same distribution content:
    # exercises deterministic skolemization (store.py:19-25 analog).
    dist["short"] = (
        "[[Distribution|id=_:d" + dist["i"].astype(str)
        + "|accessURL=" + url
        + "|mediaType=text/csv]]"
    )

    ag = pd.DataFrame({"i": np.arange(n_agents)})
    ag["local"] = "agent-" + ag["i"].astype(str).str.zfill(4)
    ag["name"] = [_agent_name(0, i) for i in range(n_agents)]
    ag["ptype"] = np.array(PUBLISHER_TYPES)[ag["i"] % len(PUBLISHER_TYPES)]
    ag["block"] = (
        "[[Agent|id=" + ag["local"]
        + "|name=" + ag["name"]
        + "|dcttype=" + ag["ptype"]
        + "|inScheme=" + CORPORATE_BODY
        + "]]"
    )
    ag["short"] = "[[Agent|id=" + ag["local"] + "|name=" + ag["name"] + "]]"

    # near-duplicate agents: same name + " intl" suffix -> 3-gram jaccard
    # ~0.86 with their source, <= ~0.72 with everything else; must merge
    # under linking + connected components.
    alt = pd.DataFrame({"i": np.arange(n_alt)})
    src = (alt["i"] * 5) % n_agents
    alt["local"] = "agent-alt-" + alt["i"].astype(str).str.zfill(4)
    alt["name"] = (ag["name"].iloc[src] + " intl").values
    alt["ptype"] = ag["ptype"].iloc[src].values
    alt["block"] = (
        "[[Agent|id=" + alt["local"]
        + "|name=" + alt["name"]
        + "|dcttype=" + alt["ptype"]
        + "|inScheme=" + CORPORATE_BODY
        + "]]"
    )
    alt["short"] = alt["block"]

    sch = pd.DataFrame({"i": np.arange(n_schemes)})
    sch["local"] = "scheme-" + sch["i"].astype(str).str.zfill(3)
    sch["title"] = [_entity_title("scheme", i, width=3) for i in range(n_schemes)]
    sch["block"] = "[[ConceptScheme|id=" + sch["local"] + "|title=" + sch["title"] + "]]"
    sch["short"] = sch["block"]

    return {"catalog": cat, "dataset": ds, "distribution": dist, "agent": ag,
            "agent_alt": alt, "scheme": sch}


def gen_transcripts(n_turns: int, seed: int = SEED) -> pd.DataFrame:
    """Deterministic transcript table with ~zipf conversation lengths."""
    rng = np.random.default_rng(seed)

    # conversation lengths: zipf clipped to [1, 64] (FIXTURES.md §1 skew)
    approx_convs = max(1, int(n_turns / 9) + 1)
    lens = np.minimum(rng.zipf(1.6, size=approx_convs * 3), 64)
    cum = np.cumsum(lens)
    n_convs = int(np.searchsorted(cum, n_turns)) + 1
    lens = lens[:n_convs]
    conv_idx = np.repeat(np.arange(n_convs), lens)[:n_turns]
    # turn_idx: position within conversation
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    turn_idx = (np.arange(len(conv_idx)) - starts[conv_idx])[:n_turns].astype(np.int32)

    conv_id = pd.Series(conv_idx).map(lambda i: f"conv-{i:08d}").astype("string")

    roles = np.array(["user", "assistant", "system", "tool"])
    role_pick = rng.choice(len(roles), size=n_turns, p=[0.4, 0.4, 0.05, 0.15])
    role = roles[role_pick]
    tools = np.array(["search", "fetch", "validate", "sparql"])
    tool = np.where(role == "tool", tools[rng.integers(0, 4, size=n_turns)], None)

    ts = BASE_TS + (conv_idx * 3600 + turn_idx.astype(np.int64) * 7).astype("timedelta64[s]").astype("timedelta64[us]")

    ents = build_entities(n_turns)
    # category mix; hot-agent skew: category 'agent_hot' always mentions agent 0
    cats = ["catalog", "dataset", "distribution", "agent", "agent_alt", "scheme", "agent_hot"]
    probs = [0.18, 0.28, 0.16, 0.14, 0.06, 0.08, 0.10]

    has_mention = rng.random(n_turns) < 0.4
    cat_pick = rng.choice(len(cats), size=n_turns, p=probs)
    u = rng.random(n_turns)
    use_full = rng.random(n_turns) < 0.6

    blocks = np.full(n_turns, "", dtype=object)
    for ci, cname in enumerate(cats):
        mask = has_mention & (cat_pick == ci)
        if not mask.any():
            continue
        key = "agent" if cname == "agent_hot" else cname
        ent = ents[key]
        n_ent = len(ent)
        if cname == "agent_hot":
            idx = np.zeros(int(mask.sum()), dtype=int)
        else:
            # power-law entity popularity (skewed keys at scale)
            idx = np.minimum((u[mask] ** 2.5 * n_ent).astype(int), n_ent - 1)
        full = ent["block"].values[idx]
        short = ent["short"].values[idx]
        blocks[mask] = np.where(use_full[mask], full, short)

    n1 = rng.integers(0, len(_NOISE), size=n_turns)
    n2 = rng.integers(0, len(_NOISE), size=n_turns)
    n3 = rng.integers(0, len(_NOISE), size=n_turns)
    noise_arr = np.array(_NOISE)
    prefix = pd.Series(noise_arr[n1]) + " " + pd.Series(noise_arr[n2])
    suffix = pd.Series(noise_arr[n3])
    text = (prefix + " " + pd.Series(blocks).fillna("") + " " + suffix).str.replace(
        "  ", " ", regex=False
    )

    return pd.DataFrame(
        {
            "conv_id": conv_id.astype(object),
            "turn_idx": turn_idx,
            "role": role,
            "text": text.astype(object),
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )


def golden_transcripts() -> pd.DataFrame:
    """Hand-written golden fixture mirroring the reference's 3 sample sources.

    Three turns, one per source document (sample-01.xml, sample-02.ttl and a
    third json-ld doc with the same 11-triple trio shape), each yielding 11
    distinct triples -> 33 distinct triples total after set-union merge,
    matching the reference's documented golden harvest
    (/root/reference/README.md:105 "num_triples": 33).
    """
    trios = []
    for conv, stem, prefix in (
        ("conv-golden-01", "sample", ""),
        ("conv-golden-02", "another", "Another "),
        ("conv-golden-03", "third", "Third "),
    ):
        catalog = (
            f"[[Catalog|id={stem}-catalog"
            f"|description={prefix}Catalog description"
            f"|identifier={prefix}Catalog unique ID"
            f"|title={prefix}Catalog title"
            f"|publisher=#{stem}-agent"
            f"|themeTaxonomy=#{stem}-scheme]]"
        )
        agent = (
            f"[[Agent|id={stem}-agent"
            f"|name={prefix}Agent name"
            f"|inScheme={CORPORATE_BODY}]]"
        )
        scheme = f"[[ConceptScheme|id={stem}-scheme|title={prefix}Scheme title]]"
        trios.append((conv, f"harvest source doc {catalog} {agent} {scheme} end"))

    rows = []
    for i, (conv, text) in enumerate(trios):
        rows.append(
            {
                "conv_id": conv,
                "turn_idx": np.int32(0),
                "role": "tool",
                "text": text,
                "tool": "fetch",
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(hours=i),
            }
        )
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    return df


ARROW_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)


def write_transcripts_parquet(df: pd.DataFrame, path: str) -> str:
    os.makedirs(path, exist_ok=True)
    table = pa.Table.from_pandas(df, schema=ARROW_SCHEMA, preserve_index=False)
    # bounded row groups -> the single file still splits across Spark tasks.
    # Write tmp + atomic rename: the file doubles as ensure_transcripts'
    # done-marker, so a process killed mid-write must not leave a truncated
    # file that existence-checks as complete (bench scaling children run
    # under a kill-on-timeout).
    final = os.path.join(path, "part-00000.parquet")
    tmp = final + ".tmp"
    pq.write_table(table, tmp, row_group_size=50_000)
    os.replace(tmp, final)
    return path


# sf name -> number of turns for the locally generated transcript corpus
SF_TURNS = {
    "sf0.001": 2_000,
    "sf0.01": 20_000,
    "sf0.1": 200_000,
    "sf1": 1_000_000,
    "sf3": 3_000_000,
    "sf5": 5_000_000,
    "sf10": 10_000_000,
}


def ensure_transcripts(sf: str, base_dir: str = "/root/repo/data/transcripts") -> str:
    """Generate (once) and return the path of the sf-sized transcript table."""
    path = os.path.join(base_dir, sf)
    marker = os.path.join(path, "part-00000.parquet")
    if not os.path.exists(marker):
        df = gen_transcripts(SF_TURNS.get(sf, 20_000), seed=SEED)
        write_transcripts_parquet(df, path)
    return path
