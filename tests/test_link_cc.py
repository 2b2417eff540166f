"""Entity linking + canonicalization: LSH == brute force, scorer parity,
union-find convergence and idempotence (SURVEY.md §5.2-5.3)."""

import pytest
from pyspark.sql import functions as F

from breg_dcat_harvester_spark.operators import cc as ccm
from breg_dcat_harvester_spark.operators import link as lnk
from breg_dcat_harvester_spark.operators.extract import extract_edges
from breg_dcat_harvester_spark.operators.merge import merge_triples


@pytest.fixture(scope="module")
def merged(small_transcripts):
    return merge_triples(extract_edges(small_transcripts)).cache()


def _pairs(df):
    return {(r.a, r.b) for r in df.select("a", "b").collect()}


def test_lsh_equals_bruteforce(spark, merged):
    """LSH blocking with (b=24, r=2) must not lose any true pair."""
    labeled = lnk.entity_labels(merged)
    lsh = lnk.link_pairs(merged, threshold=0.8)
    # brute force: all same-type pairs, exact jaccard
    left = labeled.select(
        F.col("node_id").alias("a"), F.col("entity_type"), F.col("label").alias("la")
    )
    right = labeled.select(
        F.col("node_id").alias("b"), F.col("entity_type"), F.col("label").alias("lb")
    )
    allpairs = left.join(right, "entity_type").filter(F.col("a") < F.col("b"))
    ga = lnk.with_grams(labeled.select("node_id", F.col("label"))).select(
        F.col("node_id").alias("a"), F.col("grams").alias("grams_a")
    )
    gb = lnk.with_grams(labeled.select("node_id", F.col("label"))).select(
        F.col("node_id").alias("b"), F.col("grams").alias("grams_b")
    )
    bf = (
        allpairs.join(ga, "a").join(gb, "b")
        .withColumn("gi", F.size(F.array_intersect("grams_a", "grams_b")))
        .withColumn("gu", F.size(F.array_union("grams_a", "grams_b")))
        .filter(F.col("gi") * 1000 >= F.col("gu") * 800)
    )
    assert _pairs(lsh) == _pairs(bf)
    assert len(_pairs(lsh)) > 0, "fixture must contain near-duplicate agents"


def test_scorer_parity_sql_vs_pandas(spark, merged):
    """F12: the pandas/Arrow scorer == the JVM array scorer."""
    sqlp = lnk.link_pairs(merged, threshold=0.8, scorer="sql")
    pdp = lnk.link_pairs(merged, threshold=0.8, scorer="pandas")
    assert _pairs(sqlp) == _pairs(pdp)


def test_linked_pairs_are_alt_agents(spark, merged):
    """Every linked pair must be an (agent, agent-alt) couple by fixture
    construction — no false merges between distinct entities."""
    for a, b in _pairs(lnk.link_pairs(merged, threshold=0.8)):
        pair = sorted([a, b])
        assert "agent" in pair[0] and "agent-alt" in pair[1], (a, b)


def test_cc_basic_chain(spark):
    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "a string, b string"
    )
    got = {
        (r.node_id, r.canonical_id)
        for r in ccm.connected_components(pairs).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"),
    }


def test_cc_star_matches_min_propagation_random(spark):
    """large-star/small-star and min-propagation produce identical labels
    on a seeded random graph (mixed component shapes + singleton pairs)."""
    import random

    rng = random.Random(7)
    n = 300
    edges = [
        (f"n{rng.randrange(n):03d}", f"n{rng.randrange(n):03d}")
        for _ in range(260)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "a string, b string")
    want = {
        (r.node_id, r.canonical_id)
        for r in ccm.connected_components(pairs, max_iter=100).collect()
    }
    got = {
        (r.node_id, r.canonical_id)
        for r in ccm.connected_components_star(pairs).collect()
    }
    assert got == want


def test_cc_star_self_loop_only_nodes(spark):
    """a node appearing ONLY in self-loop pairs (a, a) still gets an
    identity row from BOTH algorithms — the 'identical canonical mapping'
    contract must hold on such inputs too."""
    pairs = spark.createDataFrame(
        [("solo", "solo"), ("a", "b"), ("b", "b")], "a string, b string"
    )
    want = {("solo", "solo"), ("a", "a"), ("b", "a")}
    got_min = {
        (r.node_id, r.canonical_id)
        for r in ccm.connected_components(pairs).collect()
    }
    got_star = {
        (r.node_id, r.canonical_id)
        for r in ccm.connected_components_star(pairs).collect()
    }
    assert got_min == want
    assert got_star == want


def test_cc_star_long_chain_converges_fast(spark):
    """a 400-node path needs ~400 min-propagation rounds (min moves one hop
    per round) but collapses in O(log^2 n) star rounds — the documented
    reason the star variant exists."""
    chain = [(f"c{i:04d}", f"c{i + 1:04d}") for i in range(399)]
    pairs = spark.createDataFrame(chain, "a string, b string")
    with pytest.raises(RuntimeError):
        ccm.connected_components(pairs, max_iter=5)
    labels = ccm.connected_components_star(pairs, max_iter=15).collect()
    assert len(labels) == 400
    assert {r.canonical_id for r in labels} == {"c0000"}


def test_canonicalize_idempotent(spark, merged):
    """north_star invariant: running linking+canonicalization twice changes
    nothing (union-find canonicalization idempotence)."""
    pairs = lnk.link_pairs(merged, threshold=0.8)
    labels = ccm.connected_components(pairs)
    once = ccm.canonicalize_edges(merged, labels).cache()
    pairs2 = lnk.link_pairs(once, threshold=0.8)
    # after merging, the alt agents are gone -> linking finds nothing new
    # with label sets now unified (pairs among identical canonical ids only)
    remaining = {(r.a, r.b) for r in pairs2.select("a", "b").collect()}
    assert remaining == set()
    labels2 = ccm.connected_components(pairs2) if remaining else None
    twice = once if labels2 is None else ccm.canonicalize_edges(once, labels2)
    t1 = {(r.subj, r.pred, r.obj) for r in once.select("subj", "pred", "obj").collect()}
    t2 = {(r.subj, r.pred, r.obj) for r in twice.select("subj", "pred", "obj").collect()}
    assert t1 == t2


def test_nodes_table(spark, merged):
    pairs = lnk.link_pairs(merged, threshold=0.8)
    labels = ccm.connected_components(pairs)
    nodes = ccm.build_nodes(merged, labels).cache()
    # alt agents map onto their source agent
    remapped = nodes.filter(F.col("node_id") != F.col("canonical_id"))
    assert remapped.count() > 0
    for r in remapped.collect():
        assert "agent-alt" in r.node_id and "agent-alt" not in r.canonical_id
    # every edge term appears
    n_terms = (
        merged.select(F.col("subj").alias("t"))
        .unionByName(merged.select(F.col("obj").alias("t")))
        .distinct()
        .count()
    )
    assert nodes.count() == n_terms


# --- incremental connected components (round 3) -------------------------------


def _batch_cc(spark, pairs_list):
    pairs = spark.createDataFrame(pairs_list, "a string, b string")
    return {
        (r.node_id, r.canonical_id)
        for r in ccm.connected_components(pairs, max_iter=100).collect()
    }


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_incremental_cc_equals_batch_random(spark, seed):
    """incremental fold-in over ANY split == one batch CC over the union —
    on seeded random graphs covering merges across base components, fresh
    nodes bridging into old components, fresh-only components, and
    increments that land inside one existing component."""
    import random

    rng = random.Random(seed)
    n = 120
    edges = list(
        {
            (f"n{rng.randrange(n):03d}", f"n{rng.randrange(n):03d}")
            for _ in range(140)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    cut = len(edges) * 2 // 3
    base_pairs, inc_pairs = edges[:cut], edges[cut:]

    base = ccm.connected_components(
        spark.createDataFrame(base_pairs, "a string, b string"), max_iter=100
    )
    inc = spark.createDataFrame(inc_pairs, "a string, b string")
    got = {
        (r.node_id, r.canonical_id)
        for r in ccm.incremental_components(base, inc).collect()
    }
    assert got == _batch_cc(spark, edges)


def test_incremental_cc_delta_is_increment_scoped(spark):
    """the delta names ONLY touched components and fresh nodes — an
    untouched base component must not appear in either output."""
    base = ccm.connected_components(
        spark.createDataFrame(
            [("b", "a"), ("c", "b"), ("y", "z")], "a string, b string"
        )
    )
    inc = spark.createDataFrame([("c", "d"), ("q", "r")], "a string, b string")
    remap, fresh = ccm.incremental_components_delta(base, inc)
    assert {(r.node_id, r.canonical_id) for r in remap.collect()} == set()
    assert {(r.node_id, r.canonical_id) for r in fresh.collect()} == {
        ("d", "a"),
        ("q", "q"),
        ("r", "q"),
    }
    # the y/z component is untouched: full output still carries it unchanged
    full = ccm.incremental_components(base, inc)
    assert ("y", "y") in {(r.node_id, r.canonical_id) for r in full.collect()}


def test_incremental_cc_fresh_node_lowers_canonical(spark):
    """a fresh node with a smaller id than the old canonical re-labels the
    WHOLE old component through the remap."""
    base = ccm.connected_components(
        spark.createDataFrame([("m", "p")], "a string, b string")
    )
    inc = spark.createDataFrame([("a", "p")], "a string, b string")
    remap, fresh = ccm.incremental_components_delta(base, inc)
    assert {(r.node_id, r.canonical_id) for r in remap.collect()} == {("m", "a")}
    assert {(r.node_id, r.canonical_id) for r in fresh.collect()} == {("a", "a")}
    got = {
        (r.node_id, r.canonical_id)
        for r in ccm.incremental_components(base, inc).collect()
    }
    assert got == {("a", "a"), ("m", "a"), ("p", "a")}


def test_incremental_cc_intra_component_pair_is_noop(spark):
    """an increment entirely inside one existing component changes nothing."""
    base = ccm.connected_components(
        spark.createDataFrame([("b", "a"), ("c", "a")], "a string, b string")
    )
    inc = spark.createDataFrame([("b", "c")], "a string, b string")
    remap, fresh = ccm.incremental_components_delta(base, inc)
    assert remap.count() == 0 and fresh.count() == 0
    got = {
        (r.node_id, r.canonical_id)
        for r in ccm.incremental_components(base, inc).collect()
    }
    assert got == {("a", "a"), ("b", "a"), ("c", "a")}


# --- incremental entity linking (round 3) -------------------------------------


def test_incremental_link_equals_batch_restricted(spark, small_transcripts):
    """incremental shard linking (band keys joined against the base's
    persisted index) == batch link_pairs over the union, restricted to
    pairs touching the shard's entities."""
    from breg_dcat_harvester_spark.operators.extract import extract_edges as ee
    from breg_dcat_harvester_spark.operators.merge import merge_triples as mt

    is_inc = F.substring(F.sha2(F.col("conv_id"), 256), 64, 1).isin(
        "0", "4", "8", "c"
    )
    new = mt(ee(small_transcripts.filter(is_inc), emit_provenance=False)).cache()
    base = mt(ee(small_transcripts.filter(~is_inc), emit_provenance=False)).cache()
    combined = mt(ee(small_transcripts, emit_provenance=False)).cache()

    got = {
        (r.entity_type, r.a, r.b, r.g_inter, r.g_union)
        for r in lnk.incremental_link_pairs(new, base).collect()
    }
    assert got, "split must produce linkable shard entities"

    touched = {r.node_id for r in lnk.entity_labels(new).collect()}
    want = {
        (r.entity_type, r.a, r.b, r.g_inter, r.g_union)
        for r in lnk.link_pairs(combined).collect()
        if r.a in touched or r.b in touched
    }
    assert got == want


def test_incremental_link_accepts_persisted_index(spark, small_transcripts):
    """passing the persisted index artifacts is result-identical to
    recomputing them from the base edges."""
    from breg_dcat_harvester_spark.operators.extract import extract_edges as ee
    from breg_dcat_harvester_spark.operators.merge import merge_triples as mt

    is_inc = F.substring(F.sha2(F.col("conv_id"), 256), 64, 1).isin(
        "0", "4", "8", "c"
    )
    new = mt(ee(small_transcripts.filter(is_inc), emit_provenance=False)).cache()
    base = mt(ee(small_transcripts.filter(~is_inc), emit_provenance=False)).cache()
    index = lnk.entity_band_keys(
        lnk.with_grams(lnk.entity_labels(base))
    ).cache()
    counts = index.groupBy("entity_type", "band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("_n")
    )
    direct = {
        tuple(r)
        for r in lnk.incremental_link_pairs(new, base).collect()
    }
    via_index = {
        tuple(r)
        for r in lnk.incremental_link_pairs(
            new, base, base_index=index, base_bucket_counts=counts
        ).collect()
    }
    assert direct == via_index
