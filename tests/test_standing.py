"""Standing-KG snapshots (plans/standing.py) + the invariant auditor
(canonicalize.validate_kg).

Compaction contract: after a checkpointed batch build plus one
increment, `compact_standing` -> `load_standing` round-trips every
table set-equal, carries the scalar pins (max_types, threshold), cuts
the on-disk part-file count vs the fragmented per-stage checkpoints,
and — the property that matters — a SECOND increment applied to the
reloaded snapshot produces bit-identical accepted/clusters/kg tables
to one applied to the live in-session dict.

Auditor contract: a healthy pipeline result is all-zeros; each
documented corruption fires exactly its own invariant counter.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from veealign_spark.operators import canonicalize
from veealign_spark.plans.incremental import incremental_update
from veealign_spark.plans.pipeline import PipelineConfig, run_pipeline
from veealign_spark.plans.standing import (
    compact_standing,
    load_standing,
    snapshot_file_count,
)

TRIPLES_SCHEMA = "src string, subj string, pred string, obj string, kind string"


@pytest.fixture(scope="module")
def src_frames(spark, fixture_pair):
    tri = fixture_pair["triples"].copy()

    def clone(n):
        t = tri[tri["src"] == "src2"].copy()
        t["src"] = f"src{n}"
        return t

    return {
        "base": spark.createDataFrame(tri, TRIPLES_SCHEMA),
        "inc3": spark.createDataFrame(clone(3), TRIPLES_SCHEMA),
        "inc4": spark.createDataFrame(clone(4), TRIPLES_SCHEMA),
    }


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_compact_load_and_second_increment(spark, src_frames, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig(blocking="blocked", checkpoint_dir=ckpt)
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    inc1 = incremental_update(
        spark, standing, new_triples=src_frames["inc3"], config=cfg
    )

    snap = str(tmp_path / "snap")
    manifest = compact_standing(spark, inc1, snap)
    assert manifest["scalars"]["max_types"] == cfg.max_types
    loaded = load_standing(spark, snap, verify=True)

    # table-level roundtrip: set-equal on the state later plans consume
    for name, cols in [
        ("accepted", ["ent1", "ent2"]),
        ("clusters", ["entity", "canon_id"]),
        ("kg_triples", ["subj", "pred", "obj", "kind"]),
        ("kg_entities", ["entity"]),
        ("triples", ["src", "subj", "pred", "obj", "kind"]),
    ]:
        assert _rows(loaded[name], cols) == _rows(inc1[name], cols), name

    # compaction actually compacts: the snapshot holds fewer part files
    # than the fragmented per-stage checkpoint tree it replaces
    assert snapshot_file_count(snap) < snapshot_file_count(ckpt)

    # the deployment property: increment N+2 off the RELOADED snapshot
    # == increment N+2 off the live dict (cold-start equivalence).
    # Fresh checkpoint dirs per side: resume state must not leak.
    cfg_live = PipelineConfig(
        blocking="blocked", checkpoint_dir=str(tmp_path / "ck_live")
    )
    cfg_cold = PipelineConfig(
        blocking="blocked", checkpoint_dir=str(tmp_path / "ck_cold")
    )
    inc_live = incremental_update(
        spark, inc1, new_triples=src_frames["inc4"], config=cfg_live
    )
    inc_cold = incremental_update(
        spark, loaded, new_triples=src_frames["inc4"], config=cfg_cold
    )
    for name, cols in [
        ("accepted", ["ent1", "ent2"]),
        ("clusters", ["entity", "canon_id"]),
        ("kg_triples", ["subj", "pred", "obj", "kind"]),
    ]:
        assert _rows(inc_cold[name], cols) == _rows(inc_live[name], cols), name

    # torn-snapshot detection: manifest row count mismatch raises
    import json
    import os

    with open(os.path.join(snap, "manifest.json")) as f:
        m = json.load(f)
    m["tables"]["accepted"] += 1
    with open(os.path.join(snap, "manifest.json"), "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="torn"):
        load_standing(spark, snap, verify=True)
    # unverified load still works (the fast path)
    assert load_standing(spark, snap)["accepted"] is not None


def _violations(vdf) -> dict:
    return {r["invariant"]: r["violations"] for r in vdf.collect()}


def test_validate_kg_healthy_and_corrupted(spark, src_frames):
    cfg = PipelineConfig(blocking="blocked")
    res = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    clusters, accepted = res["clusters"], res["accepted"]
    kg_t, kg_e = res["kg_triples"], res["kg_entities"]

    healthy = _violations(canonicalize.validate_kg(clusters, accepted, kg_t, kg_e))
    assert set(healthy) == {
        "entity_multi_cluster",
        "canon_not_min",
        "cross_cluster_accepted",
        "dup_kg_triples",
        "dangling_kg_ref",
        "unresolved_kg_ref",
    }
    assert all(v == 0 for v in healthy.values()), healthy

    # (a) duplicate canonical triple -> dup_kg_triples fires
    dup = kg_t.unionByName(kg_t.limit(1))
    v = _violations(canonicalize.validate_kg(clusters, accepted, dup, kg_e))
    assert v["dup_kg_triples"] == 1 and v["cross_cluster_accepted"] == 0

    # (b) drop one accepted endpoint's cluster row -> cross_cluster fires
    one_ent = accepted.select(F.col("ent1").alias("entity")).limit(1)
    torn = clusters.join(one_ent, "entity", "left_anti")
    v = _violations(canonicalize.validate_kg(torn, accepted, kg_t, kg_e))
    assert v["cross_cluster_accepted"] >= 1

    # (c) canon id not the min member -> canon_not_min fires
    bad = clusters.withColumn(
        "canon_id", F.concat(F.col("canon_id"), F.lit("~zz"))
    )
    v = _violations(canonicalize.validate_kg(bad))
    assert v["canon_not_min"] >= 1

    # (d) entity in two clusters -> entity_multi_cluster fires
    two = clusters.unionByName(
        clusters.limit(1).withColumn("canon_id", F.lit("zzz#other"))
    )
    v = _violations(canonicalize.validate_kg(two))
    assert v["entity_multi_cluster"] == 1

    # (e) a triple that escaped the canonical rewrite -> unresolved fires
    raw_row = (
        res["triples"]
        .join(
            clusters.filter(F.col("entity") != F.col("canon_id"))
            .select(
                F.split("entity", "#").getItem(0).alias("src"),
                F.split("entity", "#").getItem(1).alias("subj"),
            )
            .limit(1),
            ["src", "subj"],
        )
        .select(
            F.concat_ws("#", "src", "subj").alias("subj"),
            "pred",
            F.concat_ws("#", "src", "obj").alias("obj"),
            "kind",
        )
        .limit(1)
    )
    v = _violations(
        canonicalize.validate_kg(clusters, accepted, kg_t.unionByName(raw_row), kg_e)
    )
    assert v["unresolved_kg_ref"] >= 1


def test_publish_versions_current_and_expire(spark, src_frames, tmp_path):
    from veealign_spark.plans.standing import (
        current_version,
        expire_snapshots,
        list_versions,
        publish_standing,
    )

    cfg = PipelineConfig(blocking="blocked")
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    root = str(tmp_path / "pubroot")

    # v1: publish the batch build; CURRENT resolves to it
    m1 = publish_standing(spark, standing, root)
    assert m1["version"] == 1
    assert list_versions(root) == [1] and current_version(root) == 1
    assert (
        load_standing(spark, root, verify=True)["accepted"].count()
        == standing["accepted"].count()
    )

    # v2: publish after an increment; a root load now sees the NEW KG,
    # while the v1 directory stays readable as a pinned historical
    # snapshot (time travel)
    inc = incremental_update(
        spark, standing, new_triples=src_frames["inc3"], config=cfg
    )
    m2 = publish_standing(spark, inc, root)
    assert m2["version"] == 2
    assert list_versions(root) == [1, 2] and current_version(root) == 2
    assert (
        load_standing(spark, root, verify=True)["accepted"].count()
        == inc["accepted"].count()
    )
    import os

    v1 = load_standing(spark, os.path.join(root, "v00001"), verify=True)
    assert v1["accepted"].count() == standing["accepted"].count()

    # the atomicity seam: with a fully-written v3 staged but CURRENT
    # not yet flipped, a root reader still gets v2 intact
    v3dir = os.path.join(root, "v00003")
    compact_standing(spark, inc, v3dir)
    assert current_version(root) == 2
    assert (
        load_standing(spark, root, verify=True)["accepted"].count()
        == inc["accepted"].count()
    )

    # expire: keep=1 drops v1 (not current), never the live version
    removed = expire_snapshots(root, keep=1)
    assert removed == [1]
    assert 1 not in list_versions(root) and current_version(root) == 2
    # live snapshot still loads after expiry
    assert load_standing(spark, root, verify=True)["accepted"].count() == \
        inc["accepted"].count()
    with pytest.raises(ValueError, match="keep"):
        expire_snapshots(root, keep=0)


def test_incremental_publish_chain(spark, src_frames, tmp_path):
    """Format-2 delta publishing: per-source tables are NOT rewritten
    per feed — each incremental publish ships only the new sources'
    rows and references the base version's directories. Pins: chained
    manifests reference the whole history, a cold root load equals the
    live dict, a pinned mid-chain version still loads, reference-aware
    retention refuses to reclaim a referenced base even outside the
    keep window, and a full publish re-flattens the chain making it
    reclaimable."""
    import os

    from veealign_spark.plans.standing import (
        current_version,
        expire_snapshots,
        list_versions,
        publish_standing,
        read_manifest,
    )

    cfg = PipelineConfig(blocking="blocked")
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    inc1 = incremental_update(
        spark, standing, new_triples=src_frames["inc3"], config=cfg
    )
    inc2 = incremental_update(
        spark, inc1, new_triples=src_frames["inc4"], config=cfg
    )
    root = str(tmp_path / "pubroot")
    publish_standing(spark, standing, root)  # v1: full
    publish_standing(spark, inc1, root, incremental=True)  # v2: delta
    publish_standing(spark, inc2, root, incremental=True)  # v3: delta

    # the manifests chain: v3's triples union the whole history, and
    # the delta rows are exactly the new source's
    m2, m3 = read_manifest(root, 2), read_manifest(root, 3)
    assert m2["format_version"] == 2 and m3["format_version"] == 2
    assert m2["tables"]["triples"]["paths"] == [
        "v00001/table=triples", "v00002/table=triples",
    ]
    assert m3["tables"]["triples"]["paths"] == [
        "v00001/table=triples", "v00002/table=triples",
        "v00003/table=triples",
    ]
    n_src3 = src_frames["inc3"].count()
    assert (
        m2["tables"]["triples"]["rows"]
        == standing["triples"].count() + n_src3
    )
    # v3's own delta dir holds ONLY src4's triples
    v3_delta = spark.read.parquet(os.path.join(root, "v00003/table=triples"))
    assert v3_delta.select("src").distinct().collect()[0]["src"] == "src4"

    # the embedding cache is delta-committed too (append-only via the
    # anti-join merge): the chain references v1's vocab and the total
    # matches the live table
    assert m3["tables"]["vocab"]["paths"][0] == "v00001/table=vocab"
    assert m3["tables"]["vocab"]["rows"] == inc2["vocab"].count()

    # cold load of the root == the live dict, on every table class
    cold = load_standing(spark, root, verify=True)
    for name, cols in [
        ("triples", ["src", "subj", "pred", "obj", "kind"]),
        ("contexts", None),
        ("accepted", ["ent1", "ent2"]),
        ("clusters", ["entity", "canon_id"]),
        ("kg_triples", ["subj", "pred", "obj", "kind"]),
    ]:
        cc = cols or cold[name].columns
        assert _rows(cold[name], cc) == _rows(inc2[name], cc), name
    # scalars traveled too (the arity pin the next increment needs)
    assert cold["max_types"] == cfg.max_types

    # a pinned mid-chain version still loads and equals its state
    mid = load_standing(spark, os.path.join(root, "v00002"), verify=True)
    assert _rows(mid["accepted"], ["ent1", "ent2"]) == _rows(
        inc1["accepted"], ["ent1", "ent2"]
    )

    # the loaded dict is live: the NEXT increment off it == off inc2...
    # (covered at class level by test_compact_load_and_second_increment;
    # here the cheap functional check is validate_kg all-zero)
    from veealign_spark.operators import canonicalize

    audit = {
        r["invariant"]: r["violations"]
        for r in canonicalize.validate_kg(
            cold["clusters"], cold["accepted"], cold["kg_triples"],
            cold["kg_entities"],
        ).collect()
    }
    assert all(v == 0 for v in audit.values()), audit

    # reference-aware retention: keep=1 would drop v1+v2, but v3
    # references both -> nothing is reclaimable
    assert expire_snapshots(root, keep=1) == []
    assert list_versions(root) == [1, 2, 3]

    # a FULL publish re-flattens; the old chain then expires together
    publish_standing(spark, inc2, root)  # v4: full
    assert current_version(root) == 4
    assert sorted(expire_snapshots(root, keep=1)) == [1, 2, 3]
    assert list_versions(root) == [4]
    flat = load_standing(spark, root, verify=True)
    assert _rows(flat["accepted"], ["ent1", "ent2"]) == _rows(
        inc2["accepted"], ["ent1", "ent2"]
    )


def test_incremental_publish_refuses_sourceless_base(
    spark, src_frames, tmp_path
):
    """An incremental publish off a base manifest with no recorded
    source set would silently duplicate the base's per-source rows
    (the manifest count would still verify) — it must refuse."""
    import json
    import os

    from veealign_spark.plans.standing import publish_standing

    cfg = PipelineConfig(blocking="blocked")
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    root = str(tmp_path / "pubroot")
    publish_standing(spark, standing, root)
    mpath = os.path.join(root, "v00001", "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    del m["sources"]  # a pre-sources-field manifest
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="source set"):
        publish_standing(spark, standing, root, incremental=True)


def test_vocab_delta_falls_back_on_dropped_term(spark, src_frames, tmp_path):
    """The vocab delta commit self-verifies: if any base term is gone
    from the live table (append-only violated), the count check falls
    back to a FULL vocab rewrite instead of publishing a delta that
    would resurrect the dropped term from the base directories."""
    from veealign_spark.plans.standing import publish_standing, read_manifest

    cfg = PipelineConfig(blocking="blocked")
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    root = str(tmp_path / "pubroot")
    publish_standing(spark, standing, root)

    n = standing["vocab"].count()
    shrunk = dict(standing)
    shrunk["vocab"] = standing["vocab"].limit(n - 5)
    publish_standing(spark, shrunk, root, incremental=True)

    m2 = read_manifest(root, 2)
    # vocab: full rewrite (single path, under v2), correct count
    assert m2["tables"]["vocab"]["paths"] == ["v00002/table=vocab"]
    assert m2["tables"]["vocab"]["rows"] == n - 5
    cold = load_standing(spark, root, verify=True)
    assert cold["vocab"].count() == n - 5
    # per-source tables still delta-committed: v1 stays the bulk (an
    # empty delta dir may or may not materialize a 0-row part file)
    assert m2["tables"]["triples"]["paths"][0] == "v00001/table=triples"
    assert m2["tables"]["triples"]["rows"] == standing["triples"].count()


def test_incremental_publish_refuses_after_retraction(
    spark, src_frames, tmp_path
):
    """The delta commit is append-only by contract: after a source
    retraction the base dirs still hold the removed source's rows, so
    an incremental publish must refuse (referencing them would
    resurrect the source on cold load); a FULL publish is the
    post-retraction path and its cold load is clean."""
    from veealign_spark.plans.incremental import incremental_remove
    from veealign_spark.plans.standing import publish_standing

    cfg = PipelineConfig(blocking="blocked")
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    inc = incremental_update(
        spark, standing, new_triples=src_frames["inc3"], config=cfg
    )
    root = str(tmp_path / "pubroot")
    publish_standing(spark, inc, root)

    removed = incremental_remove(spark, inc, ["src3"], config=cfg)
    with pytest.raises(ValueError, match="retraction"):
        publish_standing(spark, removed, root, incremental=True)

    # full publish after the removal: cold load carries no src3 rows
    publish_standing(spark, removed, root)
    cold = load_standing(spark, root, verify=True)
    assert cold["triples"].filter(F.col("src") == "src3").count() == 0
    assert _rows(cold["accepted"], ["ent1", "ent2"]) == _rows(
        removed["accepted"], ["ent1", "ent2"]
    )


def test_diff_versions_and_lineage(spark, src_frames, tmp_path):
    """diff_versions is the post-increment audit: the v1->v2 KG diff is
    exactly the increment's triple delta (all 'added' here — an
    increment only grows the KG), a self-diff is empty, multiset
    semantics expose a duplicate row even when the distinct set is
    unchanged, and caller lineage survives in the manifest."""
    from veealign_spark.plans.standing import (
        diff_versions,
        publish_standing,
        read_manifest,
    )

    cfg = PipelineConfig(blocking="blocked")
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    inc = incremental_update(
        spark, standing, new_triples=src_frames["inc3"], config=cfg
    )
    root = str(tmp_path / "pubroot")
    publish_standing(spark, standing, root, lineage={"feed": "batch0"})
    publish_standing(spark, inc, root, lineage={"feed": "inc3"})

    # inc3 is a content-clone of src2: every canonical triple it carries
    # already exists, so the canonical-KG diff is EMPTY — the audit
    # proves a duplicate feed added no knowledge...
    assert diff_versions(spark, root, 1, 2).count() == 0
    # ...while the cluster diff shows exactly the absorbed entities
    ccols = ["entity", "canon_id"]
    d = diff_versions(spark, root, 1, 2, table="clusters")
    added = _rows(d.filter(F.col("change") == "added"), ccols)
    removed = _rows(d.filter(F.col("change") == "removed"), ccols)
    want = sorted(
        set(_rows(inc["clusters"], ccols))
        - set(_rows(standing["clusters"], ccols))
    )
    assert added == want and added  # src3's entities joined the clusters
    assert removed == []

    # self-diff is empty; reversed diff mirrors added<->removed
    assert diff_versions(spark, root, 2, 2, table="clusters").count() == 0
    assert (
        diff_versions(spark, root, 2, 1, table="clusters")
        .filter(F.col("change") == "removed")
        .count()
        == len(added)
    )

    # multiset semantics: publish a version with one duplicated triple;
    # the diff vs v2 is exactly that one extra row, flagged 'added'
    dup = dict(inc)
    dup["kg_triples"] = inc["kg_triples"].unionByName(
        inc["kg_triples"].limit(1)
    )
    publish_standing(spark, dup, root)
    d3 = diff_versions(spark, root, 2, 3)
    assert d3.count() == 1
    assert d3.select("change").first()["change"] == "added"

    # lineage round-trips through the manifest (pinned + CURRENT forms)
    assert read_manifest(root, 2)["lineage"] == {"feed": "inc3"}
    assert read_manifest(root)["version"] == 3

    with pytest.raises(ValueError, match="unknown standing table"):
        diff_versions(spark, root, 1, 2, table="nope")


def test_format_version_and_publisher_claim(spark, src_frames, tmp_path):
    """A snapshot written by a newer (incompatible) layout is refused
    at load instead of misread; and the version directory acts as a
    publisher's mkdir-lock — a staged directory at the next version
    number makes publish advance past it rather than interleave table
    writes into it."""
    import json
    import os

    from veealign_spark.plans.standing import publish_standing

    cfg = PipelineConfig(blocking="blocked")
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)

    snap = str(tmp_path / "snap")
    compact_standing(spark, standing, snap)
    with open(os.path.join(snap, "manifest.json")) as f:
        m = json.load(f)
    m["format_version"] = 99
    with open(os.path.join(snap, "manifest.json"), "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="format_version"):
        load_standing(spark, snap)

    root = str(tmp_path / "pubroot")
    publish_standing(spark, standing, root)
    # another publisher (or a crashed one) already claimed v00002
    os.makedirs(os.path.join(root, "v00002"))
    m3 = publish_standing(spark, standing, root)
    assert m3["version"] == 3
    from veealign_spark.plans.standing import current_version

    assert current_version(root) == 3
    assert load_standing(spark, root, verify=True)["accepted"] is not None


def test_reader_pinned_version_survives_one_flip(spark, src_frames, tmp_path):
    """The retention-window contract for concurrent readers: a reader
    that resolved CURRENT -> vN keeps reading vN's directory after the
    publisher flips to vN+1, as long as retention keeps >= 2 versions.
    With keep=1 the pinned version is reclaimed out from under the
    reader and its next read fails loudly (never a torn result) — the
    explicit policy: run expire_snapshots with keep >= 2 wherever
    readers overlap publishes; keep=1 is for single-process loops like
    the streaming ingest test."""
    import os

    from veealign_spark.plans.standing import (
        expire_snapshots,
        publish_standing,
    )

    cfg = PipelineConfig(blocking="blocked")
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    inc = incremental_update(
        spark, standing, new_triples=src_frames["inc3"], config=cfg
    )
    root = str(tmp_path / "pubroot")
    publish_standing(spark, standing, root)

    # reader resolves CURRENT -> v1 (the first half of load_standing)
    pinned = os.path.join(root, "v00001")

    # publisher flips to v2 and runs retention with keep=2: the
    # reader's pinned v1 is still on disk, so its (late) table reads
    # complete and see exactly the v1 KG
    publish_standing(spark, inc, root)
    assert expire_snapshots(root, keep=2) == []
    late = load_standing(spark, pinned, verify=True)
    assert late["accepted"].count() == standing["accepted"].count()

    # keep=1 reclaims v1: the pinned reader now fails loudly at
    # manifest open (no partial table reads), and a fresh root resolve
    # sees the complete v2
    assert expire_snapshots(root, keep=1) == [1]
    with pytest.raises(FileNotFoundError):
        load_standing(spark, pinned, verify=True)
    assert (
        load_standing(spark, root, verify=True)["accepted"].count()
        == inc["accepted"].count()
    )


def test_threaded_publish_never_tears_a_reader(spark, src_frames, tmp_path):
    """Empirical atomicity smoke: a publisher thread pushes versions
    while the main thread load_standing(root, verify=True) in a tight
    loop. Every read must succeed and return a row count matching one
    of the published KGs — never a torn mixture, never an error.
    Retention is disabled (keep > versions) so only the CURRENT-flip
    atomicity is on trial; the retention window has its own test."""
    import threading

    from veealign_spark.plans.standing import (
        current_version,
        publish_standing,
    )

    cfg = PipelineConfig(blocking="blocked")
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    inc = incremental_update(
        spark, standing, new_triples=src_frames["inc3"], config=cfg
    )
    root = str(tmp_path / "pubroot")
    publish_standing(spark, standing, root)

    n_base = standing["accepted"].count()
    n_inc = inc["accepted"].count()
    assert n_inc != n_base  # the two versions are distinguishable

    errors: list[BaseException] = []

    def publisher():
        try:
            # alternate the two KGs across three more versions
            for st in (inc, standing, inc):
                publish_standing(spark, st, root)
        except BaseException as e:  # pragma: no cover - surfaced below
            errors.append(e)

    t = threading.Thread(target=publisher)
    t.start()
    seen_versions = set()
    reads = 0
    try:
        while t.is_alive() or reads == 0:
            loaded = load_standing(spark, root, verify=True)
            n = loaded["accepted"].count()
            assert n in (n_base, n_inc), n
            seen_versions.add(current_version(root))
            reads += 1
    finally:
        t.join()
    assert not errors, errors
    # the loop genuinely overlapped the publisher and landed on the
    # final version in the end
    assert reads >= 2
    assert current_version(root) == 4
    assert (
        load_standing(spark, root, verify=True)["accepted"].count() == n_inc
    )


def test_expire_grace_window_spares_recent_claims(spark, src_frames, tmp_path):
    """A manifest-less version dir is a publisher's claim: a RECENT one
    may be a slow concurrent publisher mid-write and must survive the
    retention sweep; one older than the grace window is crash garbage
    and is reclaimed (ADVICE r5)."""
    import os

    from veealign_spark.plans.standing import expire_snapshots, publish_standing

    cfg = PipelineConfig(blocking="blocked")
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    root = str(tmp_path / "pubroot")
    for _ in range(3):
        publish_standing(spark, standing, root)

    fresh = os.path.join(root, "v00004")
    os.makedirs(fresh)  # in-flight concurrent publisher
    stale = os.path.join(root, "v00005")
    os.makedirs(stale)  # crashed publisher, long dead
    os.utime(stale, (1, 1))
    # two more publishes age the claims out of the keep window
    publish_standing(spark, standing, root)
    publish_standing(spark, standing, root)

    removed = expire_snapshots(root, keep=2)
    assert 5 in removed and not os.path.exists(stale)
    assert 4 not in removed and os.path.exists(fresh)
    # grace 0 = old behaviour: every unreferenced claim is garbage
    removed2 = expire_snapshots(root, keep=2, claim_grace_sec=0)
    assert 4 in removed2 and not os.path.exists(fresh)


def test_torn_publish_is_invisible_and_recoverable(spark, src_frames, tmp_path):
    """Publisher killed between the table writes and the CURRENT flip:
    the orphan version is invisible to root readers, the next publish
    claims a fresh version, and retention eventually reclaims the
    orphan (VERDICT r5 next-round item #5)."""
    import os

    from veealign_spark.plans.standing import (
        current_version,
        expire_snapshots,
        publish_standing,
    )

    cfg = PipelineConfig(blocking="blocked")
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    root = str(tmp_path / "pubroot")
    publish_standing(spark, standing, root)

    # simulate the torn publish: tables fully written at v2, no flip
    v2 = os.path.join(root, "v00002")
    compact_standing(spark, standing, v2)
    os.remove(os.path.join(v2, "manifest.json"))
    assert current_version(root) == 1
    assert load_standing(spark, root, verify=True)["accepted"].count() == \
        standing["accepted"].count()

    # restarted publisher claims a FRESH version (v3), never reuses v2
    m = publish_standing(spark, standing, root)
    assert m["version"] == 3 and current_version(root) == 3
    # the orphan ages out and is reclaimed
    os.utime(v2, (1, 1))
    assert 2 in expire_snapshots(root, keep=1)
    assert not os.path.exists(v2)
    assert load_standing(spark, root, verify=True)["accepted"] is not None


def test_vocab_delta_requires_matching_vector_mode(spark, src_frames, tmp_path):
    """A standing dict rebuilt under a different vector layout keeps
    the term set while every vector changes — the delta guards only
    terms, so the publish must fall back to a FULL vocab rewrite on a
    vector_mode mismatch (ADVICE r5, medium)."""
    from veealign_spark.plans.standing import publish_standing, read_manifest

    cfg = PipelineConfig(blocking="blocked")
    standing = run_pipeline(spark, triples=src_frames["base"], config=cfg)
    root = str(tmp_path / "pubroot")
    publish_standing(spark, standing, root)

    relabeled = dict(standing)
    relabeled["vector_mode"] = "prejoined"  # layout changed, terms kept
    publish_standing(spark, relabeled, root, incremental=True)
    m2 = read_manifest(root, 2)
    assert m2["tables"]["vocab"]["paths"] == ["v00002/table=vocab"]

    # unchanged vector_mode still delta-commits the vocab
    publish_standing(spark, relabeled, root, incremental=True)
    m3 = read_manifest(root, 3)
    assert m3["tables"]["vocab"]["paths"][0].startswith("v00002/")
