"""Standing-KG snapshots: compact, persist, and re-open the state that
`run_pipeline` / `incremental_update` carry between feeds.

The deployment gap this closes: the standing dict those plans exchange
lives in-session (local checkpoints) or — with a checkpoint_dir — as
one parquet directory PER STAGE PER INCREMENT (`inc_<fp>_*`). After K
increments the durable state is K fragments of each logical table, the
resume path re-derives the dict by replaying ledger stages, and file
counts grow linearly with feed count (the classic small-file problem —
on a real cluster these are Iceberg tables and this module is their
`rewrite_data_files` maintenance action plus a snapshot manifest).

`compact_standing` rewrites every standing table into ONE versioned
snapshot directory — one shuffle per table, partitioned by that
table's natural key so AQE picks the output file count (small tables
collapse to one file, corpus tables stay wide) — and records a
manifest (row counts, scalars such as `max_types`/`threshold`, the
source set). `load_standing` re-opens a snapshot cold (a fresh driver,
days later) into exactly the dict `incremental_update` expects; the
arity pin (`max_types`) and tuned threshold travel in the manifest, so
the round-4 silent-mis-shape hazard cannot re-enter through a restart.

Equality contract (tests/test_standing.py): every compacted table is
set-equal to its in-session original, and an increment applied to the
RELOADED snapshot produces bit-identical accepted/clusters/kg tables
to one applied to the live dict.

`publish_standing` layers snapshot HISTORY on top: each publish writes
a fresh `v{N:05d}/` snapshot under a root and then atomically flips a
`CURRENT` pointer file (write-temp + os.replace), so a concurrent
`load_standing(root)` reads the previous complete snapshot or the new
complete snapshot — never a half-written one. `expire_snapshots`
bounds the history (the Iceberg `expire_snapshots` maintenance analog)
and refuses to remove the version CURRENT points at.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# every DataFrame key a standing dict carries that later plans consume
# (plans/incremental.py reads: triples, contexts, features,
# prop_contexts, concepts, props, vocab, accepted, clusters,
# kg_triples; the kg_* trio is the materialized graph itself).
# Mapped to the table's natural partition key — on a real cluster this
# is the Iceberg partition spec; here it drives the compaction
# repartition so co-partitioned consumers (per-source filters, cluster
# remaps) read aligned files.
STANDING_TABLES: dict[str, str] = {
    "triples": "src",
    "contexts": "src",
    "features": "src",
    "prop_contexts": "src",
    "concepts": "src",
    "props": "src",
    "vocab": "term",
    "accepted": "ent1",
    "clusters": "canon_id",
    "kg_triples": "subj",
    "kg_entities": "entity",
    "kg_edges": "child",
}

# scalar config the consuming plans need back (incremental_update
# refuses to run without the standing run's max_types — the A5 arity
# pin; threshold is the tuned acceptance bar the run used).
STANDING_SCALARS = ("threshold", "max_types", "vector_mode", "new_sources")

MANIFEST = "manifest.json"

# bumped on any incompatible snapshot-layout change; load_standing
# refuses a mismatched snapshot instead of misreading it.
# format 1: every table entry is a row count, files live under this
#   snapshot's own table=<name>/ dir (full snapshot).
# format 2: a table entry is {"rows": n, "paths": [root-relative
#   dirs]} — an INCREMENTAL publish that references earlier versions'
#   directories for the unchanged bulk and adds only a delta dir.
FORMAT_VERSION = 1
INCREMENTAL_FORMAT = 2
SUPPORTED_FORMATS = (FORMAT_VERSION, INCREMENTAL_FORMAT)

# tables whose rows belong to exactly one source (key "src"): an
# increment only APPENDS new sources' rows to these (pinned by the
# incremental==batch equality), so an incremental publish can ship
# just the delta. These are the corpus-proportional tables — the ones
# a full per-feed rewrite would make O(corpus) per publish.
PER_SOURCE_TABLES = frozenset(
    ("triples", "contexts", "features", "prop_contexts", "concepts", "props")
)

# versioned-root layout: root/v00001/, root/v00002/, ... + root/CURRENT
# (a one-line pointer file naming the live version directory)
CURRENT = "CURRENT"
_VERSION_RE = re.compile(r"^v(\d{5})$")


def _table_path(root: str, name: str) -> str:
    return os.path.join(root, f"table={name}")


def _source_set(standing: dict) -> list[str]:
    """The standing KG's source names, from the smallest per-source
    table present (entity-level, never corpus-sized)."""
    for name in ("concepts", "props", "triples"):
        df = standing.get(name)
        if df is not None and "src" in df.columns:
            return sorted(
                r["src"] for r in df.select("src").distinct().collect()
            )
    return []


def _table_entry(root: str, vdir: str, manifest: dict, name: str):
    """Resolve one manifest table entry to (abs_dirs, rows) across both
    manifest formats; `root` is the published root (for root-relative
    format-2 paths), `vdir` the snapshot's own directory."""
    e = manifest["tables"][name]
    if isinstance(e, dict):
        return [os.path.join(root, p) for p in e["paths"]], e["rows"]
    return [_table_path(vdir, name)], e


def compact_standing(
    spark: SparkSession,
    standing: dict,
    out_dir: str,
    tables: dict[str, str] | None = None,
) -> dict:
    """Rewrite the standing dict's tables into one snapshot directory
    and return the manifest dict. One job per table: repartition on the
    table's natural key (AQE coalesces the write to as few files as the
    data needs — compaction IS the point) then parquet. Row counts come
    from the written files' footers (a metadata-only count job), so no
    table is scanned twice.

    Tables absent from the dict (or None — e.g. `vocab` on pre-staging
    standing dicts) are skipped and recorded as absent in the manifest;
    `load_standing` restores them as None and `incremental_update`
    falls back to its re-derivation path exactly as it does live."""
    spec = tables or STANDING_TABLES
    written: dict[str, int] = {}
    for name, key in spec.items():
        df = standing.get(name)
        if df is None:
            continue
        if key in df.columns:
            out = df.repartition(F.col(key))
        else:  # schema drift: still compact, just without the key
            out = df
        out.write.mode("overwrite").parquet(_table_path(out_dir, name))
        written[name] = spark.read.parquet(_table_path(out_dir, name)).count()
    manifest = {
        "tables": written,
        "scalars": {
            k: standing.get(k)
            for k in STANDING_SCALARS
            if standing.get(k) is not None
        },
        "sources": _source_set(standing),
        "created_at": time.time(),
        "format_version": FORMAT_VERSION,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def load_standing(
    spark: SparkSession, snap_dir: str, verify: bool = False
) -> dict:
    """Re-open a `compact_standing` snapshot as a standing dict — the
    cold-start path: a fresh driver resumes the standing KG without
    replaying any ledger stage. With verify=True each table's footer
    row count is checked against the manifest (a metadata-only job per
    table; catches a partially-deleted or mid-overwrite snapshot before
    an increment silently links against a truncated standing KG).

    `snap_dir` may be either a bare snapshot directory (as written by
    `compact_standing`) or a versioned root (as written by
    `publish_standing`) — a root is recognized by its CURRENT pointer
    and resolved to the live version before reading."""
    # a trailing separator would make dirname() below return the vdir
    # itself and mis-resolve root-relative format-2 paths (ADVICE r5)
    snap_dir = os.path.normpath(snap_dir)
    cur = os.path.join(snap_dir, CURRENT)
    if os.path.exists(cur):
        with open(cur) as f:
            snap_dir = os.path.join(snap_dir, f.read().strip())
    with open(os.path.join(snap_dir, MANIFEST)) as f:
        manifest = json.load(f)
    fv = manifest.get("format_version")
    if fv not in SUPPORTED_FORMATS:
        raise ValueError(
            f"standing snapshot {snap_dir!r} has format_version {fv!r}; "
            f"this reader supports {SUPPORTED_FORMATS} — upgrade the "
            "reader or recompact the snapshot with the matching writer"
        )
    root = os.path.dirname(snap_dir)
    out: dict = {name: None for name in STANDING_TABLES}
    for name in manifest["tables"]:
        dirs, n_manifest = _table_entry(root, snap_dir, manifest, name)
        df = spark.read.parquet(*dirs)
        if verify:
            n = df.count()
            if n != n_manifest:
                raise ValueError(
                    f"standing snapshot {snap_dir!r} table {name!r}: "
                    f"manifest records {n_manifest} rows but the files "
                    f"hold {n} — snapshot is torn; recompact before use"
                )
        out[name] = df
    out.update(manifest.get("scalars", {}))
    return out


def list_versions(root: str) -> list[int]:
    """Snapshot versions present under a `publish_standing` root,
    ascending. Non-version entries (CURRENT, stray files) are ignored."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _VERSION_RE.match(name)
        if m and os.path.isdir(os.path.join(root, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(root: str) -> int | None:
    """The version the CURRENT pointer names, or None if unpublished."""
    cur = os.path.join(root, CURRENT)
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        m = _VERSION_RE.match(f.read().strip())
    return int(m.group(1)) if m else None


def publish_standing(
    spark: SparkSession,
    standing: dict,
    root: str,
    tables: dict[str, str] | None = None,
    lineage: dict | None = None,
    incremental: bool = False,
) -> dict:
    """Compact `standing` into the NEXT version directory under `root`
    and atomically flip the CURRENT pointer to it. The pointer flip is
    the publish: the snapshot is fully written (tables + manifest)
    before os.replace() swaps CURRENT, so a reader that opens the root
    at any moment sees the previous complete version or the new one,
    never a torn mixture. Returns the manifest (with `version`).

    `lineage` is caller-supplied provenance recorded verbatim in the
    manifest (JSON-serializable: feed/batch ids, source names, commit)
    so each version stays attributable long after the feed moved on —
    the streaming ingest loop records its epoch id here.

    With `incremental=True` and a CURRENT base version present, the
    corpus-proportional per-source tables (PER_SOURCE_TABLES) are NOT
    rewritten: only the rows of sources absent from the base are
    written as a delta directory, and the manifest references the
    base's directories for the standing bulk (format 2 — the Iceberg
    append-commit analog). This is sound because `incremental_update`
    only ever APPENDS new sources' rows to these tables (the
    incremental==batch bit-equality pins it); the KG-sized match/graph
    tables (accepted, clusters, kg_*, vocab) are rewritten in full as
    before. Per-feed publish cost therefore scales with the INCREMENT
    plus the KG, not the corpus — a full publish per feed would be
    O(corpus) per feed and quadratic across a feed history. Readers
    are unchanged (load_standing unions the referenced dirs);
    `expire_snapshots` refuses to reclaim a version that a retained
    manifest still references. Publish with incremental=False (the
    default) to re-flatten a long reference chain into one full
    snapshot, after which the chain becomes reclaimable — same rhythm
    as Iceberg append commits + periodic rewrite_data_files."""
    os.makedirs(root, exist_ok=True)
    base_version = current_version(root) if incremental else None
    base_manifest = (
        read_manifest(root, base_version) if base_version is not None else None
    )
    if base_manifest is not None and not base_manifest.get("sources"):
        # fail before claiming a version dir (no garbage on refusal);
        # _compact_incremental re-checks as a backstop
        raise ValueError(
            "incremental publish needs a base manifest with a recorded "
            "source set; republish once with incremental=False first"
        )
    standing_sources = _source_set(standing) if base_manifest is not None else None
    if base_manifest is not None:
        # the delta commit is only sound while the feed APPENDS sources:
        # after a retraction (incremental_remove) the base dirs still
        # hold the removed source's per-source rows, and referencing
        # them would silently resurrect it on the next cold load
        gone = set(base_manifest["sources"]) - set(standing_sources)
        if gone:
            raise ValueError(
                f"incremental publish after a retraction (sources "
                f"{sorted(gone)} present in base v{base_manifest['version']} "
                "but absent from the standing dict) would resurrect the "
                "retracted rows from the referenced base directories; "
                "publish with incremental=False after a removal"
            )
    version = (list_versions(root) or [0])[-1] + 1
    # claim the version directory atomically (mkdir is the lock): two
    # concurrent publishers each land on their own version instead of
    # interleaving table writes inside one directory; last CURRENT
    # flip wins, both snapshots stay complete and loadable
    while True:
        vname = f"v{version:05d}"
        vdir = os.path.join(root, vname)
        try:
            os.makedirs(vdir, exist_ok=False)
            break
        except FileExistsError:
            version += 1
    if base_manifest is None:
        manifest = compact_standing(spark, standing, vdir, tables)
    else:
        manifest = _compact_incremental(
            spark, standing, root, vdir, vname, base_manifest, tables,
            sources=standing_sources,
        )
    manifest["version"] = version
    if lineage is not None:
        manifest["lineage"] = lineage
    with open(os.path.join(vdir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    tmp = os.path.join(root, CURRENT + ".tmp")
    with open(tmp, "w") as f:
        f.write(vname + "\n")
    os.replace(tmp, os.path.join(root, CURRENT))
    return manifest


def _compact_incremental(
    spark: SparkSession,
    standing: dict,
    root: str,
    vdir: str,
    vname: str,
    base_manifest: dict,
    tables: dict[str, str] | None = None,
    sources: list[str] | None = None,
) -> dict:
    """Write the format-2 (delta) snapshot for publish_standing's
    incremental path: per-source tables ship only new sources' rows and
    reference the base version's dirs; everything else is rewritten."""
    spec = tables or STANDING_TABLES
    base_sources = base_manifest.get("sources")
    if not base_sources:
        # a pre-sources-field (or source-less) base: treating the full
        # table as delta would silently DUPLICATE the base's rows in
        # the union while the manifest count still verifies — refuse
        # and ask for one full publish to establish a usable base
        raise ValueError(
            "incremental publish needs a base manifest with a recorded "
            "source set; republish once with incremental=False first"
        )
    base_vdir = os.path.join(root, f"v{base_manifest['version']:05d}")
    written: dict[str, dict] = {}
    for name, key in spec.items():
        df = standing.get(name)
        if df is None:
            continue
        delta_only = (
            name in PER_SOURCE_TABLES
            and name in base_manifest["tables"]
            and "src" in df.columns
        )
        vocab_delta = (
            name == "vocab"
            and name in base_manifest["tables"]
            and "term" in df.columns
            # the anti-join/count guard below only catches dropped or
            # duplicated TERMS; a standing dict rebuilt under a
            # different vector layout keeps the term set while every
            # vector changes, and the delta would silently serve the
            # base's stale vectors on cold load (ADVICE r5) — require
            # the base's vector_mode to match, else rewrite in full
            and base_manifest.get("scalars", {}).get("vector_mode")
            == standing.get("vector_mode")
        )
        if delta_only:
            out = df.filter(~F.col("src").isin(base_sources))
            base_dirs, base_rows = _table_entry(
                root, base_vdir, base_manifest, name
            )
            base_paths = [
                os.path.relpath(d, root).replace(os.sep, "/")
                for d in base_dirs
            ]
        elif vocab_delta:
            # the embedding cache is also append-only (the S3 merge is
            # anti-join + union: a term's vector never changes), and at
            # real scale it is term-count x emb_dim — worth the same
            # delta treatment. Unlike per-source tables the invariant
            # is verified HERE, not assumed: the anti-join guarantees
            # the delta is term-disjoint from the base, and the count
            # check below falls back to a full rewrite if any base term
            # was dropped or changed (vocab is small enough to count).
            base_dirs, base_rows = _table_entry(
                root, base_vdir, base_manifest, name
            )
            base_terms = (
                spark.read.parquet(*base_dirs).select("term").distinct()
            )
            # no broadcast hint: at real scale base vocab is millions
            # of terms; let AQE pick the join strategy
            out = df.join(base_terms, "term", "left_anti")
            if df.count() != base_rows + out.count():
                # a base term vanished or duplicated: append-only does
                # not hold for this feed — rewrite in full
                vocab_delta = False
                out = df
                base_paths, base_rows = [], 0
            else:
                base_paths = [
                os.path.relpath(d, root).replace(os.sep, "/")
                for d in base_dirs
            ]
            delta_only = vocab_delta
        else:
            out = df
            base_paths, base_rows = [], 0
        if key in out.columns:
            out = out.repartition(F.col(key))
        dpath = _table_path(vdir, name)
        out.write.mode("overwrite").parquet(dpath)
        if delta_only and not any(
            n.startswith("part-") and n.endswith(".parquet")
            for n in os.listdir(dpath)
        ):
            # no new sources for this table: reference the base only
            # (an empty dir in a multi-path read is not loadable)
            written[name] = {"rows": base_rows, "paths": base_paths}
            continue
        n_new = spark.read.parquet(dpath).count()
        written[name] = {
            # append-only invariant: total = base + delta, no corpus
            # scan needed (load_standing verify=True re-counts the
            # union against this, so a violated invariant is caught
            # at the next verified read)
            "rows": base_rows + n_new,
            "paths": base_paths + [f"{vname}/table={name}"],
        }
    return {
        "tables": written,
        "scalars": {
            k: standing.get(k)
            for k in STANDING_SCALARS
            if standing.get(k) is not None
        },
        "sources": sources if sources is not None else _source_set(standing),
        "base_version": base_manifest.get("version"),
        "created_at": time.time(),
        "format_version": INCREMENTAL_FORMAT,
    }


def expire_snapshots(
    root: str, keep: int = 2, claim_grace_sec: float = 900.0
) -> list[int]:
    """Remove all but the newest `keep` versions under a published
    root; the version CURRENT points at is always retained regardless
    of age (expiring the live snapshot is never maintenance). Returns
    the versions removed.

    A publisher that crashed mid-write leaves a claimed-but-incomplete
    version directory; CURRENT never points at it (the flip is the
    last step), root readers never resolve into it, and this sweep
    reclaims it once `keep` newer versions exist — at most the
    newest-claimed dir can linger, bounded garbage of one directory.

    Incremental (format-2) versions reference earlier versions'
    directories for their standing bulk, so retention is reference-
    aware: a version still referenced (transitively) by any RETAINED
    version is never removed, even when older than the keep window —
    reclaiming it would tear every snapshot built on it. A full
    (incremental=False) publish breaks the chain; after it ages past
    the keep window, the whole chain becomes reclaimable at once."""
    if keep < 1:
        raise ValueError("expire_snapshots: keep must be >= 1")
    versions = list_versions(root)
    live = current_version(root)

    # close the retained set over manifest references (newer -> older
    # only, so one backwards sweep reaches the fixpoint)
    retained = set(versions[-keep:] if keep < len(versions) else versions)
    if live is not None:
        retained.add(live)
    for v in sorted(versions, reverse=True):
        if v not in retained:
            continue
        mpath = os.path.join(root, f"v{v:05d}", MANIFEST)
        if not os.path.exists(mpath):  # claimed-but-incomplete dir
            continue
        with open(mpath) as f:
            m = json.load(f)
        for e in m.get("tables", {}).values():
            if isinstance(e, dict):
                for p in e["paths"]:
                    ref = _VERSION_RE.match(p.split("/", 1)[0])
                    if ref:
                        retained.add(int(ref.group(1)))

    removed = []
    now = time.time()
    for v in versions:
        if v in retained:
            continue
        vdir = os.path.join(root, f"v{v:05d}")
        if not os.path.exists(os.path.join(vdir, MANIFEST)):
            # manifest-less = claimed by a publisher that has not (yet)
            # finished. A RECENT claim may be a slow concurrent
            # publisher mid-write — reclaiming it would rmtree its
            # in-flight tables (ADVICE r5); only claims older than the
            # grace window are treated as crash garbage.
            try:
                age = now - os.path.getmtime(vdir)
            except OSError:
                continue
            if age < claim_grace_sec:
                continue
        shutil.rmtree(vdir)
        removed.append(v)
    return removed


def read_manifest(root: str, version: int | None = None) -> dict:
    """The manifest of one published version (CURRENT when `version`
    is None) — row counts, scalars, lineage; a metadata read, no Spark
    job."""
    if version is None:
        version = current_version(root)
        if version is None:
            raise FileNotFoundError(f"{root!r} has no CURRENT pointer")
    with open(os.path.join(root, f"v{version:05d}", MANIFEST)) as f:
        return json.load(f)


def diff_versions(
    spark: SparkSession,
    root: str,
    v_old: int,
    v_new: int,
    table: str = "kg_triples",
) -> DataFrame:
    """What changed in one standing table between two published
    versions — the post-increment audit query ("what did feed N do to
    the KG"). Returns the table's columns plus a `change` column
    ('added' rows exist only in v_new, 'removed' only in v_old).

    Distributed two-sided anti-diff: each side is one exceptAll
    (hash-distinct shuffle on the table's own size — KG-sized, never
    corpus-sized), and both versions are read straight from their
    snapshot directories, so the audit never touches live state. The
    diff of a version against itself is empty; rows are multiset-
    diffed, so a duplicate introduced by a bad merge shows up even
    when the distinct row set is unchanged."""
    if table not in STANDING_TABLES:
        raise ValueError(f"unknown standing table {table!r}")

    def _read(v: int) -> DataFrame:
        vdir = os.path.join(root, f"v{v:05d}")
        dirs, _ = _table_entry(root, vdir, read_manifest(root, v), table)
        return spark.read.parquet(*dirs)

    old_df = _read(v_old)
    new_df = _read(v_new)
    # exceptAll resolves columns positionally — project BOTH sides to
    # one explicit column order so parquet column-order drift between
    # versions cannot misalign the diff (ADVICE r5)
    cols = old_df.columns
    return (
        new_df.select(*cols).exceptAll(old_df.select(*cols))
        .withColumn("change", F.lit("added"))
        .unionByName(
            old_df.select(*cols).exceptAll(new_df.select(*cols)).withColumn(
                "change", F.lit("removed")
            )
        )
    )


def snapshot_file_count(path: str) -> int:
    """Count parquet part files under a directory tree (the small-file
    metric compaction exists to bound; used by tests and benches)."""
    total = 0
    for _root, _dirs, files in os.walk(path):
        total += sum(
            1 for f in files if f.endswith(".parquet") and f.startswith("part-")
        )
    return total
