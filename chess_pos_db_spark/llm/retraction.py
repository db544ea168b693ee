"""Cross-structure retraction: ONE feed of doc_ids to forget, propagated
through every derived structure a curation pipeline maintains — the
end-to-end right-to-be-forgotten job (DMCA takedown, contamination
discovery, GDPR erasure) composed from the per-structure deletes:

    corpus snapshot store   plans/layout.delete_rows      (copy-on-write)
    postings index          llm/search.delete_from_index  (tombstones)
    LSH near-dup index      llm/dedup_index.delete_from_lsh_index
    aggregate views         plans/mv.advance_view (materialized views
                            pinned to a store version catch up through
                            the store's own CDC — pass their paths via
                            ``view_paths``; ad-hoc DataFrame views use
                            operators/ivm.maintain_agg_view directly)

There is deliberately NO cross-structure transaction: each structure has
its own single commit point (matching its append side), and the
orchestrator is IDEMPOTENT instead — before touching a structure it
restricts the feed to the ids that structure still holds LIVE, so a
re-run after a crash mid-propagation finishes the remaining structures
and no-ops the completed ones (the per-structure deletes themselves fail
loudly on absent ids precisely so that only THIS orchestrator, which
checks liveness first, may skip them). That is the standard shape for
multi-store compliance jobs: retries converge, every structure ends at
"these ids are gone", and an auditor reads per-structure counts.

Scale: the feed is a retraction batch (requests/day — thousands, not
corpus-sized); each per-structure delete is affected-data-sized by its
own contract. The feed is collected driver-side ONLY to build the
store's pushed-down IN-predicate (bounded by the batch, never the
corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def retract_documents(
    spark: SparkSession,
    doc_ids: DataFrame,
    store_path: str | None = None,
    postings_prefix: str | None = None,
    lsh_prefix: str | None = None,
    view_paths: list[str] | None = None,
    ivf_layout: tuple | None = None,
) -> dict:
    """Propagate a retraction feed through every structure given.

    Returns per-structure counts: ``{"requested": n, "store": n1,
    "postings": n2, "lsh": n3, "ivf": n4, "views": {path:
    to_version}}`` where each count is how many of the requested ids
    that structure still held (and therefore deleted) — on a clean
    first run they all equal ``requested``; on a recovery re-run the
    already-converged structures report 0.

    ``ivf_layout`` is ``(layout_dir, centroids, cnorms)`` — an IVF
    vector layout (llm/similarity.write_ivf_layout) whose ``vec_id``
    IS the document id (the curation pipeline's convention: a document
    and its embedding share one id; a pipeline with a separate id
    space renames before calling). The batch's INDEXED embeddings are
    fetched from the layout itself — a vec_id-pushed scan whose output
    is batch-sized (row-group stats prune most files; the find is the
    same O(corpus footers) bound as the store leg's pushed IN-scan) —
    then `delete_from_ivf_layout` rewrites only the affected cells
    with the frozen quantizer. Restricting to ids actually present
    keeps this leg idempotent like the others (the underlying delete
    fails loudly on absent ids by design).

    ``view_paths`` are materialized aggregate views (plans/mv) pinned
    to ``store_path``'s version ledger: after the store delete commits
    a new version, each view catches up through the store's OWN CDC
    (plans/mv.advance_view), so the one feed also leaves every
    materialized aggregate. Requires ``store_path``. The version pin
    makes the view leg idempotent independently of the feed: a crash
    between the store delete and a view advance is repaired by any
    re-run (even with an empty feed), and views that already reflect
    the latest store version no-op.

    Vacuum/compaction is NOT run here: the snapshot store keeps
    pre-delete time travel until ``expire_snapshots`` and the postings
    index keeps masked rows until ``compact_index`` — a compliance
    pipeline runs those on its own cadence to make the forgetting
    physical (both are pinned elsewhere).
    """
    from ..plans import layout, mv
    from . import dedup_index as DI
    from . import search as S

    if view_paths and store_path is None:
        raise ValueError(
            "retract_documents: view_paths require store_path — views "
            "advance through the store's version ledger"
        )

    ids = doc_ids.select("doc_id").distinct().localCheckpoint(eager=True)
    requested = ids.count()
    out = {"requested": requested}

    if store_path is not None:
        live_store = layout.read_snapshot(spark, store_path).select("doc_id")
        todo = ids.join(live_store, "doc_id", "left_semi")
        id_list = [r["doc_id"] for r in todo.collect()]
        if id_list:
            res = layout.delete_rows(
                spark,
                store_path,
                F.col("doc_id").isin(id_list),
            )
            out["store"] = res["rows_deleted"]
        else:
            out["store"] = 0

    if postings_prefix is not None:
        live = S._existing_doc_ids(spark, postings_prefix)
        tombs = S._tombstone_ids(
            spark, postings_prefix, S._read_meta(spark, postings_prefix)
        )
        if tombs is not None:
            live = live.join(tombs, "doc_id", "left_anti")
        todo = ids.join(live, "doc_id", "left_semi")
        n = todo.count()
        if n:
            S.delete_from_index(spark, todo, postings_prefix)
        out["postings"] = n

    if lsh_prefix is not None:
        live = DI._existing_doc_ids(spark, lsh_prefix)
        todo = ids.join(live, "doc_id", "left_semi")
        n = todo.count()
        if n:
            DI.delete_from_lsh_index(spark, todo, lsh_prefix)
        out["lsh"] = n

    if ivf_layout is not None:
        import os

        from . import similarity as SIM

        layout_dir, centroids, cnorms = ivf_layout
        # a layout whose every cell was already deleted holds no
        # parquet (schema inference would fail) — that is "nothing
        # live", not an error. Only an EXISTING-but-empty local dir
        # short-circuits; a typo'd path still fails the read loudly.
        if os.path.isdir(layout_dir) and not any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(layout_dir)
            for f in fs
        ):
            out["ivf"] = 0
            layout_dir = None
    if ivf_layout is not None and layout_dir is not None:
        # the batch's indexed embeddings, fetched from the layout
        # (frozen-quantizer routing needs the vectors AS INDEXED —
        # caller-supplied embeddings could be stale and route to the
        # wrong cell). The id list is collected driver-side (bounded by
        # the retraction batch, like the store leg's) and filtered with
        # a pushed IN-predicate: Spark does NOT push semi-join keys
        # into parquet row-group filters, so the previous left_semi
        # form read every row group — isin() reaches the scan and
        # row-group stats prune the files that hold no retracted id.
        # localCheckpoint: the delete overwrites the very files this
        # plan reads.
        id_list = [r["doc_id"] for r in ids.collect()]
        todo = (
            spark.read.parquet(layout_dir)
            .select("vec_id", "embedding")
            .filter(F.col("vec_id").isin(id_list))
            .localCheckpoint(eager=True)
        )
        n = todo.count()
        if n:
            SIM.delete_from_ivf_layout(
                spark, todo, layout_dir, centroids, cnorms
            )
        out["ivf"] = n

    if view_paths:
        # AFTER the store leg: the views consume the store's CDC, so
        # the delete must be committed first. Runs unconditionally
        # (not gated on this feed's liveness) — that is what repairs a
        # prior run that crashed between the store delete and a view
        # advance, and what folds in any other store writes the views
        # have not yet seen.
        out["views"] = {
            vp: mv.advance_view(spark, store_path, vp)["to"]
            for vp in view_paths
        }

    return out
