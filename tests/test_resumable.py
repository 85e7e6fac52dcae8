"""Kill/resume semantics of the checkpointed KG run (north-rule criterion:
"resume from per-partition checkpoint with lineage + metrics; kill after
partition k, restart, assert identical final triple set")."""

from __future__ import annotations

import json
import os

import pytest


N_PAGES = 800
N_SHARDS = 8


@pytest.fixture(scope="module")
def lexicon_ref(ray_session, lexicon):
    from lexmapr_ray.pipelines.kg import broadcast_lexicon

    return broadcast_lexicon(lexicon)


def _final_triples(out_dir, ray_session) -> set:
    from lexmapr_ray.pipelines.resumable import finalize_graph

    df = finalize_graph(out_dir).to_pandas()
    return set(map(tuple, df[["subj", "pred", "obj"]].itertuples(index=False)))


def test_kill_resume_identical_triples(ray_session, lexicon_ref, tmp_path_factory):
    from lexmapr_ray.pipelines.resumable import run_resumable, shard_synth_pages
    from lexmapr_ray.state.lineage import completed_shards

    shards = shard_synth_pages(N_PAGES, N_SHARDS)

    # uninterrupted reference run
    ref_dir = str(tmp_path_factory.mktemp("ref"))
    stats = run_resumable(shards, ref_dir, lexicon_ref=lexicon_ref, concurrency=2)
    assert stats["processed"] == N_SHARDS
    expected = _final_triples(ref_dir, ray_session)
    assert expected

    # killed-then-resumed run
    kill_dir = str(tmp_path_factory.mktemp("kill"))
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(
            shards, kill_dir, lexicon_ref=lexicon_ref, concurrency=2, fail_after=3
        )
    assert len(completed_shards(kill_dir)) == 3

    stats2 = run_resumable(shards, kill_dir, lexicon_ref=lexicon_ref, concurrency=2)
    assert stats2["skipped"] == 3
    assert stats2["processed"] == N_SHARDS - 3
    assert _final_triples(kill_dir, ray_session) == expected


def test_lineage_records_metrics(ray_session, lexicon_ref, tmp_path):
    from lexmapr_ray.pipelines.resumable import run_resumable, shard_synth_pages
    from lexmapr_ray.state.lineage import completed_shards, record_path

    out = str(tmp_path)
    shards = shard_synth_pages(200, 2)
    run_resumable(shards, out, lexicon_ref=lexicon_ref, concurrency=2)

    recs = completed_shards(out)
    assert set(recs) == {0, 1}
    for sid, rec in recs.items():
        assert rec.status == "complete"
        assert rec.rows_in == 100
        assert rec.triples_out > 0
        assert rec.wall_s > 0
        assert rec.input_desc.startswith("synth_pages[")
        raw = json.load(open(record_path(out, sid)))
        assert raw["engine_config"]["batch_size"] == 512


def test_rerun_is_noop_and_finalize_idempotent(ray_session, lexicon_ref, tmp_path):
    from lexmapr_ray.pipelines.resumable import (
        finalize_graph,
        run_resumable,
        shard_synth_pages,
    )

    out = str(tmp_path)
    shards = shard_synth_pages(200, 2)
    run_resumable(shards, out, lexicon_ref=lexicon_ref, concurrency=2)
    stats = run_resumable(shards, out, lexicon_ref=lexicon_ref, concurrency=2)
    assert stats == {"processed": 0, "skipped": 2, "shards": 2}

    final_dir = os.path.join(out, "final")
    g1 = finalize_graph(out, final_dir).to_pandas()
    g2 = finalize_graph(out, final_dir).to_pandas()  # overwrite, same result
    assert g1.equals(g2)


def test_torn_sidecar_reprocessed(ray_session, lexicon_ref, tmp_path):
    """A truncated (crash-torn) sidecar must not mask an incomplete shard."""
    from lexmapr_ray.pipelines.resumable import run_resumable, shard_synth_pages
    from lexmapr_ray.state.lineage import completed_shards, record_path

    out = str(tmp_path)
    shards = shard_synth_pages(200, 2)
    run_resumable(shards, out, lexicon_ref=lexicon_ref, concurrency=2)

    with open(record_path(out, 1), "w") as f:
        f.write('{"shard_id": 1, "trunc')  # torn write
    assert set(completed_shards(out)) == {0}
    stats = run_resumable(shards, out, lexicon_ref=lexicon_ref, concurrency=2)
    assert stats["processed"] == 1 and stats["skipped"] == 1
    assert set(completed_shards(out)) == {0, 1}


def test_two_batch_cli_ingest_equals_full_graph(ray_session, lexicon,
                                                tmp_path):
    """VERDICT r4 #6: the kg-ingest CLI strings the incremental pieces
    together — two-batch ingest (near-dup gate vs persisted LSH index ->
    extract -> merge) must equal the one-shot full-corpus graph
    bit-for-bit, a committed batch must be idempotent-skipped, and a
    later batch near-duplicating an ingested page must be dropped."""
    import json

    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd

    from lexmapr_ray import cli
    from lexmapr_ray.pipelines.kg import run_kg_pipeline
    from lexmapr_ray.sources.pages import pages_from_documents

    sf = "/root/testdata/sf0.001"
    full_pages = pages_from_documents(sf).materialize()
    df = full_pages.to_pandas()
    doc_num = df["url"].str.extract(r"(\d+)").astype(int)[0]
    batches = {0: df[doc_num % 2 == 0], 1: df[doc_num % 2 == 1]}

    graph = tmp_path / "graph"
    index = tmp_path / "index"
    corpus = tmp_path / "corpus"
    for parity, bdf in batches.items():
        bpath = tmp_path / f"batch{parity}.parquet"
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(
            bdf[["url", "text", "lang"]], preserve_index=False), str(bpath))
        # threshold 101%: the gate machinery runs (bands, candidates,
        # verify) but can never fire — the synthetic corpus contains REAL
        # cross-parity near-dups (hot boilerplate pages), and the equality
        # contract is "ingest == full run" for pages the gate keeps
        rc = cli.main(["kg-ingest", "--batch", str(bpath),
                       "--graph", str(graph), "--index", str(index),
                       "--corpus", str(corpus), "--threshold", "101",
                       "--batch-id", f"p{parity}"])
        assert rc == 0

    # idempotency: re-running a committed batch is a no-op skip
    rc = cli.main(["kg-ingest", "--batch", str(tmp_path / "batch0.parquet"),
                   "--graph", str(graph), "--index", str(index),
                   "--corpus", str(corpus), "--batch-id", "p0"])
    assert rc == 0

    cur = (graph / "_CURRENT").read_text().strip()
    got = rd.read_parquet(str(graph / cur)).to_pandas()
    exp = run_kg_pipeline(full_pages,
                          lexicon_ref=ray.put(lexicon)).to_pandas()

    def norm(d):
        d = d.astype(str)
        return d.sort_values(list(d.columns), kind="mergesort") \
            .reset_index(drop=True)

    pd.testing.assert_frame_equal(norm(got), norm(exp))
    m1 = json.loads((graph / "ingest_p1.json").read_text())
    assert m1["near_dup_dropped"] == 0
    n_after_two = m1["graph_triples"]

    # near-dup batch: one page whose text EQUALS an ingested page's text
    # under a fresh url -> the index gate must drop it, graph unchanged
    dup = batches[0].iloc[[0]].copy()
    dup["url"] = "doc://999999"
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(
        dup[["url", "text", "lang"]], preserve_index=False),
        str(tmp_path / "batchdup.parquet"))
    rc = cli.main(["kg-ingest", "--batch", str(tmp_path / "batchdup.parquet"),
                   "--graph", str(graph), "--index", str(index),
                   "--corpus", str(corpus), "--batch-id", "dup"])
    assert rc == 0
    mdup = json.loads((graph / "ingest_dup.json").read_text())
    assert mdup["near_dup_dropped"] == 1
    assert mdup["pages_accepted"] == 0
    assert mdup["graph_triples"] == n_after_two


def _tiny_pages_ds(rows):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    }))


def test_empty_graph_batch_not_dangling(ray_session, lexicon_ref, tmp_path):
    """A batch yielding ZERO triples (no lexicon matches) must publish a
    readable empty graph version, not a dangling _CURRENT pointer that
    bricks every later ingest (review r5, reproduced pre-fix:
    write_parquet of a 0-row dataset writes no files, so the pointer
    named a parquet-less dir and _current_graph_files raised)."""
    import ray.data as rd

    from lexmapr_ray.pipelines.ingest import ingest_batch

    dirs = dict(graph_dir=str(tmp_path / "g"), index_dir=str(tmp_path / "i"),
                corpus_dir=str(tmp_path / "c"))
    m0 = ingest_batch(_tiny_pages_ds([("doc://e0", "zzz qqq xyzzy plugh")]),
                      batch_id="b0", lexicon_ref=lexicon_ref, **dirs)
    assert m0["graph_triples"] == 0
    cur = (tmp_path / "g" / "_CURRENT").read_text().strip()
    empty = rd.read_parquet(str(tmp_path / "g" / cur))
    assert empty.count() == 0
    assert "subj" in empty.schema().names

    # the follow-up batch must ingest cleanly on top of the empty graph
    m1 = ingest_batch(_tiny_pages_ds([("doc://e1", "chicken breast")]),
                      batch_id="b1", lexicon_ref=lexicon_ref, **dirs)
    assert not m1["skipped"]
    assert m1["graph_triples"] > 0


def test_half_committed_batch_redone(ray_session, lexicon_ref, tmp_path):
    """A crash between the corpus and index _COMMITTED marker writes must
    NOT be treated as a completed batch: keying the idempotency skip on
    the corpus marker alone would silently lose the batch's LSH index
    rows, leaving the near-dup gate blind to its pages forever (review
    r5).  The re-run redoes the batch (graph merge is set-idempotent) and
    restores the index; a later near-duplicate is then caught."""
    import glob
    import os

    from lexmapr_ray.pipelines.ingest import ingest_batch

    dirs = dict(graph_dir=str(tmp_path / "g"), index_dir=str(tmp_path / "i"),
                corpus_dir=str(tmp_path / "c"))
    text = "chicken breast with apple and celery sticks"
    m0 = ingest_batch(_tiny_pages_ds([("doc://h0", text)]),
                      batch_id="b0", lexicon_ref=lexicon_ref, **dirs)
    n_triples = m0["graph_triples"]
    assert n_triples > 0

    # simulate the crash window: index marker never landed
    os.remove(str(tmp_path / "i" / "batch_b0" / "_COMMITTED"))

    m0b = ingest_batch(_tiny_pages_ds([("doc://h0", text)]),
                       batch_id="b0", lexicon_ref=lexicon_ref, **dirs)
    assert not m0b["skipped"]  # split-brain is a redo, not a skip
    assert m0b["graph_triples"] == n_triples  # set-idempotent merge
    assert os.path.exists(str(tmp_path / "i" / "batch_b0" / "_COMMITTED"))
    assert glob.glob(str(tmp_path / "i" / "batch_b0" / "*.parquet"))

    # the restored index must catch a near-duplicate under a fresh url
    m1 = ingest_batch(_tiny_pages_ds([("doc://h999", text)]),
                      batch_id="b1", lexicon_ref=lexicon_ref, **dirs)
    assert m1["near_dup_dropped"] == 1
    assert m1["pages_accepted"] == 0

    # and a fully-committed batch still idempotent-skips
    m0c = ingest_batch(_tiny_pages_ds([("doc://h0", text)]),
                       batch_id="b0", lexicon_ref=lexicon_ref, **dirs)
    assert m0c["skipped"]
