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
