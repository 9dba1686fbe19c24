"""Kill/resume correctness of the checkpointed flagship pipeline.

North-rule requirement: a mid-run failure resumes from the partition
manifest, re-doing only unfinished partitions, and the final result is
identical to an uninterrupted run.
"""

from __future__ import annotations

import os
import time

import pytest

SF = "/root/testdata/sf0.001"


def _edges_dict(ds):
    df = ds.to_pandas()
    return {
        (r.subj, r.pred, r.obj): r.weight for r in df.itertuples(index=False)
    }


def test_kill_and_resume_matches_straight_run(ray_session, tmp_path):
    from autoner_ray.pipelines.checkpoint import run_resumable_triples
    from autoner_ray.pipelines.kg import triples_dataset
    from autoner_ray.state import manifest as mf

    out = str(tmp_path / "ckpt")
    # first run dies after 2 of 4 partitions
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable_triples(SF, out, num_parts=4, concurrency=2,
                              fail_after=2)
    assert len(mf.pending_partitions(out, 4)) == 2
    committed_before = {
        r["partition"]: os.path.getmtime(
            os.path.join(mf.partition_dir(out, r["partition"]), mf.SUCCESS)
        )
        for r in mf.read_manifest(out, 4)
    }
    assert len(committed_before) == 2

    # resume completes only the pending partitions
    edges = run_resumable_triples(SF, out, num_parts=4, concurrency=2)
    assert mf.pending_partitions(out, 4) == []
    for part, mtime in committed_before.items():
        marker = os.path.join(mf.partition_dir(out, part), mf.SUCCESS)
        assert os.path.getmtime(marker) == mtime, "completed partition redone"

    # result identical to the un-checkpointed pipeline
    straight = triples_dataset(SF, concurrency=2)
    assert _edges_dict(edges) == _edges_dict(straight)


def test_lineage_records(ray_session, tmp_path):
    from autoner_ray.pipelines.checkpoint import run_resumable_triples
    from autoner_ray.state import manifest as mf

    out = str(tmp_path / "ckpt")
    run_resumable_triples(SF, out, num_parts=2, concurrency=2)
    records = mf.read_manifest(out, 2)
    assert len(records) == 2
    for rec in records:
        assert rec["engine_version"]
        assert "documents.parquet" in rec["lineage"]["input"]
        assert "dict_match:pairs" in rec["lineage"]["stages"]
        assert rec["metrics"]["rows"] >= 0
        assert rec["metrics"]["wall_sec"] > 0


def test_tmp_sweep(ray_session, tmp_path):
    from autoner_ray.state import manifest as mf

    out = str(tmp_path / "ckpt")
    stale = os.path.join(out, "_tmp-00001-deadbeef")
    fresh = os.path.join(out, "_tmp-00002-cafebabe")
    os.makedirs(stale)
    os.makedirs(fresh)
    old = time.time() - 7200
    os.utime(stale, (old, old))
    mf.sweep_tmp(out)
    # stale orphan removed; a fresh tmp (possibly a live concurrent
    # driver's in-flight commit) is left alone
    assert os.listdir(out) == ["_tmp-00002-cafebabe"]
