"""SURVEY §2.9 stage registry: named (pa.Table) -> pa.Table stages,
config-list pipeline builder, user-stage extension slot."""

import pyarrow as pa
import pytest
import ray.data as rd

from autoner_ray.registry import (
    build_pipeline,
    get_stage,
    list_stages,
    register_stage,
)


def _docs_ds():
    return rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )


def test_core_stages_registered():
    names = set(list_stages())
    assert {"derive_pages", "extract_text", "tokenize_pages",
            "quality_features", "lang_id", "simhash"} <= names
    assert get_stage("simhash").kind == "map"


def test_unknown_stage_lists_registered():
    with pytest.raises(KeyError, match="unknown stage"):
        get_stage("no_such_stage")


def test_config_pipeline_matches_direct_composition(ray_session):
    """The config-built chain produces exactly what calling the stage
    functions directly produces."""
    from autoner_ray.stages.analysis import quality_batch

    got = (
        build_pipeline(_docs_ds(), ["quality_features"])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        _docs_ds().map_batches(quality_batch, batch_format="pyarrow")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.equals(want)


def test_user_stage_slots_in_with_options(ray_session):
    """A user-registered stage chains after a core stage; config entry
    options bind as kwargs."""

    @register_stage("r5_test_word_flag", kind="map",
                    description="flags docs with >= min_words words")
    def word_flag(batch: pa.Table, min_words: int = 10) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "long_doc": pc.greater_equal(batch["n_words"], min_words),
            }
        )

    out = build_pipeline(
        _docs_ds(),
        ["quality_features",
         {"stage": "r5_test_word_flag", "min_words": 25}],
    ).to_pandas()
    assert set(out.columns) == {"doc_id", "long_doc"}
    assert out["long_doc"].dtype == bool
    assert 0 < out["long_doc"].sum() < len(out)  # both classes present


def test_duplicate_registration_rejected():
    with pytest.raises(ValueError, match="already registered"):

        @register_stage("quality_features")
        def shadow(batch):  # pragma: no cover
            return batch
