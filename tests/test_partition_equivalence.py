"""Partitioning must not change results: the union of per-partition edge
outputs equals the single-pass pipeline's edges."""

import pandas as pd


def test_partitioned_union_equals_single_pass(ray_session, compiled_dicts, tmp_path):
    import ray.data as rd

    from kazu_ray.pipelines.kg import edges_pipeline, run_partitioned
    from kazu_ray.sources.interleave import interleaved_docs

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "kg_parts")
    run_partitioned(sf, out, compiled_dicts, num_partitions=3, ner_concurrency=1)

    parts = rd.read_parquet(f"{out}/edges").to_pandas()
    single = edges_pipeline(
        interleaved_docs(sf), compiled_dicts, concurrency=1
    ).to_pandas()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        # n_docs for cross-partition maps-to/co-occurs differ by partition
        # split; triple identity must match exactly, counts must sum
        g = (
            df.groupby(["subj", "pred", "obj"], as_index=False)
            .agg(n_docs=("n_docs", "sum"), confidence=("confidence", "max"))
            .sort_values(["subj", "pred", "obj"])
            .reset_index(drop=True)
        )
        return g

    a, b = canon(parts), canon(single)
    pd.testing.assert_frame_equal(a, b)
