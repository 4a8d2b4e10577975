"""Broadcast vs hash-join candidate-text verify: identical outputs.

The exact-verify stages (ngram Jaccard, substring span extension)
switch from one broadcast text dict to two distributed hash joins
above BROADCAST_MAX_CANDIDATE_IDS. Forcing the join branch
(broadcast_max_ids=0) must produce byte-identical results — the
strategy choice can never change outputs.
"""

import pandas as pd

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_ngram_jaccard_lsh_join_branch_equal(ray_session):
    from humid_ray.pipelines.dedup_text import ngram_jaccard_pairs

    bcast = _sorted(ngram_jaccard_pairs(SF).to_pandas())
    joined = _sorted(ngram_jaccard_pairs(SF, broadcast_max_ids=0).to_pandas())
    assert len(bcast) > 0  # the corpus has planted near-dups
    pd.testing.assert_frame_equal(bcast, joined)


def test_ngram_jaccard_exact_join_branch_equal(ray_session):
    from humid_ray.pipelines.dedup_text import ngram_jaccard_exact

    bcast = _sorted(ngram_jaccard_exact(SF).to_pandas())
    joined = _sorted(ngram_jaccard_exact(SF, broadcast_max_ids=0).to_pandas())
    assert len(bcast) > 0
    pd.testing.assert_frame_equal(bcast, joined)


def test_substring_dedup_join_branch_equal(ray_session):
    from humid_ray.pipelines.substring import substring_dedup_pairs

    def to_df(res):
        return res.to_pandas() if hasattr(res, "to_pandas") else res

    bcast = _sorted(to_df(substring_dedup_pairs(SF)))
    joined = _sorted(to_df(substring_dedup_pairs(SF, broadcast_max_ids=0)))
    assert len(bcast) > 0
    pd.testing.assert_frame_equal(bcast, joined)
