"""Skew-guard behaviour of the simhash banded candidate join.

A band piece shared by f documents contributes f² join rows; the
``max_band_freq`` cutoff (the simhash twin of ``ngram_jaccard_pairs``'
``max_shingle_freq``) must drop ultra-hot template families from candidate
generation while keeping cool near-dup pairs, and must plan the frequency
filter as a broadcast join.
"""

import pytest
from pyspark.sql import functions as F

from chronicles_spark.operators import dedup as DD

TEMPLATE = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua"
)
OTHER = (
    "zebra quartz jigsaw vexing flummox kwyjibo syzygy plinth gnarled "
    "obsidian whirligig xylophone"
)


@pytest.fixture()
def docs(spark):
    rows = [(i, TEMPLATE) for i in range(20)] + [(100, OTHER), (101, OTHER)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pairs(df, **kw):
    return {
        (r["id_a"], r["id_b"])
        for r in DD.simhash_near_dup_candidates(df, **kw).collect()
    }


def test_band_freq_guard_drops_hot_family_keeps_cool_pair(docs):
    capped = _pairs(docs, max_band_freq=10)
    assert (100, 101) in capped
    template_ids = set(range(20))
    assert not any(a in template_ids or b in template_ids for a, b in capped)


def test_band_freq_none_is_superset(docs):
    capped = _pairs(docs, max_band_freq=10)
    uncapped = _pairs(docs, max_band_freq=None)
    assert capped <= uncapped
    # the 20-doc template family alone contributes C(20,2) = 190 pairs
    assert len(uncapped) >= 190 + 1


def test_band_freq_filter_is_broadcast(docs):
    out = DD.simhash_near_dup_candidates(docs, max_band_freq=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
