"""Physical-plan pins for the widen12 batch (BPE pair counts,
k-anonymity, bigram LM score).
"""

from __future__ import annotations

from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

from .conftest import SF_MED

all_queries()


def _final_plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_MED)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.split("== Initial Plan ==")[0]


def test_bpe_pairs_mapside_generate_topk(spark):
    # pair generation is a Generate (no shuffle before the count);
    # top-20 is TakeOrderedAndProject, never a global sort
    p = _final_plan(spark, "t_bpe_pair_counts")
    assert "Generate explode" in p
    assert "TakeOrderedAndProject" in p
    assert "Join" not in p


def test_k_anonymity_two_level_agg_no_join(spark):
    p = _final_plan(spark, "t_k_anonymity")
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2


def test_bigram_logprob_broadcast_model(spark):
    # the bigram/context model tables come back by broadcast (bounded
    # by vocab², not corpus); no sort-merge join anywhere
    p = _final_plan(spark, "j_bigram_logprob")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
