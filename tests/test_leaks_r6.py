"""Round-6 retained-block regression pins.

A 477-entry single-JVM gate run died at sf0.1 with
UNABLE_TO_ACQUIRE_MEMORY in q_triangle_count's sort: entries that
persist()/localCheckpoint() and never release had accumulated enough
pinned storage blocks to starve the execution pool (the
connected_components leak class from round 5, found in four more
operators by a per-entry persistent-RDD probe). These tests pin the
fixed contract: an entry may leave AT MOST its final-result
checkpoint behind (reclaimed by ContextCleaner once the caller drops
the frame) — never a per-round staircase.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# entry -> max persistent RDDs it may ADD after a full materialization
# (1 = the final-result checkpoint backing the returned frame;
#  0 = fully self-cleaning)
BOUNDS = {
    "c_transitive_closure": 1,  # final closure checkpoint (loop rounds released)
    "q_graph_degree_profile": 0,  # local-relation edges, nothing pinned
    "q_trade_pagerank": 0,  # local-relation graph, nothing pinned
    "t_bpe_merge_rounds": 1,  # final corpus checkpoint (merge rounds released)
    "t_dup_clusters": 1,  # CC final labels checkpoint (rounds released, r5 fix)
}


def _persistent_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


@pytest.mark.parametrize("name", sorted(BOUNDS))
def test_entry_leaves_no_block_staircase(spark, name):
    from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

    all_queries()
    before = _persistent_count(spark)
    REGISTRY[name].fn(spark, SF).count()
    added = _persistent_count(spark) - before
    assert added <= BOUNDS[name], (
        f"{name} left {added} persistent RDD(s) behind (bound "
        f"{BOUNDS[name]}): a per-round checkpoint/persist is not being "
        "released — the q_triangle_count OOM class"
    )


def test_repeat_runs_do_not_accumulate(spark):
    """The killer at gate scale is ACCUMULATION: run the worst prior
    leaker three times — the retained count must not grow run-over-run
    (each run's final checkpoint may linger, but the loop staircase
    must not)."""
    from parking_violations_data_pipeline_spark.registry import REGISTRY, all_queries

    all_queries()
    fn = REGISTRY["c_transitive_closure"].fn
    counts = []
    for _ in range(3):
        fn(spark, SF).count()
        counts.append(_persistent_count(spark))
    # allow one lingering final checkpoint per run, nothing more
    assert counts[-1] - counts[0] <= 2, counts
