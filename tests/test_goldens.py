"""The committed golden fingerprints (GOLDEN_FP) must match what the
implementations actually produce at sf0.01 — the same check the
correctness gate's *_golden queries run, enforced locally so a semantic
drift in tree build / FFD / fennel fails the suite before the gate.

Determinism these rely on (each property-tested elsewhere): fixed
seeds/tie-breaks, and tree build invariant to the number of partials.
"""

import pytest

import __spark_entry__ as entrymod

SF01 = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(entrymod.GOLDEN_FP))
def test_golden_fingerprint_matches(spark, name):
    base = {
        "elim_tree": entrymod.q_elim_tree,
        "tree_facts": entrymod.q_tree_facts,
        "fennel_assign": entrymod.q_fennel_assign,
        "sheep_assign": entrymod.q_sheep_assign,
        "sheep_partition_metrics": entrymod.q_sheep_metrics,
        "tree_width_facts": entrymod.q_tree_width_facts,
    }
    got = entrymod.fingerprint_df(spark, base[name](spark, SF01)).collect()[0]["fp"]
    assert got == entrymod.GOLDEN_FP[name], (
        f"{name}: sf0.01 fingerprint changed — if the semantic change is "
        "intentional, re-run scripts/golden_fingerprints.py and commit "
        "the new constants"
    )
