"""Invariant tests for batch 88 (casefold ladder, gross-to-net, vocab)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_dedup_ladder_monotone(spark):
    r = ent.queries()["llm_dedup_casefold"](spark, SF_SMALL).collect()[0]
    # coarser normalization can only find MORE duplicates
    assert 0 <= r.dups_exact <= r.dups_casefold <= r.dups_alnum
    assert r.gained_by_casefold == r.dups_casefold - r.dups_exact
    assert r.gained_by_alnum == r.dups_alnum - r.dups_casefold
    assert r.n_docs > 0


def test_gross_to_net_identities(spark):
    rows = ent.queries()["sales_gross_to_net"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs((r.gross - r.discount_given) - r.net_of_discount) < 1.0
        assert abs((r.net_of_discount + r.tax_collected) - r.invoiced) < 1.0
        assert 0.0 <= r.effective_discount_rate < 0.2


def test_exclusive_vocab_bounded(spark):
    rows = ent.queries()["llm_source_exclusive_vocab"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.exclusive_tokens <= r.vocab_size
        assert 0.0 <= r.exclusive_share <= 1.0
