"""Property-based tests (hypothesis) for the pure spec functions the
distributed stages and the golden generator both rely on — these run with
no SparkSession, so hypothesis can afford hundreds of examples."""

from hypothesis import given, settings, strategies as st

from legal_knowledge_graph_spark.corpus import canonicalize_spellings
from legal_knowledge_graph_spark.functions.tokenize import (
    CONTAINMENT_SCORE, jaccard, pair_score, split_tokens, token_set,
)

texts = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           whitelist_characters="._- "),
    max_size=40,
)


@given(texts, texts)
@settings(max_examples=300, deadline=None)
def test_pair_score_symmetric_and_bounded(a, b):
    s = pair_score(a, b)
    assert 0.0 <= s <= 1.0
    assert s == pair_score(b, a)


@given(texts)
@settings(max_examples=300, deadline=None)
def test_self_similarity(a):
    # any text with at least one token is containment-similar to itself
    if token_set(a):
        assert pair_score(a, a) == CONTAINMENT_SCORE
    else:
        assert pair_score(a, a) == 0.0


@given(texts, texts)
@settings(max_examples=300, deadline=None)
def test_containment_dominates_jaccard(a, b):
    ta, tb = token_set(a), token_set(b)
    if ta and tb and (ta <= tb or tb <= ta):
        assert pair_score(a, b) == CONTAINMENT_SCORE
    else:
        assert pair_score(a, b) == jaccard(ta, tb)


@given(texts)
@settings(max_examples=300, deadline=None)
def test_tokenize_deterministic_and_lowercase(a):
    t1, t2 = split_tokens(a), split_tokens(a)
    assert t1 == t2
    assert all(tok == tok.lower() or tok[0].isdigit() for tok in t1)


@given(st.lists(st.sampled_from(
    ["John Smith", "J. Smith", "jsmith", "MIT", "MIT License", "numpy",
     "np", "parse_config", "parse config extra", "FastLoader",
     "AbstractLoader", "2024-06-01", "2024"]),
    min_size=1, max_size=10))
@settings(max_examples=150, deadline=None)
def test_canonicalize_spellings_order_free_and_idempotent(spellings):
    """The spec-level canonicalizer (the golden oracle for st3) must be
    order-free: any permutation/duplication of the spelling set maps every
    spelling to the same representative, and re-canonicalizing the
    representatives is a fixpoint for the identity-typed path."""
    fwd = canonicalize_spellings({"Author": set(spellings)})
    rev = canonicalize_spellings({"Author": set(reversed(spellings))})
    assert fwd == rev
    # every spelling maps somewhere, and representatives map to themselves
    for (etype, s), rep in fwd.items():
        assert etype == "Author"
        assert (etype, rep) in fwd or rep not in set(spellings)
        if (etype, rep) in fwd:
            assert fwd[(etype, rep)] == rep
