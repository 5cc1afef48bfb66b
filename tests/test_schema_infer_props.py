"""Property-based tests for the union-schema inference lattice.

The type-merge in sync.schema_infer must be a join-semilattice
(commutative + associative + idempotent) for A7's contract to hold:
the inferred schema may not depend on the order documents were
sampled in (reference docs/design.md:424-431 — a union over samples,
not a fold that privileges the first document). These properties are
what make `infer_union_schema(shuffled(docs)) == infer_union_schema(docs)`
true for EVERY corpus, which example-based tests can't establish.

Pure Python — no SparkSession needed (to_spark_type only builds
pyspark.sql.types objects).
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from mongodb_iceberg_sync_spark.sync.schema_infer import (
    _merge,
    _type_of,
    infer_union_schema,
    schema_to_rows,
    to_spark_type,
)

# JSON values of bounded depth: scalars at the leaves, dicts/lists above.
_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=8),
)
_json_values = st.recursive(
    _scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=4), children, max_size=4),
    ),
    max_leaves=12,
)
_json_docs = st.dictionaries(st.sampled_from("abcdef"), _json_values, max_size=5)
_types = _json_values.map(_type_of)


@settings(max_examples=200, deadline=None)
@given(a=_types, b=_types)
def test_merge_commutative(a, b):
    assert _merge(a, b) == _merge(b, a)


@settings(max_examples=200, deadline=None)
@given(a=_types, b=_types, c=_types)
def test_merge_associative(a, b, c):
    assert _merge(_merge(a, b), c) == _merge(a, _merge(b, c))


@settings(max_examples=100, deadline=None)
@given(a=_types)
def test_merge_idempotent(a):
    assert _merge(a, a) == a


@settings(max_examples=100, deadline=None)
@given(a=_types)
def test_null_is_identity(a):
    assert _merge("null", a) == a
    assert _merge(a, "null") == a


@settings(max_examples=100, deadline=None)
@given(a=_types)
def test_string_absorbs(a):
    # string-as-JSON is the lattice top: merging anything non-null into
    # it stays string (docs/design.md:429-430 promotion is terminal)
    if a == "null":
        return
    assert _merge("string", a) == "string"


@settings(max_examples=100, deadline=None)
@given(docs=st.lists(_json_docs, max_size=8), seed=st.randoms())
def test_inference_order_invariant(docs, seed):
    texts = [json.dumps(d) for d in docs]
    shuffled = list(texts)
    seed.shuffle(shuffled)
    assert infer_union_schema(shuffled) == infer_union_schema(texts)


@settings(max_examples=100, deadline=None)
@given(docs=st.lists(_json_docs, max_size=8))
def test_inferred_schema_always_materializes(docs):
    t = infer_union_schema([json.dumps(d) for d in docs])
    spark_t = to_spark_type(t)  # must never raise
    assert spark_t.typeName() == "struct"
    rows = schema_to_rows(t)
    assert rows == sorted(rows)  # deterministic flattening


@settings(max_examples=100, deadline=None)
@given(docs=st.lists(_json_docs, min_size=1, max_size=6), extra=_json_docs)
def test_inference_monotone(docs, extra):
    """Adding a document never un-learns a field: every path in the
    schema over `docs` is still present over `docs + [extra]`."""
    texts = [json.dumps(d) for d in docs]
    before = {p for p, _, _ in schema_to_rows(infer_union_schema(texts))}
    after = {
        p
        for p, _, _ in schema_to_rows(
            infer_union_schema(texts + [json.dumps(extra)])
        )
    }
    # a path can flatten away only by promotion to string (its children
    # collapse into the JSON text) — so compare on top-level fields,
    # which promotion never removes
    top_before = {p.split(".")[0].split("[")[0] for p in before}
    top_after = {p.split(".")[0].split("[")[0] for p in after}
    assert top_before <= top_after
