"""Differential pin for q_text_bpe_encode: the Spark-side iterative
BPE trainer + encoder must agree exactly with an independent
pure-Python BPE implementation run on the same word-frequency table
(same merge order, same segmentations). This is the no-oracle check —
the 8-iteration trainer is not SQL-expressible."""

from __future__ import annotations

import duckdb

from mongodb_iceberg_sync_spark.registry import all_specs

SPECS = all_specs()


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference BPE: greedy most-frequent adjacent pair, ties broken
    by (a, b) lexicographically; left-to-right non-overlapping merge
    application."""
    vocab = {w: list(w) for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), _n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        ab = a + b
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = ab
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    from mongodb_iceberg_sync_spark.operators.text import _BPE_MERGES

    con = duckdb.connect()
    wf = dict(
        con.execute(
            f"""
            SELECT u.w, CAST(count(*) AS BIGINT)
            FROM read_parquet('{sf_dir}/documents.parquet'),
                 unnest(string_split(text, ' ')) AS u(w)
            WHERE u.w <> '' GROUP BY u.w
            """
        ).fetchall()
    )
    _merges, ref_vocab = _ref_bpe(wf, _BPE_MERGES)

    rows = SPECS["q_text_bpe_encode"].func(spark, sf_dir).collect()
    assert rows, "non-empty corpus must yield encodings"
    for r in rows:
        expect = ref_vocab[r.w]
        assert r.segmentation.split(" ") == expect, (r.w, r.segmentation, expect)
        assert r.n_pieces == len(expect)
        assert r.freq == wf[r.w]


def test_bpe_encode_deterministic(spark, sf_dir):
    a = [tuple(r) for r in SPECS["q_text_bpe_encode"].func(spark, sf_dir).collect()]
    b = [tuple(r) for r in SPECS["q_text_bpe_encode"].func(spark, sf_dir).collect()]
    assert a == b
