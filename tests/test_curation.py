"""Unit tests for stages/curation.py — scale-relevant properties the
oracle parity test can't see (block-layout independence, tie-breaks,
crafted decontamination cases)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from tilecloud_chain_ray.stages.curation import (
    benchmark_shingles,
    decontaminate,
    grouped_quantiles,
    hash_sample,
    ngram_jaccard_pairs,
    vocab_topk,
    word_ngrams,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(rows):
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def test_word_ngrams_short_and_long():
    assert word_ngrams("a b c d", 3) == {"a b c", "b c d"}
    assert word_ngrams("a b", 3) == {"a b"}
    assert word_ngrams("  ", 3) == {""}
    assert word_ngrams("x x x x", 3) == {"x x x"}  # distinct


def test_word_ngrams_matches_duckdb_on_exotic_whitespace():
    """RE2's \\s is ASCII-only and DuckDB's trim() strips spaces only —
    U+00A0 must stay inside tokens, leading tabs must produce the ''
    token, exactly as the oracle lambda computes."""
    import duckdb

    texts = [
        "foo bar baz qux quux",  # nbsp inside a token
        "\tfoo bar baz qux",  # leading tab -> leading '' token in SQL
        "a b c d e",  # unicode line separator inside a token
        "v\x0bw x y z",  # vertical tab: outside RE2's ASCII \\s too
    ]
    con = duckdb.connect()
    for t in texts:
        (grams,) = con.execute(
            r"""
            SELECT list_distinct(CASE
                WHEN len(regexp_split_to_array(trim(?), '\s+')) >= 3
                THEN list_transform(
                     generate_series(1, len(regexp_split_to_array(trim(?), '\s+')) - 2),
                     i -> regexp_split_to_array(trim(?), '\s+')[i] || ' '
                       || regexp_split_to_array(trim(?), '\s+')[i+1] || ' '
                       || regexp_split_to_array(trim(?), '\s+')[i+2])
                ELSE [array_to_string(regexp_split_to_array(trim(?), '\s+'), ' ')]
            END)
            """,
            [t] * 6,
        ).fetchone()
        assert word_ngrams(t, 3) == set(grams), t


def test_hash_sample_block_layout_independent():
    rows = [(i, "en" if i % 2 else "de", "t") for i in range(1000)]
    one_block = _docs(rows)
    many_blocks = _docs(rows).repartition(16)
    rates = {"en": 0.3, "de": 0.7}
    a = sorted(r["doc_id"] for r in hash_sample(one_block, rates).take_all())
    b = sorted(r["doc_id"] for r in hash_sample(many_blocks, rates).take_all())
    assert a == b and 0 < len(a) < 1000


def test_grouped_quantiles_matches_numpy_disc():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, size=2000)
    langs = np.where(rng.random(2000) < 0.5, "en", "de")
    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"lang": pa.array(langs.tolist()), "v": pa.array(vals, pa.int64())}
        )
    ).repartition(8)
    out = {
        r["lang"]: (r["p50"], r["p90"])
        for r in grouped_quantiles(ds, "lang", "v", qs=(0.5, 0.9), out_names=("p50", "p90")).take_all()
    }
    for lang in ("en", "de"):
        s = np.sort(vals[langs == lang])
        for q, got in zip((0.5, 0.9), out[lang]):
            idx = max(int(np.ceil(q * len(s))) - 1, 0)
            assert got == s[idx], (lang, q)


def test_vocab_topk_tiebreak_and_counts():
    rows = [(i, "en", "b a a c b") for i in range(10)]
    ds = _docs(rows).repartition(4)
    out = vocab_topk(ds, k=2).take_all()
    # counts: a=20, b=20, c=10 -> top2 = a,b (tie broken by token asc)
    assert [(r["token"], r["n"]) for r in out] == [("a", 20), ("b", 20)]


def test_decontaminate_crafted():
    rows = [
        (0, "en", "alpha beta gamma delta"),  # benchmark doc
        (10, "en", "zzz alpha beta gamma yyy"),  # shares 'alpha beta gamma'
        (11, "en", "beta gamma delta tail"),  # shares 'beta gamma delta'
        (12, "en", "no overlap here at all"),
        (13, "en", "alpha beta"),  # bigram only -> not a 3-gram hit
    ]
    ds = _docs(rows)
    bench = benchmark_shingles(ds, max_key=5, n=3)
    flagged = {r["doc_id"]: r["contaminated"] for r in decontaminate(ds, bench, n=3).take_all()}
    assert flagged[10] and flagged[11]
    assert not flagged[12] and not flagged[13]


def test_ngram_jaccard_pairs_values():
    rows = [
        (0, "en", "a b c d"),  # shingles {a b c, b c d}
        (1, "en", "b c d e"),  # shingles {b c d, c d e} -> jac 1/3
        (2, "en", "x y z"),
        (3, "en", "x y z"),  # identical -> 1.0
    ]
    tbl = ngram_jaccard_pairs(_docs(rows), [(0, 1), (2, 3)])
    df = tbl.to_pandas().set_index("a")
    assert df.loc[0, "jaccard"] == pytest.approx(1 / 3)
    assert df.loc[2, "jaccard"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_weighted_sample_priority():
    """Efraimidis-Spirakis priority sampling: the distributed local
    top-k + merge equals the global numpy computation, is layout
    independent, and includes dominant-weight keys always."""
    import numpy as np
    import pyarrow as pa
    import ray

    from tilecloud_chain_ray.functions.hashing import mix64
    from tilecloud_chain_ray.stages.curation import weighted_sample

    rng = np.random.default_rng(41)
    n = 20_000
    keys = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 100, n).astype(np.float64)
    w[7] = 1e9  # dominant weight -> priority ~1, always sampled

    # global reference
    u = (mix64(keys.astype(np.uint64)).astype(np.float64) + 1.0) / 2.0**64
    pri = u ** (1.0 / w)
    expect = set(keys[np.argsort(-pri, kind="stable")[:100]].tolist())

    tbl = pa.table({"doc_id": keys, "n_tokens": w})
    for parts in (3, 17):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out = weighted_sample(ds, k=100)
        got = set(out["doc_id"].to_pylist())
        assert got == expect, parts
        assert 7 in got
        p = out["priority"].to_numpy()
        assert (np.diff(p) <= 1e-18).all()  # sorted descending
