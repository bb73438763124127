"""Learned BPE (stages/bpe.py): Sennrich reference merges on the
classic toy corpus, encode round-trip, count bounds, distributed ==
single-process, and empty/edge rows."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from tilecloud_chain_ray.stages.bpe import (
    _PRETOK_RE,
    BPETokenizer,
    bpe_encode_counts,
    bpe_encode_ids,
    train_bpe,
)


def test_sennrich_toy_merges():
    """The ACL-2016 worked example: corpus {low:5, lower:2, newest:6,
    widest:3} — under max-count / lexicographic-tie training the first
    merges build 'est' then 'lo'-family symbols."""
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    tok = train_bpe([" ".join(corpus)], num_merges=4)
    # pretokenizer keeps the leading space, so words are ' low' etc. —
    # pair counts still rank (e,s)=9 first, then (es,t)=9, then the
    # 'lo' family at 7
    assert tok.merges[0] == ("e", "s")
    assert tok.merges[1] == ("es", "t")
    assert ("l", "o") in tok.merges[2:4] or ("o", "w") in tok.merges[2:4]
    # merged symbols entered the vocab after all single characters
    assert tok.vocab["est"] > max(tok.vocab[c] for c in "lowernwidst ")


def test_encode_round_trip_and_bounds():
    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(200)]
    tok = train_bpe(texts, num_merges=64)
    for t in texts[:20]:
        for w in _PRETOK_RE.findall(t):
            syms = tok.encode_word(w)
            assert "".join(syms) == w  # lossless
            assert all(s in tok.vocab for s in syms)
    # frequent whole words end up as single merged symbols
    assert len(tok.encode_word(" alpha")) == 1


@pytest.mark.usefixtures("ray_session")
def test_counts_distributed_equals_reference():
    rng = np.random.default_rng(7)
    vocab = ["tok%d" % i for i in range(50)]
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(500)] + ["", "   "]
    tok = train_bpe(texts, num_merges=100)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ).repartition(4)
    got = (
        bpe_encode_counts(ds, tok)
        .to_pandas()
        .sort_values("doc_id")["n_bpe_learned"]
        .tolist()
    )
    want = [
        sum(len(tok.encode_word(w)) for w in _PRETOK_RE.findall(t)) for t in texts
    ]
    assert got == want
    # learned merges compress: fewer symbols than characters, at least
    # one per pretoken
    chars = [len(t.replace(" ", "")) for t in texts]
    pretoks = [len(_PRETOK_RE.findall(t)) for t in texts]
    assert all(p <= g <= max(c, 1) for g, c, p in zip(got, chars, pretoks))


@pytest.mark.usefixtures("ray_session")
def test_encode_ids_concat_decodes():
    texts = ["hello world hello", "world", ""]
    tok = train_bpe(texts * 20, num_merges=30)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    rows = {r["doc_id"]: r["token_ids"] for r in bpe_encode_ids(ds, tok).take_all()}
    inv = {i: s for s, i in tok.vocab.items()}
    for d, t in enumerate(texts):
        assert "".join(inv[i] for i in rows[d]) == "".join(_PRETOK_RE.findall(t))
    assert rows[2] == []


@pytest.mark.usefixtures("ray_session")
def test_distributed_training_equals_single_process():
    """train_bpe_distributed (no sample cap, per-round bounded-key
    groupby) learns EXACTLY the single-process Sennrich merges on the
    toy corpus and on a randomized corpus, independent of layout."""
    from tilecloud_chain_ray.stages.bpe import train_bpe_distributed

    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    ref = train_bpe([" ".join(corpus)], num_merges=6)
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array([" ".join(corpus)], pa.string())})
    )
    got = train_bpe_distributed(ds, num_merges=6)
    assert got.merges == ref.merges and got.vocab == ref.vocab

    rng = np.random.default_rng(13)
    vocab = ["alpha", "beta", "gamma", "delta", "epsi"]
    texts = [" ".join(rng.choice(vocab, 25)) for _ in range(160)] + ["", "   "]
    ref2 = train_bpe(texts, num_merges=24)  # sample == whole corpus here
    ds2 = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(6)
    got2 = train_bpe_distributed(ds2, num_merges=24)
    assert got2.merges == ref2.merges and got2.vocab == ref2.vocab
    # layout independence
    perm = np.random.default_rng(1).permutation(len(texts))
    ds3 = ray.data.from_arrow(
        pa.table({"text": pa.array([texts[i] for i in perm], pa.string())})
    ).repartition(3)
    got3 = train_bpe_distributed(ds3, num_merges=24)
    assert got3.merges == got2.merges
