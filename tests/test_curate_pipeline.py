"""End-to-end curate_corpus over the sf0.001 documents table: every
stage's effect observable, output layout partitioned by lang, shard
packing consistent with a sequential reference."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray

from tilecloud_chain_ray.pipelines.curate import curate_corpus
from tilecloud_chain_ray.stages.curation import benchmark_shingles

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.usefixtures("ray_session")


def test_curate_corpus_full_chain(tmp_path):
    out = str(tmp_path / "corpus")
    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    bench = benchmark_shingles(docs, max_key=5)
    result = curate_corpus(
        docs,
        out_dir=out,
        quality_min=0.3,
        rep_max=0.5,
        bench_shingles=bench,
        sample_rates=0.9,
        shard_budget=1000,
        shard_bucket_size=64,
    )
    surv = result.survivors.to_pandas()
    n_input = pq.read_metadata(os.path.join(SF_DIR, "documents.parquet")).num_rows
    assert 0 < len(surv) < n_input
    # dedup: texts unique among survivors
    texts = ray.data.read_parquet(out).to_pandas()
    assert texts["text"].nunique() == len(texts)
    # partitioned layout: one directory per lang value
    langs = sorted(d.split("=")[1] for d in os.listdir(out) if d.startswith("lang="))
    assert langs == sorted(surv["lang"].unique())
    # shards: exclusive cumsum within (lang, doc_id order) // budget
    sh = result.shards.to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
    for lang, sub in sh.groupby("lang"):
        w = sub["n_tokens"].to_numpy(dtype=np.int64)
        excl = np.concatenate(([0], np.cumsum(w)[:-1]))
        assert (sub["shard"].to_numpy() == excl // 1000).all()
    # every survivor got a shard
    assert sorted(sh["doc_id"]) == sorted(surv["doc_id"])


def test_curate_corpus_no_write_no_shards():
    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    result = curate_corpus(docs, quality_min=0.0)
    assert result.shards is None and result.out_dir is None
    surv = result.survivors.to_pandas()
    assert surv["text"].nunique() == len(surv)  # dedup still applies


def test_curate_corpus_near_dedup():
    """Opt-in near-dedup: strictly fewer (or equal) survivors than the
    exact-only chain, equal to the manual pairs->components->min-key
    computation, with one survivor per near-dup cluster."""
    from tilecloud_chain_ray.stages.components import connected_components
    from tilecloud_chain_ray.stages.dedup import minhash_dedup_pairs

    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    exact = curate_corpus(docs, quality_min=0.0)
    near = curate_corpus(docs, quality_min=0.0, near_dedup_threshold=0.8)
    exact_df = exact.survivors.to_pandas()
    near_df = near.survivors.to_pandas()
    assert len(near_df) <= len(exact_df)

    # manual expectation from the exact survivors
    surv_ds = ray.data.from_pandas(exact_df)
    pairs = minhash_dedup_pairs(surv_ds, threshold=0.8)
    comp = connected_components(pairs).to_pandas()
    dropped = set(comp.loc[comp["key"] != comp["component"], "key"])
    assert set(near_df["doc_id"]) == set(exact_df["doc_id"]) - dropped
    assert len(dropped) > 0  # the fixture contains near-dups


def test_curate_corpus_substring_cut():
    """Opt-in ExactSubstr pass: curate(substring_k=8) equals running
    the span cut manually first, then the plain chain — boilerplate
    runs vanish from survivor texts before analysis and dedup."""
    from tilecloud_chain_ray.stages.substring_dedup import (
        cut_duplicate_spans,
        dedup_substring_spans,
    )

    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    got = curate_corpus(
        docs, quality_min=0.0, substring_k=8, substring_winnow=None
    ).survivors.to_pandas()

    pre = docs.materialize()
    spans = dedup_substring_spans(pre, k=8)
    cut_docs = cut_duplicate_spans(pre, spans)
    want = curate_corpus(cut_docs, quality_min=0.0).survivors.to_pandas()

    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    # the fixture really contains cross-doc duplicated runs
    raw = {r["doc_id"]: r["text"] for r in pre.take_all()}
    assert any(raw[d] != t for d, t in zip(got["doc_id"], got["text"]))


def test_curate_corpus_all_optins_compose(tmp_path):
    """substring cut + LM ceiling + near-dedup in ONE run: executes
    end-to-end with write + shards, survivors are a subset of the
    substring-only run, schema and partition layout intact."""
    out = str(tmp_path / "corpus")
    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    full = curate_corpus(
        docs,
        out_dir=out,
        quality_min=0.3,
        substring_k=8,
        substring_winnow=None,
        lm_max_ppl=1e9,  # keep-all ceiling: exercises the stage, not the cut
        near_dedup_threshold=0.8,
        shard_budget=1000,
        shard_bucket_size=64,
    )
    full_df = full.survivors.to_pandas()
    base_df = curate_corpus(
        docs, quality_min=0.3, substring_k=8, substring_winnow=None
    ).survivors.to_pandas()
    assert set(full_df["doc_id"]) <= set(base_df["doc_id"])
    assert 0 < len(full_df) <= len(base_df)
    assert sorted(full_df.columns) == sorted(base_df.columns)
    langs = sorted(d.split("=")[1] for d in os.listdir(out) if d.startswith("lang="))
    assert langs == sorted(full_df["lang"].unique())
    sh = full.shards.to_pandas()
    assert sorted(sh["doc_id"]) == sorted(full_df["doc_id"])


def test_curate_corpus_bpe_weighted_shards(tmp_path):
    """Opt-in learned-BPE pack weights: shard assignment follows the
    exclusive cumsum of n_bpe_learned (recomputed manually with the
    same deterministic tokenizer); the written corpus schema is
    unchanged."""
    from tilecloud_chain_ray.stages.bpe import bpe_encode_counts, train_bpe

    out = str(tmp_path / "corpus")
    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    kw = dict(quality_min=0.3, shard_budget=500, shard_bucket_size=64)
    base = curate_corpus(docs, out_dir=out, **kw)
    got = curate_corpus(docs, bpe_merges=64, **kw)
    # corpus schema identical with or without the opt-in
    assert sorted(got.survivors.to_pandas().columns) == sorted(
        base.survivors.to_pandas().columns
    )
    sh = got.shards.to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
    # recompute weights with the same deterministic tokenizer
    surv = got.survivors.materialize()
    tok = train_bpe(surv, num_merges=64)
    w = (
        bpe_encode_counts(surv, tok)
        .to_pandas()[["doc_id", "lang", "n_bpe_learned"]]
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    assert sh["doc_id"].tolist() == w["doc_id"].tolist()
    for lang, sub in sh.groupby("lang"):
        weights = w.loc[w["lang"] == lang, "n_bpe_learned"].to_numpy(np.int64)
        excl = np.concatenate(([0], np.cumsum(weights)[:-1]))
        assert (sub["shard"].to_numpy() == excl // 500).all()


def test_curate_corpus_bpe_distributed_option(tmp_path):
    """bpe_distributed=True weights the packing by the EXACT
    corpus-trained merge table (train_bpe_distributed) — shard weights
    recomputed with the same tokenizer match."""
    from tilecloud_chain_ray.stages.bpe import bpe_encode_counts, train_bpe_distributed

    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    kw = dict(quality_min=0.3, shard_budget=500, shard_bucket_size=64)
    got = curate_corpus(docs, bpe_merges=24, bpe_distributed=True, **kw)
    sh = got.shards.to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
    surv = got.survivors.materialize()
    tok = train_bpe_distributed(surv, num_merges=24)
    w = (
        bpe_encode_counts(surv, tok)
        .to_pandas()[["doc_id", "lang", "n_bpe_learned"]]
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    assert sh["doc_id"].tolist() == w["doc_id"].tolist()
    for lang, sub in sh.groupby("lang"):
        weights = w.loc[w["lang"] == lang, "n_bpe_learned"].to_numpy(np.int64)
        excl = np.concatenate(([0], np.cumsum(weights)[:-1]))
        assert (sub["shard"].to_numpy() == excl // 500).all()


def test_curate_corpus_semantic_dedup():
    """Opt-in SemDeDup: survivors whose embedding is a semantic
    duplicate (planted identical-up-to-noise vectors) drop via the
    Bloom anti-join; a clean embedding table is a no-op."""
    import pyarrow as pa

    from tilecloud_chain_ray.stages.semdedup import semdedup_verdicts

    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    base = curate_corpus(docs, quality_min=0.0).survivors.to_pandas()
    base_ids = sorted(base["doc_id"])

    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((len(base_ids), 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # plant: pairs of consecutive base survivors share an embedding
    for i in range(0, 10, 2):
        vecs[i + 1] = vecs[i] + 1e-4 * rng.standard_normal(16)
        vecs[i + 1] /= np.linalg.norm(vecs[i + 1])
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(base_ids, pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    )
    got = curate_corpus(
        docs, quality_min=0.0, embeddings=emb, semantic_threshold=0.95, semantic_clusters=4
    ).survivors.to_pandas()
    verd = semdedup_verdicts(emb, threshold=0.95, n_clusters=4).to_pandas()
    dropped = set(verd.loc[~verd["keep"], "vec_id"])
    assert len(dropped) >= 5  # the five planted pairs each lose one
    assert set(got["doc_id"]) == set(base_ids) - dropped

    # clean table (no vectors above threshold): identity
    clean = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(base_ids, pa.int64()),
                "embedding": pa.array(
                    (rng.standard_normal((len(base_ids), 16))).tolist(),
                    pa.list_(pa.float64()),
                ),
            }
        )
    )
    same = curate_corpus(
        docs, quality_min=0.0, embeddings=clean, semantic_threshold=0.9999
    ).survivors.to_pandas()
    assert sorted(same["doc_id"]) == base_ids


def test_curate_corpus_lm_filter():
    """Opt-in perplexity cut: survivors are a subset of the no-cut run
    with identical schema, and a tight ceiling drops rows."""
    docs = ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    base = curate_corpus(docs, quality_min=0.0)
    cut = curate_corpus(docs, quality_min=0.0, lm_max_ppl=1e9)  # keep all
    base_df = base.survivors.to_pandas()
    cut_df = cut.survivors.to_pandas()
    assert sorted(cut_df.columns) == sorted(base_df.columns)
    assert set(cut_df["doc_id"]) == set(base_df["doc_id"])

    # median-perplexity ceiling drops roughly the worse half
    from tilecloud_chain_ray.stages.lm import lm_score_batch, train_char_lm
    import pyarrow as pa

    model = train_char_lm(docs.materialize(), sample_max_docs=200)
    scored = lm_score_batch(
        pa.Table.from_pandas(base_df[["text"]], preserve_index=False), model
    )
    med = float(np.median(scored["lm_ppl"].to_numpy()))
    tight = curate_corpus(docs, quality_min=0.0, lm_max_ppl=med, lm_sample_max_docs=200)
    n_tight = tight.survivors.count()
    assert 0 < n_tight < len(base_df)
