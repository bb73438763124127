"""Text-analysis stages over the documents/pages tables.

Large-scale training-data operators (SURVEY.md §2 additions): language
ID (stopword-count heuristic), quality scoring, token counting,
document fingerprinting.  Every per-batch body is vectorized
(pyarrow.compute kernels); formulas are chosen to be exactly
reproducible in the DuckDB oracle (integer counts, fixed float
expressions).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

# stopword markers per language, counted as substrings with surrounding
# spaces (exactly `(length(t) - length(replace(t, m, ''))) / length(m)`
# in SQL)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of "),
    "de": (" der ", " und ", " die "),
    "fr": (" le ", " et ", " les "),
    "it": (" il ", " e ", " di "),
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_tokens``: whitespace-separated chunks of trimmed text.

    SQL equivalent: ``len(regexp_split_to_array(trim(text), '\\s+'))``.
    """
    trimmed = pc.utf8_trim_whitespace(batch[text_col])
    splits = pc.split_pattern_regex(trimmed, r"\s+")
    n = pc.list_value_length(splits).cast(pa.int64())
    # empty text -> [''] (1 element) in both arrow and duckdb semantics
    return batch.append_column("n_tokens", n)


# GPT-2-style pretokenizer shape, ASCII-simplified so python re, Arrow
# RE2 and DuckDB RE2 agree exactly: optional leading space + run of
# letters | digits | other-non-space
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_bpe_tokens``: BPE-ish pretokenizer piece count.

    SQL equivalent: ``len(regexp_extract_all(text, pattern))``.
    """
    n = pc.count_substring_regex(batch[text_col], BPE_TOKEN_PATTERN).cast(pa.int64())
    return batch.append_column("n_bpe_tokens", n)


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append marker-count columns + ``lang_pred`` (argmax, tie -> first
    in en/de/fr/it order — reproducible in SQL with a CASE chain)."""
    text = batch[text_col]
    padded = pc.binary_join_element_wise(
        pa.array([" "] * len(text)), text, pa.array([" "] * len(text)), ""
    )
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        total = None
        for m in markers:
            c = pc.count_substring(padded, m).cast(pa.int64())
            total = c if total is None else pc.add(total, c)
        scores[lang] = total.to_numpy(zero_copy_only=False)
    langs = list(LANG_MARKERS)
    mat = np.stack([scores[l] for l in langs])  # (4, n)
    pred_idx = np.argmax(mat, axis=0)  # first max wins (ties -> en<de<fr<it order)
    pred = np.array(langs, dtype=object)[pred_idx]
    out = batch
    for lang in langs:
        out = out.append_column(f"score_{lang}", pa.array(scores[lang], pa.int64()))
    return out.append_column("lang_pred", pa.array(pred.tolist(), pa.string()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_chars_text``, ``n_upper``, ``n_digit``, ``quality``.

    quality = token-length factor * (1 - upper_ratio) — a deterministic
    toy of the usual length/punct/case heuristics, with a fixed float
    expression both engines evaluate identically:
    ``least(n_tokens, 100)/100.0 * (1.0 - n_upper*1.0/greatest(n_chars,1))``
    """
    if "n_tokens" not in batch.schema.names:
        batch = token_count_batch(batch, text_col)
    text = batch[text_col]
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_upper = pc.count_substring_regex(text, "[A-Z]").cast(pa.int64())
    n_digit = pc.count_substring_regex(text, "[0-9]").cast(pa.int64())
    nt = batch["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
    nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    nu = n_upper.to_numpy(zero_copy_only=False).astype(np.float64)
    quality = np.minimum(nt, 100.0) / 100.0 * (1.0 - nu / np.maximum(nc, 1.0))
    out = batch.append_column("n_chars_text", n_chars)
    out = out.append_column("n_upper", n_upper)
    out = out.append_column("n_digit", n_digit)
    return out.append_column("quality", pa.array(quality, pa.float64()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``fingerprint``: min crc32 over rolling byte 8-grams —
    a content-defined document fingerprint (rows-only oracle)."""
    texts = batch[text_col].to_pylist()
    fps = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        if len(b) < 8:
            fps[i] = zlib.crc32(b)
            continue
        arr = np.frombuffer(b, dtype=np.uint8)
        # vectorized rolling polynomial hash of 8-grams (mod 2^32)
        windows = np.lib.stride_tricks.sliding_window_view(arr, 8).astype(np.uint64)
        mults = np.uint64(31) ** np.arange(8, dtype=np.uint64)
        h = (windows * mults).sum(axis=1) & np.uint64(0xFFFFFFFF)
        fps[i] = int(h.min())
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))


def redact_batch(
    batch: pa.Table,
    text_col: str = "text",
    pattern: str = "[0-9]+",
    replacement: str = "<NUM>",
    out_col: str = "redacted",
) -> pa.Table:
    """Append ``n_redactions`` (non-overlapping pattern matches) and the
    redacted text — the PII/number-scrubbing pass of a training-data
    pipeline, pure RE2 kernels.

    SQL equivalents: ``len(regexp_extract_all(text, pattern))`` and
    ``regexp_replace(text, pattern, replacement, 'g')``.
    """
    n = pc.count_substring_regex(batch[text_col], pattern).cast(pa.int64())
    red = pc.replace_substring_regex(batch[text_col], pattern, replacement)
    out = batch.append_column("n_redactions", n)
    return out.append_column(out_col, red)


def analyze_documents(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """token count + lang id + quality in one vectorized pass."""

    def analyze(batch: pa.Table) -> pa.Table:
        batch = token_count_batch(batch, text_col)
        batch = lang_id_batch(batch, text_col)
        return quality_score_batch(batch, text_col)

    return ds.map_batches(analyze, batch_format="pyarrow")
