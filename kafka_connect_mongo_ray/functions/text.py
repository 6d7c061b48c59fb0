"""Text analysis stages for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` bodies; the stateful ones
(compiled regexes, stopword tables) are callable classes so the setup
runs once per actor (``__init__``), not once per batch.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.utils import compact_array

# Tiny per-language stopword profiles for the n-gram/stopword language
# heuristic. Deliberately small: the point is the Ray-side plumbing and
# determinism, not linguistic accuracy.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los"},
    "de": {"der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"},
    "fr": {"le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"},
}


def token_count_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Whitespace token count, pure Arrow kernels (zero Python loop)."""
    toks = pc.ascii_split_whitespace(compact_array(batch[text_col]))
    n = pc.list_value_length(toks)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def quality_score_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Quality heuristics: char count, token count, mean token length,
    alpha ratio. Arrow-vectorized; mirrors the usual doc-quality
    filters of web-scale corpus pipelines."""
    text = compact_array(batch[text_col])
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    toks = pc.ascii_split_whitespace(text)
    n_tokens = pc.cast(pc.list_value_length(toks), pa.float64())
    n_spaces = pc.subtract(n_chars, pc.cast(
        pc.utf8_length(pc.replace_substring_regex(text, r"\s", "")), pa.float64()))
    alpha_chars = pc.cast(pc.utf8_length(
        pc.replace_substring_regex(text, r"[^A-Za-z]", "")), pa.float64())
    safe_tokens = pc.max_element_wise(n_tokens, pa.scalar(1.0))
    mean_tok_len = pc.divide(pc.subtract(n_chars, n_spaces), safe_tokens)
    alpha_ratio = pc.divide(alpha_chars, pc.max_element_wise(n_chars, pa.scalar(1.0)))
    out = batch.append_column("q_n_chars", pc.cast(n_chars, pa.int64()))
    out = out.append_column("q_n_tokens", pc.cast(n_tokens, pa.int64()))
    out = out.append_column("q_mean_tok_len", mean_tok_len)
    out = out.append_column("q_alpha_ratio", alpha_ratio)
    return out


class TokenizerStage:
    """BPE-ish regex token counting — compiled once per actor."""

    PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.rx = re.compile(self.PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        counts = np.fromiter(
            (len(self.rx.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
        )
        return batch.append_column("n_bpe_tokens", pa.array(counts))


class LanguageId:
    """Stopword-profile language heuristic; profiles built per actor.

    The batch path is Arrow/numpy-vectorized: letters-run tokenization
    via one regex replace + whitespace split, per-language membership
    via ``is_in`` on the flattened token array, per-row scores via
    prefix sums over the list offsets. ``classify`` remains the scalar
    reference implementation (parity-tested)."""

    _WORD_CHARS = "a-záéíóúüñàèìòùäöß"

    def __init__(self, text_col: str = "text", default: str = "unknown"):
        self.text_col = text_col
        self.default = default
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
        self.word_rx = re.compile(f"[{self._WORD_CHARS}]+")
        self.langs = sorted(self.profiles)
        self._prof_arrays = {
            lang: pa.array(sorted(self.profiles[lang]), pa.string())
            for lang in self.langs
        }

    def classify(self, text: str) -> str:
        words = self.word_rx.findall((text or "").lower())
        if not words:
            return self.default
        # CJK heuristic: any han codepoint dominates
        if any("一" <= ch <= "鿿" for ch in text[:200]):
            return "zh"
        scores = {
            lang: sum(w in prof for w in words) for lang, prof in self.profiles.items()
        }
        best = max(sorted(scores), key=lambda k: scores[k])
        return best if scores[best] > 0 else self.default

    def classify_batch(self, text_arr) -> pa.Array:
        text = compact_array(pc.cast(text_arr, pa.string()))
        text = pc.fill_null(text, "")
        lower = pc.utf8_lower(text)
        # ONE regex pass: split directly on non-letter runs; the split
        # leaves empty strings at the edges — dropped via the
        # membership test (profiles contain no empty string) and the
        # non-empty word count below
        toks = pc.split_pattern_regex(lower, f"[^{self._WORD_CHARS}]+")
        flat = pc.list_flatten(toks)
        nonempty = np.asarray(pc.not_equal(flat, ""))
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        ends = lens.cumsum()
        starts = ends - lens
        csum_ne = np.concatenate([[0], nonempty.cumsum()])
        n_words = csum_ne[ends] - csum_ne[starts]
        scores = np.empty((len(self.langs), len(lens)), dtype=np.int64)
        for li, lang in enumerate(self.langs):
            member = np.asarray(
                pc.is_in(flat, value_set=self._prof_arrays[lang])
            ).astype(np.int64)
            csum = np.concatenate([[0], member.cumsum()])
            scores[li] = csum[ends] - csum[starts]
        best_idx = scores.argmax(axis=0)  # first max → alphabetical-first
        best_score = scores.max(axis=0)
        cjk = np.asarray(pc.greater(
            pc.count_substring_regex(
                pc.utf8_slice_codeunits(text, 0, 200), "[一-鿿]"),
            0))
        langs_arr = np.array(self.langs, dtype=object)
        pred = langs_arr[best_idx]
        pred[best_score == 0] = self.default
        pred[cjk] = "zh"
        pred[n_words == 0] = self.default
        return pa.array(pred, pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "lang_pred", self.classify_batch(batch[self.text_col]))


def md5_fingerprint_batch(batch: pa.Table, *, text_col: str = "text",
                          out_col: str = "fingerprint") -> pa.Table:
    """Exact-dup document fingerprint: md5 of the raw text (matches
    DuckDB ``md5(text)`` for oracle parity)."""
    fps = [hashlib.md5((t or "").encode()).hexdigest()
           for t in batch[text_col].to_pylist()]
    return batch.append_column(out_col, pa.array(fps, pa.string()))


def repetition_stats_batch(batch: pa.Table, *, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Gopher-style word-repetition quality signals, per document:

    - ``n_words`` / ``n_distinct`` — total and distinct space-separated
      words (SQL ``string_split(text, ' ')`` convention, NOT whitespace
      regex, so the oracle mirror is exact);
    - ``top_word`` / ``top_cnt`` — the modal word (ties broken by the
      lexicographically smallest word) and its count;
    - ``dup_frac`` = 1 − distinct/total and ``top_frac`` = top/total —
      the fractions web-corpus filters threshold on (a boilerplate or
      template page repeats a few words heavily).

    Fully batch-local (embarrassingly parallel): one pandas
    split→explode→groupby per batch, no Python loop over rows. Both
    fractions are int-derived float64 divisions, bit-identical in SQL.
    """
    import pandas as pd

    ids = np.asarray(batch[id_col])
    texts = pd.Series(batch[text_col].to_pylist(), dtype=object).fillna("")
    toks = texts.str.split(" ")
    exploded = pd.DataFrame({
        "__i": np.repeat(np.arange(len(ids)), toks.str.len().to_numpy()),
        "tok": np.concatenate([np.asarray(t, dtype=object) for t in toks])
        if len(ids) else np.array([], dtype=object),
    })
    cnt = (exploded.groupby(["__i", "tok"], sort=True)
           .size().rename("cnt").reset_index())
    per_doc = cnt.groupby("__i", sort=True)
    n_words = per_doc["cnt"].sum().to_numpy(np.int64)
    n_distinct = per_doc["cnt"].size().to_numpy(np.int64)
    # modal word with min-word tie-break: stable sort by (-cnt) keeps
    # the groupby's lexicographic tok order within equal counts
    srt = cnt.sort_values(["__i", "cnt"], ascending=[True, False],
                          kind="mergesort")
    top = srt.drop_duplicates("__i", keep="first").set_index("__i")
    top_word = top["tok"].to_numpy(dtype=object)
    top_cnt = top["cnt"].to_numpy(np.int64)
    return pa.table({
        id_col: pa.array(ids),
        "n_words": pa.array(n_words, pa.int64()),
        "n_distinct": pa.array(n_distinct, pa.int64()),
        "top_word": pa.array(top_word, pa.string()),
        "top_cnt": pa.array(top_cnt, pa.int64()),
        "dup_frac": pa.array(1.0 - n_distinct / n_words, pa.float64()),
        "top_frac": pa.array(top_cnt / n_words, pa.float64()),
    })


def rolling_fingerprint_batch(batch: pa.Table, *, text_col: str = "text",
                              window: int = 16) -> pa.Table:
    """Rolling-hash (Rabin-Karp style) document fingerprint: min of the
    window hashes — robust to small edits, numpy-vectorized per doc."""
    out = []
    base = np.uint64(1099511628211)
    for t in batch[text_col].to_pylist():
        b = np.frombuffer((t or "").encode()[: 1 << 16], dtype=np.uint8).astype(np.uint64)
        if len(b) < window:
            out.append(int(b.sum()))
            continue
        # cumulative polynomial hash over sliding windows
        pw = np.power(base, np.arange(window, dtype=np.uint64))
        strided = np.lib.stride_tricks.sliding_window_view(b, window)
        h = (strided * pw).sum(axis=1)
        out.append(int(h.min()))
    return batch.append_column("rolling_fp", pa.array(out, pa.uint64()))


def char_entropy_batch(batch: pa.Table, *, id_col: str = "doc_id",
                       text_col: str = "text",
                       round_to: int = 6) -> pa.Table:
    """Per-document Shannon entropy (base 2) of the CHARACTER unigram
    distribution — the classic gibberish/boilerplate quality signal
    (low entropy ⇒ repeated filler, high ⇒ random noise). Shuffle-free
    batch-local map; mirrors DuckDB's ``entropy()`` aggregate over
    per-char unnested rows, so it is SQL-oracle-checkable.

    Vectorized per batch: one ``str.join`` + UTF-32 encode flattens the
    batch's codepoints (no per-row Python), then a single ``np.unique``
    over ``(doc_index << 32) | codepoint`` keys yields per-(doc, char)
    counts and ``np.add.reduceat`` the per-doc Σ c·log₂c. Empty/null
    texts produce NO output row (SQL GROUP BY over zero char rows)."""
    texts = pc.fill_null(batch[text_col], "").to_pylist()
    ids = np.asarray(batch[id_col], dtype=np.int64)
    flat = "".join(texts)
    codes = np.frombuffer(flat.encode("utf-32-le"), dtype=np.uint32)
    lens = np.asarray(pc.utf8_length(pc.fill_null(batch[text_col], "")),
                      dtype=np.int64)
    doc_of = np.repeat(np.arange(len(lens), dtype=np.uint64), lens)
    if len(codes) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "ent": pa.array([], pa.float64())})
    key = (doc_of << np.uint64(32)) | codes.astype(np.uint64)
    uk, cnt = np.unique(key, return_counts=True)
    docidx = (uk >> np.uint64(32)).astype(np.int64)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(docidx)) + 1))
    clogc = cnt * np.log2(cnt)
    sums = np.add.reduceat(clogc, starts)
    present = docidx[starts]
    n = lens[present].astype(np.float64)
    ent = np.round(np.log2(n) - sums / n, round_to)
    return pa.table({id_col: pa.array(ids[present], pa.int64()),
                     "ent": pa.array(ent, pa.float64())})


# Curation PII screen: RE2 patterns evaluated by Arrow's C++ kernels,
# count-identical to DuckDB regexp_extract_all (both engines are RE2 —
# verified in tests) so the operator is SQL-oracle-checkable.
PII_PATTERNS = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phones": r"\+?\d[\d\s().-]{7,}\d",
    "ssns": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_counts_batch(batch: pa.Table, *, text_col: str = "text",
                     patterns: dict[str, str] | None = None) -> pa.Table:
    """Per-document PII-pattern match counts — one
    ``pc.count_substring_regex`` kernel per pattern (vectorized RE2 in
    C++, no Python per row; null text counts 0, the ``coalesce``
    mirror). Appends one int64 column per pattern name."""
    for name, pat in (patterns or PII_PATTERNS).items():
        n = pc.fill_null(
            pc.count_substring_regex(batch[text_col], pat), 0)
        batch = batch.append_column(name, pc.cast(n, pa.int64()))
    return batch


def normalize_text_batch(batch: pa.Table, *, text_col: str = "text",
                         out_col: str = "norm") -> pa.Table:
    """Canonical text normalization for fuzzy-exact dedup: lowercase,
    collapse every non-alphanumeric run to a single space, trim. All
    three are Arrow C++ kernels; the SQL mirror is
    ``trim(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9]+', ' ',
    'g'))`` (RE2 on both sides). Null text normalizes to ''."""
    t = pc.fill_null(batch[text_col], "")
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, pattern="[^a-z0-9]+",
                                   replacement=" ")
    t = pc.utf8_trim_whitespace(t)
    return batch.append_column(out_col, t)


class Encoder:
    """Text-encoder STAGE for actor-pool ``map_batches``: pass the
    CLASS (``map_batches(Encoder, concurrency=(1, N))``) so expensive
    setup — model weights, tokenizer, device handles — happens ONCE per
    actor in ``__init__`` (via :meth:`_load`), and ``__call__`` encodes
    one Arrow batch. The contract every implementation keeps:
    ``(id_col, embedding list<float32>)`` output with L2-normalized
    rows, so downstream consumers (the persisted IVF index, cosine
    near-dup sweeps) are implementation-agnostic.

    The DEFAULT :meth:`encode` is the deterministic blake2b stub
    (bit-identical to :func:`hash_embedding_batch` — this container
    ships no model weights); a real encoder subclasses and overrides
    ``_load`` + ``encode`` only."""

    def __init__(self, *, dim: int = 32, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.dim = dim
        self.text_col = text_col
        self.id_col = id_col
        self.model = self._load()

    def _load(self):
        """Load and return the model handle — once per actor."""
        return None

    def encode(self, texts: list) -> np.ndarray:
        """``(n, dim)`` float32 with unit rows. Override for a real
        model (batch inference against ``self.model``)."""
        out = np.empty((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(
                hashlib.blake2b((t or "").encode(), digest_size=8).digest(),
                "little")
            v = np.random.default_rng(seed).standard_normal(self.dim)
            out[i] = (v / max(float(np.linalg.norm(v)), 1e-12)
                      ).astype(np.float32)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.asarray(self.encode(batch[self.text_col].to_pylist()),
                          dtype=np.float32)
        return pa.table({
            self.id_col: batch[self.id_col],
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        })


def hash_embedding_batch(batch: pa.Table, *, dim: int = 32,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    """Deterministic STUB text embedder: a unit vector seeded by the
    blake2b of the text (the DecodeStub convention — no model weights
    in this container; a real encoder is a drop-in actor-pool swap
    with the same (id, list<float>) output schema). Identical texts
    embed identically, so downstream geometry is content-derived and
    every consumer (IVF index, near-dup sweeps) is testable
    end-to-end."""
    vecs = []
    for t in batch[text_col].to_pylist():
        seed = int.from_bytes(
            hashlib.blake2b((t or "").encode(), digest_size=8).digest(),
            "little")
        v = np.random.default_rng(seed).standard_normal(dim)
        vecs.append((v / max(float(np.linalg.norm(v)), 1e-12)
                     ).astype(np.float32))
    return pa.table({
        id_col: batch[id_col],
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
