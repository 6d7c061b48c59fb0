"""Deduplication operators for training-data pipelines.

All expressed Ray-Data-first:

- **exact**: md5 fingerprint in ``map_batches`` → hash-partitioned
  ``groupby(fingerprint)`` → first (min id) per group. One shuffle,
  volume = one row per doc (only the hash + id need to move if the
  caller projects first).
- **MinHash + LSH**: shingle → minhash signature (numpy) → explode to
  (band_id, band_hash, doc_id) rows → ``groupby(band)`` → candidate
  pairs within buckets → verify true Jaccard. Shuffle volume = bands ×
  docs small fixed-width rows; no all-pairs anywhere.
- **SimHash**: 64-bit signature per doc; near-dups = equal signature
  bands (hamming≤k via band collision), verified by hamming distance.
- **n-gram Jaccard**: the verifier, also usable brute-force on small
  candidate sets; plus a first-class exact word-n-gram AllPairs
  similarity join (DF-ordered prefix filtering) — see
  :func:`ngram_allpairs_pairs`.
- **embedding cosine**: near-dup pairs above a cosine threshold,
  blocked by LSH hyperplane buckets at scale (here: per-batch matmul
  against the broadcast matrix for exactness at test scale).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from kafka_connect_mongo_ray.functions.text import md5_fingerprint_batch

# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                num_partitions: int = 32):
    """Keep the min-id document per identical text. Returns a Dataset of
    survivors (id + fingerprint). Only (id, hash) rows shuffle — the
    text never moves."""
    with_fp = ds.map_batches(
        md5_fingerprint_batch, fn_kwargs={"text_col": text_col}, batch_format="pyarrow"
    ).select_columns([id_col, "fingerprint"])

    # one vectorized min-id pick per HASH BUCKET of the fingerprint —
    # a map_groups call per distinct text is a per-group fixed cost
    # that scales with corpus size (see _expand_pairs_bucketed)
    def first_per_fp(g: pd.DataFrame) -> pd.DataFrame:
        # single integer-key sort: first occurrence per fingerprint in
        # id order IS the min-id row (no string-primary multi-key sort)
        return (g.drop(columns="__gb")
                .sort_values(id_col, kind="mergesort")
                .drop_duplicates("fingerprint", keep="first"))

    return (with_fp.map_batches(
        lambda df: _add_hash_bucket(df, ["fingerprint"], num_partitions),
        batch_format="pandas")
        .groupby("__gb", num_partitions=num_partitions)
        .map_groups(first_per_fp, batch_format="pandas"))


# ---------------------------------------------------------------------------
# shingling + minhash


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-CHAR shingle hashes (uint64), vectorized rolling view
    over codepoints — character-based so the shingle sets match a SQL
    ``substr(text, i, k)`` oracle exactly (byte windows diverge on
    multi-byte text). Texts shorter than k contribute one shingle (the
    text itself), mirroring ``substr`` semantics. Truncated at 64Ki
    chars (knob for pathological documents)."""
    cp = np.frombuffer((text or "")[: 1 << 16].encode("utf-32-le"), dtype=np.uint32)
    if len(cp) < k:
        win = np.pad(cp, (0, k - len(cp)))[None, :].astype(np.uint64)
    else:
        win = np.lib.stride_tricks.sliding_window_view(cp, k).astype(np.uint64)
    pw = np.power(np.uint64(1099511628211), np.arange(k, dtype=np.uint64))
    return np.unique((win * pw).sum(axis=1))


class MinHasher:
    """Per-actor state: the random hash-function parameters (seeded).

    The batch path concatenates the whole batch's shingle hashes and
    computes all signatures with chunked ``np.minimum.reduceat`` over
    the (H, total_shingles) universal-hash matrix — one numpy call per
    ~2M shingles instead of one ``np.outer`` per document.
    Bit-identical to the scalar :meth:`signature` (parity-tested)."""

    _CHUNK_SHINGLES = 2_000_000  # bounds the (H, T) transient to ~1 GB

    def __init__(self, num_hashes: int = 64, k: int = 5, seed: int = 42,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_hashes, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        """Scalar reference (kept as the parity oracle)."""
        sh = _shingle_hashes(text or "", self.k)
        # (H, S) universal hashing, min over shingles per hash fn
        vals = (np.outer(self.a, sh) + self.b[:, None])
        return vals.min(axis=1)

    def signatures_batch(self, texts: list) -> np.ndarray:
        sh_list = [_shingle_hashes(t or "", self.k) for t in texts]
        lens = np.fromiter((len(s) for s in sh_list), dtype=np.int64,
                           count=len(sh_list))
        out = np.empty((len(texts), len(self.a)), dtype=np.uint64)
        start = 0
        while start < len(texts):
            end, tot = start, 0
            while end < len(texts) and (end == start
                                        or tot + lens[end] <= self._CHUNK_SHINGLES):
                tot += lens[end]
                end += 1
            sh = np.concatenate(sh_list[start:end])
            offs = np.cumsum(lens[start:end])[:-1]
            segs = np.concatenate([[0], offs]).astype(np.int64)
            # ONE reused row buffer per hash function: a full (H, T)
            # uint64 transient costs more in first-touch page faults
            # than the arithmetic itself, and numpy's strided uint64
            # broadcast (a[:,None]*sh[None,:]) is ~50x slower than a
            # contiguous scalar multiply
            row = np.empty(len(sh), dtype=np.uint64)
            for i in range(len(self.a)):
                np.multiply(sh, self.a[i], out=row)
                row += self.b[i]
                out[start:end, i] = np.minimum.reduceat(row, segs)
            start = end
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        sigs = self.signatures_batch(batch[self.text_col].to_pylist())
        mh = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel(), pa.uint64()), sigs.shape[1])
        return pa.table({self.id_col: ids, "minhash": mh})


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (uint64 wraparound)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class BandExploder:
    """signature → (band_id, band_hash, doc_id) rows for the LSH groupby.

    The band hash only needs to be a deterministic, collision-sparse
    function of the band's signature slice — equality is all the
    groupby uses — so it is a vectorized splitmix64 mixing chain over
    the slice's columns (uint64 output), not a per-(doc × band)
    blake2b call."""

    def __init__(self, num_bands: int = 16, id_col: str = "doc_id"):
        self.num_bands = num_bands
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from kafka_connect_mongo_ray.utils import embedding_matrix

        ids = np.asarray(batch[self.id_col])
        sigs = embedding_matrix(batch["minhash"], dtype=np.uint64)
        n, h = sigs.shape
        rows_per_band = h // self.num_bands
        band_ids = np.repeat(np.arange(self.num_bands, dtype=np.int32), n)
        hashes = np.empty(self.num_bands * n, dtype=np.uint64)
        for b in range(self.num_bands):
            chunk = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
            acc = np.full(n, np.uint64(b + 1), dtype=np.uint64)
            for j in range(rows_per_band):
                acc = _mix64(acc ^ chunk[:, j])
            hashes[b * n:(b + 1) * n] = acc
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(hashes, pa.uint64()),
                self.id_col: pa.array(np.tile(ids, self.num_bands)),
            }
        )


#: full all-pairs expansion is allowed up to this bucket size; beyond it
#: a bucket switches to the O(n) star+chain topology (see below)
BUCKET_PAIR_CAP = 512


def _pairs_in_bucket(g: pd.DataFrame, id_col: str,
                     cap: int | None = BUCKET_PAIR_CAP,
                     warn_context: str | None = None) -> pd.DataFrame:
    """In-bucket pair expansion; ``cap=None`` means unconditional
    all-pairs (required wherever recall-completeness is claimed).
    ``warn_context`` logs when a bucket degrades past the cap so a
    capped run can't silently lose recall."""
    ids = np.sort(g[id_col].to_numpy())
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    if cap is None or n <= cap:
        a, b = np.triu_indices(n, k=1)
        return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})
    if warn_context:
        import logging

        logging.getLogger(__name__).warning(
            "%s: bucket of %d ids exceeds bucket_cap=%d — degrading to "
            "star+chain topology; pairs sharing ONLY this bucket's key "
            "may be lost", warn_context, n, cap)
    # Degenerate band bucket (mass-identical corpus slice): all-pairs is
    # O(n²) and would explode a 100-TB run. Emit a star to the min id
    # plus a consecutive chain — 2n-3 pairs keeping every member
    # connected to the cluster anchor, so min-id dedup still removes
    # every duplicate; the downstream Jaccard verify rejects any false
    # candidate this adds (recall loss is confined to buckets that were
    # already degenerate).
    return pd.DataFrame({
        "id_a": np.concatenate([np.full(n - 1, ids[0]), ids[1:-1]]),
        "id_b": np.concatenate([ids[1:], ids[2:]]),
    }).drop_duplicates()


def _default_partitions(requested: int | None) -> int:
    """Shuffle width: callers at real scale should size this to their
    data; the default tracks the session's CPU count so small runs
    don't pay 32 partitions of fixed task cost for 2k rows."""
    if requested is not None:
        return requested
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(8, min(64, 2 * cpus))


def _add_hash_bucket(df: pd.DataFrame, cols: list[str],
                     num_buckets: int) -> pd.DataFrame:
    """Deterministic hash bucket of one or more key columns (pandas
    siphash — stable across workers, runs, and partitionings).
    ``assign`` shares the existing column buffers (no deep copy of the
    batch just to append one int32 column)."""
    h = pd.util.hash_array(df[cols[0]].to_numpy(), categorize=False)
    for c in cols[1:]:
        h = h + np.uint64(0x9E3779B9) * pd.util.hash_array(
            df[c].to_numpy(), categorize=False)
    return df.assign(__gb=(h % np.uint64(num_buckets)).astype(np.int32))


#: keys larger than this use the per-key triu expansion instead of the
#: bucket-wide self-merge: the merge materializes the full n² cross
#: product (both orders + diagonal + key columns) before the a<b
#: filter, ~2-3× the peak memory of a triu over the same key
_MERGE_GROUP_BOUND = 2048


def _expand_pairs_bucketed(ds, *, key_cols: list[str], id_col: str,
                           cap: int | None, num_partitions: int,
                           warn_context: str | None = None):
    """In-bucket pair expansion, ONE vectorized pandas self-merge per
    HASH BUCKET of the key instead of a ``groupby(key).map_groups``
    call per distinct key. The per-group fixed cost (a pandas frame
    per group) scales with distinct-key count — measured dominant at
    the sf0.01 gate (2.3× on the AllPairs path) and it only grows with
    corpus size. Co-location is unchanged: every row of a key shares
    its hash bucket. Keys above ``cap`` still route through
    :func:`_pairs_in_bucket` individually (they are rare by
    construction) so the capped star+chain semantics are identical."""

    # the self-merge covers keys up to this bound; bigger keys fall
    # back to the per-key triu/star+chain path (rare by construction:
    # DF-ordered prefixes / band hashes keep buckets small), bounding
    # the merge's n² cross-product memory
    merge_bound = _MERGE_GROUP_BOUND if cap is None else min(
        cap, _MERGE_GROUP_BOUND)

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__gb")
        # dropna=False: a null key is a group like any other (matching
        # Ray's groupby semantics — pandas merge also matches NaN==NaN)
        sizes = g.groupby(key_cols, dropna=False)[id_col].transform(
            "size").to_numpy()
        small = g.loc[sizes <= merge_bound]
        m = small.merge(small, on=key_cols)
        a, b = f"{id_col}_x", f"{id_col}_y"
        m = m.loc[m[a] < m[b]]
        out = pd.DataFrame({"id_a": m[a].to_numpy(),
                            "id_b": m[b].to_numpy()})
        if (sizes > merge_bound).any():
            big = [_pairs_in_bucket(gg, id_col, cap, warn_context)
                   for _, gg in g.loc[sizes > merge_bound].groupby(
                       key_cols, dropna=False)]
            out = pd.concat([out, *big], ignore_index=True)
        return out

    return (ds.map_batches(
        lambda df: _add_hash_bucket(df, key_cols, num_partitions),
        batch_format="pandas")
        .groupby("__gb", num_partitions=num_partitions)
        .map_groups(pairs_bucket, batch_format="pandas"))


def _dedup_pairs_bucketed(pairs, *, num_partitions: int):
    """Distinct (id_a, id_b) via one vectorized ``drop_duplicates`` per
    hash bucket (vs a map_groups call per distinct pair)."""
    nb = max(8, num_partitions // 2)

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns="__gb").drop_duplicates(["id_a", "id_b"])

    return (pairs.map_batches(
        lambda df: _add_hash_bucket(df, ["id_a", "id_b"], nb),
        batch_format="pandas")
        .groupby("__gb", num_partitions=nb)
        .map_groups(dedup_bucket, batch_format="pandas"))


def minhash_lsh_candidates(ds, *, id_col: str = "doc_id", text_col: str = "text",
                           num_hashes: int = 64, num_bands: int = 16, seed: int = 42,
                           bucket_cap: int = BUCKET_PAIR_CAP,
                           num_partitions: int | None = None):
    """Candidate near-dup pairs via MinHash-LSH; distinct (id_a, id_b)."""
    num_partitions = _default_partitions(num_partitions)

    # elastic tasks, not an actor pool: per-task setup is a seeded
    # O(num_hashes) coefficient build, and the pool's 1→N ramp
    # dominated short jobs (same measurement as the brute-force ANN
    # stage — see functions/similarity.py::brute_force_topk)
    def minhash_batch(batch: pa.Table) -> pa.Table:
        return MinHasher(num_hashes=num_hashes, seed=seed,
                         text_col=text_col, id_col=id_col)(batch)

    def band_batch(batch: pa.Table) -> pa.Table:
        return BandExploder(num_bands=num_bands, id_col=id_col)(batch)

    # batch_size bounds per-task transient shingle memory (up to ~64Ki
    # chars/doc → ~0.5 MB of shingle hashes per row): with elastic
    # tasks the concurrent-task count tracks cluster CPUs, so the
    # per-TASK bound is what keeps node memory flat as nodes grow
    # (the old (1,8) actor pool bounded concurrency instead — and paid
    # the pool ramp on every short job)
    sigs = ds.map_batches(minhash_batch, batch_format="pyarrow",
                          batch_size=512)
    bands = sigs.map_batches(band_batch, batch_format="pyarrow")
    pairs = _expand_pairs_bucketed(bands, key_cols=["band_id", "band_hash"],
                                   id_col=id_col, cap=bucket_cap,
                                   num_partitions=num_partitions)
    return _dedup_pairs_bucketed(pairs, num_partitions=num_partitions)


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """True k-shingle Jaccard — the LSH verifier."""
    sa, sb = _shingle_hashes(text_a or "", k), _shingle_hashes(text_b or "", k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True)
    return len(inter) / (len(sa) + len(sb) - len(inter))


class JaccardVerifier:
    """Verify candidate pairs against a broadcast id→text lookup.

    Small-scale only: the broadcast dict holds the whole corpus. The
    scale path is :func:`verify_pairs_jaccard`, which routes candidate
    pairs through two bucketed hash joins against the documents table
    instead — no corpus ever materializes on the driver."""

    def __init__(self, texts_ref, k: int = 5, threshold: float = 0.6):
        import ray

        self.texts = ray.get(texts_ref)
        self.k = k
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        sims = [ngram_jaccard(self.texts.get(x, ""), self.texts.get(y, ""), self.k)
                for x, y in zip(a, b)]
        t = batch.append_column("jaccard", pa.array(sims, pa.float64()))
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["jaccard"], self.threshold))


def attach_pair_texts(cands_ds, docs_ds, *, id_col: str = "doc_id",
                      text_col: str = "text", num_buckets: int = 32):
    """Attach both documents' texts to candidate (id_a, id_b) pairs via
    TWO bucketed hash joins — only candidate rows and doc rows shuffle;
    the corpus never materializes on the driver (the scale-path
    replacement for the broadcast id→text dict)."""
    from kafka_connect_mongo_ray.stages.join import hash_join

    def as_side(name):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({name: batch[id_col],
                             f"text_{name[-1]}": batch[text_col]})

        return fn

    docs_a = docs_ds.map_batches(as_side("id_a"), batch_format="pyarrow")
    docs_b = docs_ds.map_batches(as_side("id_b"), batch_format="pyarrow")
    with_a = hash_join(cands_ds, docs_a, on=["id_a"], num_buckets=num_buckets)
    return hash_join(with_a, docs_b, on=["id_b"], num_buckets=num_buckets)


def verify_pairs_jaccard(cands_ds, docs_ds, *, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 5,
                         threshold: float = 0.6, num_buckets: int = 32):
    """Scale-path candidate verification: attach both texts via two
    bucketed hash joins (no driver-side corpus broadcast), then compute
    true k-shingle Jaccard per pair in ``map_batches`` and keep pairs
    ≥ threshold. Returns a Dataset of (id_a, id_b) canonical pairs."""
    with_ab = attach_pair_texts(cands_ds, docs_ds, id_col=id_col,
                                text_col=text_col, num_buckets=num_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        sims = [ngram_jaccard(x, y, k) for x, y in zip(ta, tb)]
        keep = pa.array(np.asarray(sims, dtype=np.float64) >= threshold)
        out = pa.table({"id_a": batch["id_a"], "id_b": batch["id_b"]})
        return out.filter(keep)

    return with_ab.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact word-n-gram Jaccard similarity join (AllPairs prefix filtering)


def _word_ngrams(text: str | None, n: int = 3) -> list[str]:
    """Word n-grams matching the SQL oracle exactly:
    ``array_to_string(list_slice(string_split(text,' '), u, u+n-1), ' ')``
    — split on single spaces (empty tokens kept), texts shorter than
    ``n`` tokens contribute one gram (the whole token list)."""
    toks = (text or "").split(" ")
    if len(toks) < n:
        return [" ".join(toks)]
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def word_ngram_jaccard(text_a: str | None, text_b: str | None, n: int = 3) -> float:
    """True distinct-word-n-gram Jaccard (string sets — no hashing, so
    the verify stage is collision-free by construction)."""
    sa, sb = set(_word_ngrams(text_a, n)), set(_word_ngrams(text_b, n))
    return len(sa & sb) / len(sa | sb)


def word_ngram_explode(batch: pa.Table, *, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3) -> pa.Table:
    """docs → distinct (gram, id) rows. Gram strings (not hashes) flow
    through the pipeline: rows are short (n words) and exactness
    against a SQL oracle costs nothing extra."""
    ids = np.asarray(batch[id_col])
    texts = batch[text_col].to_pylist()
    gram_lists = [np.unique(np.asarray(_word_ngrams(t, n), dtype=object))
                  for t in texts]
    lens = np.fromiter((len(g) for g in gram_lists), dtype=np.int64,
                       count=len(gram_lists))
    flat = (np.concatenate(gram_lists) if gram_lists
            else np.array([], dtype=object))
    return pa.table({"gram": pa.array(flat, pa.string()),
                     id_col: pa.array(np.repeat(ids, lens))})


def ngram_allpairs_candidates(ds, *, id_col: str = "doc_id",
                              text_col: str = "text", n: int = 3,
                              threshold: float = 0.5,
                              bucket_cap: int | None = None,
                              num_partitions: int | None = None,
                              staged: bool = False):
    """Candidate pairs for exact word-n-gram Jaccard ≥ ``threshold`` via
    DF-ordered prefix filtering (the AllPairs family — Bayardo, Ma &
    Srikant, WWW'07). Unlike MinHash-LSH this is deterministic and
    RECALL-COMPLETE: every pair with true Jaccard ≥ t shares a gram in
    both docs' prefixes.

    Prefix principle: fix any global total order on grams; a doc with
    ``s`` distinct grams keeps its first ``p = s - ceil(t·s) + 1``. If
    J(A,B) ≥ t then |A∩B| ≥ t·max(|A|,|B|), and the smallest common
    gram has rank ≤ |A| - ceil(t·|A|) + 1 in A (ditto B), so the two
    prefixes intersect. We order grams by (global document frequency
    asc, gram asc) — the DF ordering puts RARE grams in prefixes, which
    is what keeps per-gram candidate buckets small at corpus scale.

    Distributed shape (three groupbys, no broadcast):
      1. ``map_batches`` explode → distinct (gram, id) rows;
      2. ``groupby(gram)`` attaches each gram's global DF in the same
         pass that co-locates it (no separate count + join);
      3. ``groupby(id)`` sorts each doc's grams by (df, gram) and keeps
         the prefix;
      4. ``groupby(gram)`` over prefix rows emits in-bucket pairs —
         ALL pairs, because ``bucket_cap`` defaults to None here:
         recall-completeness only holds with unconditional expansion
         (a capped bucket whose members share ONLY that gram would
         silently drop true pairs — template-heavy corpora hit this).
         Set ``bucket_cap`` to trade recall for a hard per-bucket
         bound at scale; every bucket that degrades logs a warning,
         and the claim above then holds only below the cap. The DF
         ordering already keeps prefix buckets rare-gram-small, which
         is the structural defense against quadratic buckets.
    Shuffle volume is O(total distinct grams) rows of a few words each
    — word n-grams (≈ tokens per doc), not char shingles, precisely so
    this stays linear in corpus token count.

    ``staged=True`` materializes between the groupbys: a lazy chain of
    four AllToAll sorts stalls under the streaming executor's
    per-operator resource reservation at small scale (same phenomenon
    as pipelines/queries.py::verified_near_dup_pairs — measured ~10×
    on gate fixtures). Leave False for large runs so the whole chain
    streams and spills."""
    num_partitions = _default_partitions(num_partitions)
    grams = ds.map_batches(
        word_ngram_explode,
        fn_kwargs={"id_col": id_col, "text_col": text_col, "n": n},
        batch_format="pyarrow",
    )

    # Every per-KEY stage below groups by a HASH BUCKET of the key
    # (deterministic pd.util.hash_array) and runs ONE vectorized pandas
    # op over the whole bucket, instead of groupby(key).map_groups —
    # a per-group pandas call for every distinct gram/doc/pair was the
    # dominant cost (14 s → ~3 s at the sf0.01 gate) and the per-group
    # fixed overhead scales with distinct keys, so this matters at
    # 10^9 grams exactly as it does here. Same co-location guarantee:
    # all rows of a key share its bucket.

    def attach_df_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__gb")
        g["df"] = g.groupby("gram")["gram"].transform("size").astype(
            np.int64)
        return g

    with_df = (grams.map_batches(
        lambda df: _add_hash_bucket(df, ["gram"], num_partitions),
        batch_format="pandas")
        .groupby("__gb", num_partitions=num_partitions)
        .map_groups(attach_df_bucket, batch_format="pandas"))
    if staged:
        with_df = with_df.materialize()

    def prefix_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "df", "gram"], kind="mergesort")
        s = g.groupby(id_col)[id_col].transform("size").to_numpy()
        rank = g.groupby(id_col).cumcount().to_numpy()
        p = s - np.ceil(threshold * s).astype(np.int64) + 1
        return g.loc[rank < p, ["gram", id_col]]

    pref = (with_df.map_batches(
        lambda df: _add_hash_bucket(df, [id_col], num_partitions),
        batch_format="pandas")
        .groupby("__gb", num_partitions=num_partitions)
        .map_groups(prefix_bucket, batch_format="pandas"))
    if staged:
        pref = pref.materialize()

    pairs = _expand_pairs_bucketed(pref, key_cols=["gram"], id_col=id_col,
                                   cap=bucket_cap,
                                   num_partitions=num_partitions,
                                   warn_context="ngram_allpairs_candidates")
    return _dedup_pairs_bucketed(pairs, num_partitions=num_partitions)


def verify_pairs_word_ngram(cands_ds, docs_ds, *, id_col: str = "doc_id",
                            text_col: str = "text", n: int = 3,
                            threshold: float = 0.5, num_buckets: int = 32):
    """Attach both texts via two bucketed hash joins (no driver-side
    corpus state) and keep pairs with TRUE word-n-gram Jaccard ≥
    threshold. Combined with :func:`ngram_allpairs_candidates` this is
    an EXACT similarity join: recall-complete candidates × exact
    verification."""
    with_ab = attach_pair_texts(cands_ds, docs_ds, id_col=id_col,
                                text_col=text_col, num_buckets=num_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        sims = np.fromiter((word_ngram_jaccard(x, y, n) for x, y in zip(ta, tb)),
                           dtype=np.float64, count=len(ta))
        out = pa.table({"id_a": batch["id_a"], "id_b": batch["id_b"]})
        return out.filter(pa.array(sims >= threshold))

    return with_ab.map_batches(verify, batch_format="pyarrow")


def ngram_allpairs_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                         n: int = 3, threshold: float = 0.5,
                         num_partitions: int | None = None):
    """Exact word-n-gram Jaccard pair join: AllPairs prefix-filter
    candidates verified by true Jaccard. The deterministic counterpart
    to ``minhash_lsh_candidates`` + ``verify_pairs_jaccard``."""
    cands = ngram_allpairs_candidates(
        ds, id_col=id_col, text_col=text_col, n=n, threshold=threshold,
        num_partitions=num_partitions)
    return verify_pairs_word_ngram(
        cands, ds, id_col=id_col, text_col=text_col, n=n, threshold=threshold,
        num_buckets=_default_partitions(num_partitions))


# ---------------------------------------------------------------------------
# simhash


class SimHasher:
    """64-bit SimHash over word tokens; deterministic (blake2b).

    Vectorized batch path: tokens of the WHOLE batch are deduplicated
    with ``np.unique`` first, blake2b runs once per unique token (with
    a per-actor memo across batches), the 64-bit unpack + per-doc ±1
    accumulation is two numpy ops (``bits[inverse]`` gather +
    ``np.add.reduceat``) — no per-token numpy round trips. Produces
    bit-identical signatures to the scalar ``simhash64`` reference
    implementation (asserted in tests)."""

    _BITPOS = np.arange(64, dtype=np.uint64)
    _DENSE_LIMIT = 8_000_000  # max docs × uniq-tokens for the dense count matrix

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._memo: dict[str, int] = {}

    @staticmethod
    def simhash64(text: str) -> int:
        """Scalar reference implementation (kept as the test oracle)."""
        acc = np.zeros(64, dtype=np.int64)
        for tok in (text or "").split():
            h = np.uint64(int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"))
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def _hash_token(self, tok: str) -> int:
        h = self._memo.get(tok)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
            self._memo[tok] = h
        return h

    def simhash_batch(self, texts: list[str | None]) -> np.ndarray:
        import pandas as pd

        tok_lists = [(t or "").split() for t in texts]
        lens = np.fromiter((len(tl) for tl in tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        total = int(lens.sum())
        n_docs = len(texts)
        if total == 0:
            return np.zeros(n_docs, dtype=np.uint64)
        all_toks = np.empty(total, dtype=object)
        pos = 0
        for tl in tok_lists:
            all_toks[pos:pos + len(tl)] = tl
            pos += len(tl)
        # hash-based factorize (np.unique sorts object arrays — ~25x slower)
        codes, uniq = pd.factorize(all_toks)
        uh = np.fromiter((self._hash_token(t) for t in uniq), dtype=np.uint64,
                         count=len(uniq))
        bits = ((uh[:, None] >> self._BITPOS) & np.uint64(1))  # (U, 64) 0/1
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        n_uniq = len(uniq)
        # acc[d, b] = 2 * ones[d, b] - lens[d] with ones = counts @ bits:
        # the ±1 accumulation reduces to a (docs × uniq) count matrix
        # matmul — no per-token (T × 64) intermediate at all
        if n_docs * n_uniq <= self._DENSE_LIMIT:
            counts = np.bincount(doc_idx * n_uniq + codes,
                                 minlength=n_docs * n_uniq)
            ones = counts.reshape(n_docs, n_uniq).astype(np.float32) @ bits.astype(np.float32)
            ones = np.rint(ones).astype(np.int64)
        else:  # huge vocab fallback: one weighted bincount per bit
            b8 = bits.astype(np.float64)
            ones = np.empty((n_docs, 64), dtype=np.int64)
            w = b8[codes]  # (T, 64)
            for b in range(64):
                ones[:, b] = np.bincount(doc_idx, weights=w[:, b],
                                         minlength=n_docs).astype(np.int64)
        acc = 2 * ones - lens[:, None]
        sig = ((acc > 0).astype(np.uint64) << self._BITPOS[None, :]).sum(axis=1)
        return sig.astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = self.simhash_batch(texts)
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({self.id_col: ids, "simhash": pa.array(sigs, pa.uint64())})


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_near_dup_lsh(ds, *, threshold: float = 0.4, num_planes: int = 4,
                           seed: int = 42, id_col: str = "vec_id",
                           vec_col: str = "embedding", probe_bits: int = 0,
                           bucket_cap: int = BUCKET_PAIR_CAP):
    """Scale path for embedding near-dup: LSH hyperplane bucketing then
    within-bucket pairwise cosine — per-bucket O((N/2^planes)²) instead
    of global O(N²), one groupby shuffle, no broadcast matrix. Recall
    < 1 (similar pairs split by a hyperplane are missed); precision 1.

    ``probe_bits=1`` multiprobes: each row is ALSO emitted into every
    bucket at hamming distance 1 (duplication factor 1+planes), so
    pairs split by a single hyperplane are still co-located — recall
    rises at the cost of probe_bits× more shuffled rows. Duplicate
    discoveries are deduped by a final pair groupby.

    Returns canonical (id_a < id_b) pairs."""
    from kafka_connect_mongo_ray.functions.similarity import LshBucketer
    from kafka_connect_mongo_ray.utils import embedding_matrix

    dim = len(ds.take(1)[0][vec_col])
    bucketer = LshBucketer(dim=dim, num_planes=num_planes, seed=seed, vec_col=vec_col)

    def bucket_multiprobe(batch: pa.Table) -> pa.Table:
        vecs = embedding_matrix(batch[vec_col])
        signs = (vecs @ bucketer.planes.T) > 0
        base = (signs.astype(np.uint32)
                << np.arange(signs.shape[1], dtype=np.uint32)).sum(axis=1).astype(np.int32)
        buckets = [base]
        if probe_bits >= 1:
            for b in range(num_planes):
                buckets.append(base ^ np.int32(1 << b))
        n = batch.num_rows
        rep = len(buckets)
        idx = np.tile(np.arange(n, dtype=np.int64), rep)
        out = batch.take(pa.array(idx))
        return out.append_column(
            "lsh_bucket", pa.array(np.concatenate(buckets), pa.int32()))

    bucketed = ds.map_batches(bucket_multiprobe, batch_format="pyarrow")

    def pairs_in_bucket(g: pa.Table) -> pd.DataFrame:
        vecs = embedding_matrix(g[vec_col])
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        ids = np.asarray(g[id_col])
        n = len(ids)
        if n <= bucket_cap:
            sims = vecs @ vecs.T
            ai, bi = np.where(np.triu(sims >= threshold, k=1))
        else:
            # degenerate bucket: O(n²) matmul would explode — compare
            # each row only to the min-id anchor and its id-order
            # neighbor (star + chain, same topology as _pairs_in_bucket;
            # cosine is still computed, so precision stays 1)
            order = np.argsort(ids, kind="mergesort")
            ids, vecs = ids[order], vecs[order]
            star = np.flatnonzero(vecs[1:] @ vecs[0] >= threshold) + 1
            chain = np.flatnonzero(
                np.einsum("ij,ij->i", vecs[1:-1], vecs[2:]) >= threshold) + 1
            ai = np.concatenate([np.zeros(len(star), dtype=np.int64), chain])
            bi = np.concatenate([star, chain + 1])
        lo = np.minimum(ids[ai], ids[bi])
        hi = np.maximum(ids[ai], ids[bi])
        keep = lo != hi  # multiprobe can pair a row with its own copy
        df = pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep]})
        return df.drop_duplicates()

    pairs = bucketed.groupby("lsh_bucket").map_groups(
        pairs_in_bucket, batch_format="pyarrow")
    if probe_bits == 0:
        return pairs
    # multiprobe rediscovers a pair once per shared probe bucket — dedup
    return _dedup_pairs_bucketed(pairs,
                                 num_partitions=_default_partitions(None))


def embedding_near_dup_exact(ds, *, threshold: float = 0.4,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             block_rows: int = 4096):
    """EXACT all-pairs cosine near-dup, distributed as a block-pair
    sweep: the corpus is packed into B normalized float64 blocks held
    in the object store (one copy, never on the driver), and each of
    the B·(B+1)/2 block pairs is one Ray task computing its sub-matmul.
    The driver holds only block refs and the (small) matching-pair
    results. O(N²) COMPUTE is inherent to exactness — the point is the
    O(N·dim) MEMORY shape and even task decomposition. Raw Ray tasks
    are used because Dataset has no self-cross-join.

    Returns a pyarrow Table of canonical (id_a < id_b) pairs."""
    import ray

    from kafka_connect_mongo_ray.utils import embedding_matrix

    def pack(batch: pa.Table) -> pa.Table:
        m = embedding_matrix(batch[vec_col], dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = np.ascontiguousarray(np.asarray(batch[id_col], dtype=np.int64))
        return pa.table({
            "ids": pa.array([ids.tobytes()], pa.large_binary()),
            "vecs": pa.array([np.ascontiguousarray(m).tobytes()], pa.large_binary()),
            "n": pa.array([len(ids)], pa.int64()),
            "dim": pa.array([m.shape[1]], pa.int64()),
        })

    n_total = ds.count()
    n_blocks = max(1, -(-n_total // block_rows))
    packed = ds.repartition(n_blocks).map_batches(
        pack, batch_format="pyarrow", batch_size=None)
    refs = packed.to_arrow_refs()  # refs only — blocks stay in the object store

    @ray.remote(num_cpus=1)
    def pair_task(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        def unpack(t):
            # a ref may bundle several pack rows — stack them
            ids = np.concatenate([
                np.frombuffer(t["ids"][r].as_py(), dtype=np.int64)
                for r in range(t.num_rows)])
            mats = [np.frombuffer(t["vecs"][r].as_py(), dtype=np.float64)
                    .reshape(t["n"][r].as_py(), t["dim"][r].as_py())
                    for r in range(t.num_rows)]
            return ids, np.vstack(mats)

        ids_a, va = unpack(ta)
        ids_b, vb = unpack(tb)
        sims = va @ vb.T
        mask = sims >= threshold
        if same:
            mask = np.triu(mask, k=1)
        ai, bi = np.where(mask)
        lo = np.minimum(ids_a[ai], ids_b[bi])
        hi = np.maximum(ids_a[ai], ids_b[bi])
        return pa.table({"id_a": pa.array(lo, pa.int64()),
                         "id_b": pa.array(hi, pa.int64())})

    # bounded-inflight submission: B·(B+1)/2 pair tasks can be large at
    # scale — keep a window of ~4× cluster CPUs in flight instead of
    # dumping the whole task set on the scheduler
    max_inflight = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))
    pending: list = []
    parts: list[pa.Table] = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            if len(pending) >= max_inflight:
                done, pending = ray.wait(pending, num_returns=1)
                parts.extend(ray.get(done))
            pending.append(pair_task.remote(refs[i], refs[j], i == j))
    parts.extend(ray.get(pending))
    return pa.concat_tables(parts) if parts else pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})


class EmbeddingNearDup:
    """Cosine-similarity near-dup pairs against a broadcast matrix.

    Exact at test scale (per-batch float64 matmul vs the full
    broadcast matrix); the scale path buckets by LSH hyperplane signs
    first (see similarity.lsh_bucket_batch) so each batch only matmuls
    its own bucket.
    """

    def __init__(self, matrix_ref, ids_ref, threshold: float = 0.95,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        m = np.asarray(ray.get(matrix_ref), dtype=np.float64)
        self.matrix = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        self.ids = np.asarray(ray.get(ids_ref))
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from kafka_connect_mongo_ray.utils import embedding_matrix

        ids = np.asarray(batch[self.id_col])
        vecs = embedding_matrix(batch[self.vec_col])
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = vecs @ self.matrix.T
        rows_a, rows_b, out_sims = [], [], []
        for i in range(len(ids)):
            hit = np.flatnonzero(sims[i] >= self.threshold)
            for j in hit:
                if self.ids[j] > ids[i]:  # canonical id_a < id_b, no self-pairs
                    rows_a.append(int(ids[i]))
                    rows_b.append(int(self.ids[j]))
                    out_sims.append(float(sims[i, j]))
        return pa.table(
            {
                "id_a": pa.array(rows_a, pa.int64()),
                "id_b": pa.array(rows_b, pa.int64()),
                "cosine": pa.array(out_sims, pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
# exact edit-distance (Levenshtein) similarity join


def myers_distance(a: str, b: str) -> int:
    """Exact Levenshtein distance via Myers' bit-parallel algorithm
    (Myers 1999, "A fast bit-vector algorithm for approximate string
    matching based on dynamic programming", JACM 46(3)): the DP matrix
    column is encoded as plus/minus delta bit-vectors, one arbitrary-
    precision Python int each, so the inner loop is O(len(b)) big-int
    bit operations instead of an O(len(a)·len(b)) cell sweep — ~100×
    faster than a Python DP for the few-hundred-char documents this
    verifies."""
    m = len(a)
    if m == 0:
        return len(b)
    if len(b) == 0:
        return m
    peq: dict = {}
    for i, ch in enumerate(a):
        peq[ch] = peq.get(ch, 0) | (1 << i)
    mask = (1 << m) - 1
    last = 1 << (m - 1)
    pv = mask
    mv = 0
    score = m
    for ch in b:
        eq = peq.get(ch, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & last:
            score += 1
        if mh & last:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (~(xv | ph) & mask)
        mv = ph & xv
    return score


def _char_histograms(texts: list, alphabet_bits: int = 7) -> np.ndarray:
    """(rows × 2^alphabet_bits) char-frequency matrix — codepoints
    folded into 2^bits bins (folding only WEAKENS the L1 lower bound,
    never breaks it). Vectorized: one pass over the concatenation."""
    n_bins = 1 << alphabet_bits
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    if lens.sum() == 0:
        return np.zeros((len(texts), n_bins), dtype=np.int64)
    flat = np.frombuffer("".join(texts).encode("utf-32-le"),
                         dtype=np.uint32).astype(np.int64) % n_bins
    row = np.repeat(np.arange(len(texts)), lens)
    h = np.zeros((len(texts), n_bins), dtype=np.int64)
    np.add.at(h, (row, flat), 1)
    return h


def edit_distance_pairs(ds, docs_ds, *, max_dist: int,
                        id_col: str = "doc_id", text_col: str = "text",
                        len_col: str = "n_chars",
                        num_partitions: int | None = None,
                        block_row_cap: int = 20_000):
    """EXACT edit-distance similarity join: every unordered document
    pair with Levenshtein distance ≤ ``max_dist`` — the character-level
    member of the dedup family (catches small in-place edits that
    word-level Jaccard dilutes and MinHash misses at low shingle
    overlap).

    Three stages, each recall-COMPLETE for the threshold:

    1. *Length blocking* (complete: ``ed(a,b) ≥ |len a − len b|``).
       Each doc lands in block ``len // max_dist`` (home) and is also
       sent to block+1 (guest); any pair within ``max_dist`` lengths
       shares a block — same-block pairs meet in the home block,
       adjacent-block pairs meet where the longer doc is home — so
       every qualifying pair is generated EXACTLY once. Per-block
       pair enumeration is vectorized (triu / cross indices) with the
       |Δlen| filter applied before any text moves.
    2. *Histogram prefilter* (complete: every edit op changes the char
       frequency L1 distance by ≤ 2, so ``ed ≥ L1/2``). One vectorized
       bincount pass per batch; pairs failing ``L1 ≤ 2·max_dist`` drop
       before the DP.
    3. *Verify*: texts attach via two bucketed hash joins
       (:func:`attach_pair_texts` — no driver-side corpus) and
       :func:`myers_distance` confirms ``dist ≤ max_dist``.

    Scale contract: a length block holds all docs within a
    ``max_dist``-char length window, so the O(block²) pair enumeration
    is inherent to the exact join — but no single task ever
    materializes an unbounded block: blocks above ``block_row_cap``
    rows sub-split into ``s = ceil(rows / cap)`` id-hash sub-buckets
    and every sub-bucket PAIR (i ≤ j) becomes its own task (the
    triangle self-join — the ANN ``_subsplit_oversized_groups``
    precedent applied to a self-join, so completeness needs the
    off-diagonal tasks too). Per-task rows stay ≤ 2·cap at any skew;
    an unordered doc pair lands in exactly one (i, j) task by its
    unordered sub-bucket pair, so the pair set is IDENTICAL to the
    uncapped run. Total pair work is unchanged — at corpus scale
    production layers a content blocker (MinHash bands / q-gram
    prefix) upstream and uses this as the exact verifier. Driver
    state: one row count per length block (length-domain-bounded).
    ``ds`` needs (id, len) only; ``docs_ds`` supplies texts to the
    verify joins. Returns (id_a, id_b, dist) with id_a < id_b."""
    from ray.data.aggregate import Sum

    parts = _default_partitions(num_partitions)

    def block_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        lens = np.asarray(batch[len_col], dtype=np.int64)
        blk = lens // max(max_dist, 1)
        return pa.table({
            "__blk": pa.array(np.concatenate([blk, blk + 1]), pa.int64()),
            "home": pa.array(np.concatenate([np.ones(len(ids), bool),
                                             np.zeros(len(ids), bool)])),
            id_col: pa.array(np.concatenate([ids, ids]), pa.int64()),
            len_col: pa.array(np.concatenate([lens, lens]), pa.int64()),
        })

    # materialized: the count pass and the fan-out both read it
    rows = ds.map_batches(block_rows, batch_format="pyarrow").materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        blk, cnt = np.unique(np.asarray(batch["__blk"], dtype=np.int64),
                             return_counts=True)
        return pa.table({"__blk": pa.array(blk, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    subs = {int(r["__blk"]): -(-int(r["n"]) // block_row_cap)
            for r in rows.map_batches(count_partial, batch_format="pyarrow")
            .groupby("__blk").aggregate(Sum("n", alias_name="n"))
            .take_all()}

    def fan_out(batch: pa.Table) -> pa.Table:
        blk = np.asarray(batch["__blk"], dtype=np.int64)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        uniq, codes = np.unique(blk, return_inverse=True)
        s_u = np.array([max(subs.get(int(b), 1), 1) for b in uniq],
                       dtype=np.int64)
        s = s_u[codes]
        u = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             % s.astype(np.uint64)).astype(np.int64)
        # each row joins every task whose sub-bucket pair contains u:
        # emit s copies with partner k = 0..s-1, key (min(u,k), max(u,k))
        rep = np.repeat(np.arange(len(blk)), s)
        ends = np.cumsum(s)
        k = np.arange(int(ends[-1]) if len(ends) else 0) - np.repeat(
            ends - s, s)
        ur = u[rep]
        return pa.table({
            "__blk": pa.array(blk[rep], pa.int64()),
            "__si": pa.array(np.minimum(ur, k), pa.int64()),
            "__sj": pa.array(np.maximum(ur, k), pa.int64()),
            "__sub": pa.array(ur, pa.int64()),
            "home": batch["home"].take(pa.array(rep)),
            id_col: pa.array(ids[rep], pa.int64()),
            len_col: batch[len_col].take(pa.array(rep)),
        })

    def pairs_in_task(g: pa.Table) -> pa.Table:
        ids = np.asarray(g[id_col], dtype=np.int64)
        lens = np.asarray(g[len_col], dtype=np.int64)
        home = np.asarray(g["home"])
        sub = np.asarray(g["__sub"], dtype=np.int64)
        i = int(g["__si"][0].as_py())
        j = int(g["__sj"][0].as_py())
        if i == j:
            # diagonal task: the original in-block rule over this
            # sub-bucket's members
            hi = np.flatnonzero(home)
            gi = np.flatnonzero(~home)
            ia, ib = np.triu_indices(len(hi), 1)
            a = np.concatenate([hi[ia], np.repeat(gi, len(hi))])
            b = np.concatenate([hi[ib], np.tile(hi, len(gi))])
        else:
            # off-diagonal: only pairs that CROSS the two sub-buckets
            hi_i = np.flatnonzero(home & (sub == i))
            hi_j = np.flatnonzero(home & (sub == j))
            gi_i = np.flatnonzero(~home & (sub == i))
            gi_j = np.flatnonzero(~home & (sub == j))
            a = np.concatenate([np.repeat(hi_i, len(hi_j)),
                                np.repeat(gi_i, len(hi_j)),
                                np.repeat(gi_j, len(hi_i))])
            b = np.concatenate([np.tile(hi_j, len(hi_i)),
                                np.tile(hi_j, len(gi_i)),
                                np.tile(hi_i, len(gi_j))])
        keep = np.abs(lens[a] - lens[b]) <= max_dist
        a, b = a[keep], b[keep]
        id_a = np.minimum(ids[a], ids[b])
        id_b = np.maximum(ids[a], ids[b])
        return pa.table({"id_a": pa.array(id_a, pa.int64()),
                         "id_b": pa.array(id_b, pa.int64())})

    cands = (rows.map_batches(fan_out, batch_format="pyarrow")
             .groupby(["__blk", "__si", "__sj"], num_partitions=parts)
             .map_groups(pairs_in_task, batch_format="pyarrow"))

    with_texts = attach_pair_texts(cands, docs_ds, id_col=id_col,
                                   text_col=text_col, num_buckets=parts)

    def verify(batch: pa.Table) -> pa.Table:
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        h = _char_histograms(ta + tb)
        l1 = np.abs(h[:len(ta)] - h[len(ta):]).sum(axis=1)
        maybe = np.flatnonzero(l1 <= 2 * max_dist)
        dist = np.full(len(ta), np.iinfo(np.int64).max, dtype=np.int64)
        for i in maybe:
            dist[i] = myers_distance(ta[i], tb[i])
        keep = dist <= max_dist
        out = pa.table({"id_a": batch["id_a"], "id_b": batch["id_b"],
                        "dist": pa.array(dist, pa.int64())})
        return out.filter(pa.array(keep))

    return with_texts.map_batches(verify, batch_format="pyarrow")
